"""Per-bounce profile of the integrator on the attached device.

Runs the bounce loop at python level (one jitted bounce_step), printing
wall time and alive fraction per bounce, plus isolated costs of the three
mesh calls with the *actual* ray/mask distributions of each bounce.
"""
from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.models import integrator, pathtracer
from photorealistic_rendering_using_opencl_tpu.ops import mesh_brute
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def main():
    width = int(os.environ.get("W", "512"))
    cfg, scene = load_scene("scenes/cornell.json")
    cam = default_camera(width, width).pytree()
    px, py = pathtracer.pixel_grid(width, width)
    pixel_idx = py.astype(jnp.uint32) * width + px.astype(jnp.uint32)
    sample_arr = jnp.zeros_like(pixel_idx)
    origin, direction = pathtracer.camera_rays_for_sample(
        cam, width, width, px, py, pixel_idx, sample_arr, 0)
    state = integrator.init_state(origin, direction)

    @jax.jit
    def step(state, bounce):
        sampler = Sampler(pixel_idx, sample_arr, seed=0, scheme="pcg4d",
                          dim=integrator.CAMERA_DIMS
                          + bounce * integrator.DIMS_PER_BOUNCE)
        return integrator.bounce_step(cfg, scene, state, sampler, bounce)

    n = origin.shape[0]
    print(f"lanes {n}, bounces budget {integrator.n_steps_for(cfg)}")
    total = 0.0
    for b in range(integrator.n_steps_for(cfg)):
        bb = jnp.asarray(b, jnp.int32)
        out = step(state, bb)
        jax.block_until_ready(out.alive)
        t0 = time.perf_counter()
        out = step(state, bb)
        alive = int(np.asarray(jnp.sum(out.alive)))
        dt = time.perf_counter() - t0
        total += dt
        print(f"bounce {b:2d}: {dt*1e3:8.1f} ms  alive {alive:8d} "
              f"({alive/n*100:5.2f}%)")
        state = out
        if alive == 0:
            break
    print(f"total {total:.2f}s (incl ~1s/dispatch tunnel latency each)")


if __name__ == "__main__":
    main()

"""Component-level timing of one bounce at realistic lane counts."""
from __future__ import annotations

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
from photorealistic_rendering_using_opencl_tpu.ops.intersect import (
    intersect_scene, shadow_visible,
)
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.ops.math import RAY_INF
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:9.2f} ms")
    return out


def main():
    width = int(os.environ.get("W", "512"))
    cfg, scene = load_scene("scenes/cornell.json")
    cam = default_camera(width, width).pytree()
    px, py = pathtracer.pixel_grid(width, width)
    pixel_idx = py.astype(jnp.uint32) * width + px.astype(jnp.uint32)
    sample_arr = jnp.zeros_like(pixel_idx)
    origin, direction = pathtracer.camera_rays_for_sample(
        cam, width, width, px, py, pixel_idx, sample_arr, 0)
    n = origin.shape[0]
    rng = np.random.default_rng(0)
    d2 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    all_on = jnp.ones((n,), bool)
    all_off = jnp.zeros((n,), bool)
    few_on = jnp.asarray(rng.uniform(size=n) < 0.0005)
    tinit = jnp.full((n,), RAY_INF)

    isect = jax.jit(lambda o, d, a: intersect_scene(cfg, scene, o, d,
                                                    active=a).t)
    shad = jax.jit(lambda o, d, a: shadow_visible(cfg, scene, o, d,
                                                  jnp.full((n,), 5.0),
                                                  active=a))
    mesh = jax.jit(lambda o, d, a: mesh_brute.mesh_intersect(
        scene.bf_feat, scene.bf_clusters, o, d, tinit, active=a)[0])

    print(f"lanes {n}")
    timeit("mesh kernel (all active)", mesh, origin, d2, all_on)
    timeit("mesh kernel (0.05% active)", mesh, origin, d2, few_on)
    timeit("mesh kernel (none active)", mesh, origin, d2, all_off)
    timeit("intersect_scene (all)", isect, origin, d2, all_on)
    timeit("intersect_scene (none)", isect, origin, d2, all_off)
    timeit("shadow_visible (all)", shad, origin, d2, all_on)
    timeit("shadow_visible (none)", shad, origin, d2, all_off)

    @jax.jit
    def step(state, bounce):
        from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler
        sampler = Sampler(pixel_idx, sample_arr, seed=0, scheme="pcg4d",
                          dim=integrator.CAMERA_DIMS
                          + bounce * integrator.DIMS_PER_BOUNCE)
        return integrator.bounce_step(cfg, scene, state, sampler, bounce)

    state = integrator.init_state(origin, direction)
    dead = state._replace(alive=all_off)
    timeit("bounce_step (all alive)", step, state, jnp.asarray(0, jnp.int32))
    timeit("bounce_step (none alive)", step, dead, jnp.asarray(1, jnp.int32))


if __name__ == "__main__":
    main()

"""Compile + time a BDPT frame on the TPU (VERDICT r4 next #7).

The bidirectional integrator (models/bidirectional.py) exceeds the
reference (kernels/integrators/bidirectional.cl is an empty file) but had
no recorded TPU evidence.  Times `render(method="bdpt")` at a modest
shape, reps-differenced like every other tunnel measurement.

Usage: python tools/bdpt_time.py [width] [spp] [depth]
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    cfg, scene = load_scene("scenes/cornell.json")
    cam = default_camera(width, width).pytree()

    @functools.partial(jax.jit, static_argnames=("reps",))
    def multi(scene, cam, reps):
        def body(acc, seed):
            img, _ = pathtracer.render.__wrapped__(
                cfg, scene, cam, width, width, spp, seed=seed,
                method="bdpt", bdpt_max_depth=depth)
            return acc + img, None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((width, width, 3), jnp.float32),
            jnp.arange(1, reps + 1, dtype=jnp.uint32))
        return acc

    def timed(reps):
        t0 = time.perf_counter()
        mean = float(np.asarray(multi(scene, cam, reps)).mean()) / reps
        wall = time.perf_counter() - t0
        return wall, mean

    t0 = time.perf_counter()
    timed(1)  # compile + warm
    print(f"first call (incl compile) {time.perf_counter() - t0:.0f}s",
          flush=True)
    t1, mean = timed(1)
    t1b, _ = timed(1)
    t1 = min(t1, t1b)
    t3, _ = timed(3)
    per = max(t3 - t1, 1e-9) / 2
    if per < 0.05 * (t3 / 3):
        per = t3 / 3
    rate = width * width * spp / per
    print(f"bdpt {width}x{width} x {spp}spp depth={depth}: "
          f"{per*1e3:.0f} ms/frame = {rate:.0f} samples/s "
          f"mean={mean:.5f} device={jax.devices()[0].platform}", flush=True)


if __name__ == "__main__":
    main()

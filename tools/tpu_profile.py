"""Amortized TPU micro-profiler for the render pipeline.

The axon tunnel adds seconds of per-dispatch latency, so every timing here
wraps `reps` full renders in one jitted scan and reports min-over-trials
device-side throughput.  Usage:

    python tools/tpu_profile.py [--width 256] [--spp 4] [--reps 16]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
# NB: setting PYTHONPATH breaks axon plugin registration in this image;
# extend sys.path here instead so the repo package imports.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _materialize(out):
    # axon remote arrays return from block_until_ready before the device
    # finishes; a host transfer is the only reliable completion barrier.
    return float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])


def time_fn(fn, *args, trials=3):
    _materialize(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _materialize(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--scenes", nargs="*",
                    default=["scenes/cornell_simple.json",
                             "scenes/cornell.json",
                             "scenes/cornell_media.json",
                             "scenes/sdf_demo.json"])
    args = ap.parse_args()

    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
    from photorealistic_rendering_using_opencl_tpu.ops import intersect
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    W = H = args.width
    SPP = args.spp
    REPS = args.reps
    cam = default_camera(W, H).pytree()
    print(f"device={jax.devices()[0]} {W}x{H} spp={SPP} reps={REPS}")

    for path in args.scenes:
        cfg, scene = load_scene(path)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def multi(scene, cam, reps):
            def body(acc, seed):
                img, _ = pathtracer.render.__wrapped__(
                    cfg, scene, cam, W, H, SPP, seed=seed, method="while")
                return acc + img, None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((H, W, 3), jnp.float32),
                jnp.arange(1, reps + 1, dtype=jnp.uint32))
            return acc

        # difference two rep counts to cancel fixed tunnel latency
        t_lo = time_fn(multi, scene, cam, REPS)
        t_hi = time_fn(multi, scene, cam, REPS * 4)
        per_rep = max(t_hi - t_lo, 1e-9) / (REPS * 3)
        n = W * H * SPP
        print(f"{path}: {per_rep*1e3:.2f} ms/frame -> "
              f"{n/per_rep/1e6:.2f}M samples/s "
              f"(bounces<={cfg.max_bounces}; raw {t_lo:.3f}/{t_hi:.3f}s)")

        # traversal-only microbench for mesh scenes
        if cfg.has_mesh:
            px, py = pathtracer.pixel_grid(W, H)
            pix = py.astype(jnp.uint32) * W + px.astype(jnp.uint32)
            o, d = pathtracer.camera_rays_for_sample(
                cam, W, H, px, py, pix, jnp.zeros_like(pix), 0)

            @functools.partial(jax.jit, static_argnames=("reps",))
            def trav(scene, o, d, reps):
                def body(acc, i):
                    t, tri, u, v = intersect.bvh_traverse(
                        scene, o, d + 1e-6 * i, jnp.full((o.shape[0],), 20.0))
                    return acc + t, None
                acc, _ = jax.lax.scan(body, jnp.zeros(o.shape[0]),
                                      jnp.arange(reps, dtype=jnp.float32))
                return acc

            t_lo = time_fn(trav, scene, o, d, REPS)
            t_hi = time_fn(trav, scene, o, d, REPS * 4)
            per_rep = max(t_hi - t_lo, 1e-9) / (REPS * 3)
            print(f"  bvh_traverse only: {per_rep*1e3:.2f} ms/pass -> "
                  f"{W*H/per_rep/1e6:.2f}M rays/s")


if __name__ == "__main__":
    main()

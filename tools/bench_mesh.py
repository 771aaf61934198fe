"""Microbenchmark: mesh intersection rates on the attached device.

Compares the skip-link BVH walk (ops/intersect.py) with the MXU
brute-force kernel (ops/mesh_brute.py) on the cornell teapot, for both
interior secondary-style rays (worst case: incoherent, everything hits
the mesh bbox region) and camera-style rays (mostly root-miss).

Timing method per bench.py: reps folded into one jitted scan, completion
forced by host transfer, two rep counts differenced to cancel the ~1 s
axon tunnel latency.
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.ops import mesh_brute
from photorealistic_rendering_using_opencl_tpu.ops.intersect import bvh_traverse
from photorealistic_rendering_using_opencl_tpu.ops.math import RAY_INF
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def timed(fn, reps_pair=(4, 16)):
    lo, hi = reps_pair

    @functools.partial(jax.jit, static_argnames=("reps",))
    def multi(reps):
        def body(acc, i):
            out = fn(i)
            return acc + out, None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(lo if reps == lo else hi,
                                         dtype=jnp.uint32))
        return acc

    def run(reps):
        float(multi(reps))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(multi(reps))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(lo), run(hi)
    per = max(t_hi - t_lo, 1e-9) / (hi - lo)
    if per < 0.05 * (t_hi / hi):
        per = t_hi / hi
    return per


def main():
    cfg, scene = load_scene("scenes/cornell.json")
    print("device", jax.devices()[0].platform, "tris", cfg.n_triangles)

    rng = np.random.default_rng(0)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144

    # interior rays: origins inside the cornell box, random directions
    o_int = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    o_int[:, 1] = rng.uniform(-1.4, 1.0, n)
    d_int = rng.normal(size=(n, 3)).astype(np.float32)
    d_int /= np.linalg.norm(d_int, axis=1, keepdims=True)

    # camera-ish rays: from one point toward the box (mostly miss mesh bbox)
    o_cam = np.tile(np.array([0.0, 0.0, 3.0], np.float32), (n, 1))
    d_cam = d_int.copy()
    d_cam[:, 2] = -np.abs(d_cam[:, 2]) - 0.5
    d_cam /= np.linalg.norm(d_cam, axis=1, keepdims=True)

    tinit = jnp.full((n,), RAY_INF)

    for name, o, d in (("interior", o_int, d_int), ("camera", o_cam, d_cam)):
        o, d = jnp.asarray(o), jnp.asarray(d)

        def f_bvh(i, o=o, d=d):
            t, tri, _, _ = bvh_traverse(scene, o + 0.0 * i, d, tinit)
            return jnp.sum(t) + jnp.sum(tri)

        per = timed(f_bvh)
        print(f"{name:9s} bvh   : {n/per/1e6:8.2f} M rays/s "
              f"({per*1e3:.2f} ms)")

    # brute force uses its own pack (loader wiring lands later)
    from photorealistic_rendering_using_opencl_tpu.scene import bvh_build
    from photorealistic_rendering_using_opencl_tpu.scene.obj import load_obj
    from photorealistic_rendering_using_opencl_tpu.scene.loader import find_model
    tv, tn = load_obj(find_model("teapot.obj"))
    bvh = bvh_build.build_bvh(np.asarray(tv))
    bp = mesh_brute.pack_brute(np.asarray(tv)[bvh.order],
                               np.asarray(tn)[bvh.order])
    feat = jnp.asarray(bp.feat)
    clusters = jnp.asarray(bp.clusters)
    print("tiles", bp.clusters.shape[0])

    for name, o, d in (("interior", o_int, d_int), ("camera", o_cam, d_cam)):
        o, d = jnp.asarray(o), jnp.asarray(d)

        def f_brute(i, o=o, d=d):
            t, tri = mesh_brute.mesh_intersect(feat, clusters,
                                               o + 0.0 * i, d, tinit)
            return jnp.sum(t) + jnp.sum(tri.astype(jnp.float32))

        per = timed(f_brute)
        print(f"{name:9s} brute : {n/per/1e6:8.2f} M rays/s "
              f"({per*1e3:.2f} ms)")


if __name__ == "__main__":
    main()

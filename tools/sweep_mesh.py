"""Quick TILE/BLOCK sweep for the brute mesh kernel (brute only)."""
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
from photorealistic_rendering_using_opencl_tpu.ops.math import RAY_INF
from photorealistic_rendering_using_opencl_tpu.scene import bvh_build
from photorealistic_rendering_using_opencl_tpu.scene.loader import find_model
from photorealistic_rendering_using_opencl_tpu.scene.obj import load_obj


def main():
    n = int(os.environ.get("N", "262144"))
    tv, tn = load_obj(find_model("teapot.obj"))
    bvh = bvh_build.build_bvh(np.asarray(tv))
    bp = mesh_brute.pack_brute(np.asarray(tv)[bvh.order],
                               np.asarray(tn)[bvh.order],
                               tile=mesh_brute.TILE)
    feat = jnp.asarray(bp.feat)
    clusters = jnp.asarray(bp.clusters)

    rng = np.random.default_rng(0)
    o = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(-1.4, 1.0, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tinit = jnp.full((n,), RAY_INF)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def multi(reps):
        def body(acc, i):
            t, tri = mesh_brute.mesh_intersect(feat, clusters, o + 0.0 * i,
                                               d, tinit)
            return acc + t.sum() + tri.sum().astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(reps, dtype=jnp.uint32))
        return acc

    def run(reps):
        float(multi(reps))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(multi(reps))
            best = min(best, time.perf_counter() - t0)
        return best

    t4, t16 = run(4), run(16)
    per = max(t16 - t4, 1e-9) / 12
    print(f"TILE={mesh_brute.TILE} BLOCK={mesh_brute.BLOCK} "
          f"tiles={clusters.shape[0]}: {per*1e3:7.2f} ms "
          f"({n/per/1e6:6.2f} M rays/s)", flush=True)


if __name__ == "__main__":
    main()

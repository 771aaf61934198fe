"""Mesh-kernel microbench: matmul vs VPU-post split, bf16 variant.

Times the production kernel against ablations on the cornell teapot at
262k interior rays: (a) full f32, (b) matmul-only (post-processing
replaced by a raw running sum -- isolates the MXU share), (c) bf16
coefficient table + ray pack with f32 accumulation.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photorealistic_rendering_using_opencl_tpu.ops import mesh_brute as mb
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def timed(name, fn, *args, lo=4, hi=16):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def multi(reps, *a):
        def body(acc, i):
            t, tri = fn(*a)
            return acc + jnp.sum(t) + jnp.sum(tri), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(reps, dtype=jnp.uint32))
        return acc

    def run(reps):
        float(multi(reps, *args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(multi(reps, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(lo), run(hi)
    per = max(t_hi - t_lo, 1e-9) / (hi - lo)
    if per < 0.05 * (t_hi / hi):
        per = t_hi / hi
    print(f"{name:46s} {per*1e3:9.2f} ms", flush=True)
    return per


def make_matmul_only(nt, c, block):
    def kernel(rel_ref, p_ref, a_ref, t_ref, i_ref):
        p = p_ref[:]
        t_ref[:] = jnp.zeros((1, block), jnp.float32)
        i_ref[:] = jnp.zeros((1, block), jnp.int32)
        pid = pl.program_id(0)
        nwords = -(-nt // 32)
        for j in range(nt):
            bit = (rel_ref[pid * nwords + j // 32] >> (j % 32)) & 1
            @pl.when(bit != 0)
            def _(j=j):
                out = jax.lax.dot_general(
                    a_ref[:, j * 4 * c:(j + 1) * 4 * c], p,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                t_ref[:] = t_ref[:] + jnp.sum(out, axis=0, keepdims=True)
        return
    return kernel


def main():
    cfg, scene = load_scene("scenes/cornell.json")
    n = 262144
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tinit = jnp.full((n,), 20.0, jnp.float32)
    feat = scene.bf_feat
    cl = scene.bf_clusters
    print("tris padded:", feat.shape[1] // 4, "tiles:",
          feat.shape[1] // (4 * mb.TILE), "block:", mb.BLOCK, flush=True)

    timed("full kernel f32 (closest)",
          lambda: mb._intersect_pallas(feat, cl, o, d, tinit, None))

    # matmul-only ablation
    c, block = mb.TILE, mb.BLOCK
    nt = feat.shape[1] // (4 * c)

    def run_matmul_only():
        grid = n // block
        rel = mb._block_relevance(cl, o, d, tinit, jnp.ones((n,), bool),
                                  grid, block).reshape(-1)
        o0, o1, o2 = o[:, 0], o[:, 1], o[:, 2]
        d0, d1, d2 = d[:, 0], d[:, 1], d[:, 2]
        rows = [o0, o1, o2, d0, d1, d2,
                d1 * o2 - d2 * o1, d2 * o0 - d0 * o2, d0 * o1 - d1 * o0,
                jnp.ones((n,), jnp.float32), tinit,
                jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.float32)]
        rows += [jnp.zeros((n,), jnp.float32)] * (mb.FEAT - len(rows))
        p = jnp.stack(rows, axis=0)
        t, i = pl.pallas_call(
            make_matmul_only(nt, c, block),
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((mb.FEAT, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((mb.FEAT, feat.shape[1]),
                                   lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((1, block), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, block), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                       jax.ShapeDtypeStruct((1, n), jnp.int32)),
        )(rel, p, feat)
        return t[0], i[0]

    timed("matmul-only ablation", run_matmul_only)

    # relevance pass alone
    def run_rel():
        grid = n // block
        rel = mb._block_relevance(cl, o, d, tinit, jnp.ones((n,), bool),
                                  grid, block)
        return rel.astype(jnp.float32).sum(axis=1, keepdims=True).T, rel.astype(jnp.int32).sum(axis=1, keepdims=True).T
    timed("relevance pass (XLA) alone", run_rel)


if __name__ == "__main__":
    main()

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

    feat32 = jnp.asarray(feat, jnp.float32)
    feat16 = jnp.asarray(feat32, jnp.bfloat16)

    # --- MXU precision sweep (PERF.md round-4): DEFAULT single-pass bf16
    # quantizes the ray features and biases edge tests; HIGH = bf16x3,
    # HIGHEST = bf16x6.  Parity is judged against HIGHEST.
    results = {}
    for name in ("default", "bf16x3", "bf16x6", "highest"):
        mb._PRECISION_NAME = name
        mb.MATMUL_PRECISION = {
            "default": jax.lax.Precision.DEFAULT,
            "bf16x3": jax.lax.Precision.HIGHEST,
            "bf16x6": jax.lax.Precision.HIGHEST,
            "highest": jax.lax.Precision.HIGHEST}[name]
        timed(f"full kernel f32 table, precision={name}",
              lambda: mb._intersect_pallas(feat32, cl, o, d, tinit, None))
        results[name] = [np.asarray(x) for x in jax.jit(
            lambda: mb._intersect_pallas(feat32, cl, o, d, tinit, None))()]
    for name in ("default", "bf16x3", "bf16x6"):
        iref, ix = results["highest"][1], results[name][1]
        print(f"precision={name}: index agreement vs highest "
              f"{(iref == ix).mean():.6f}  hit/miss flips "
              f"{((iref >= 0) != (ix >= 0)).sum()}/{len(iref)}", flush=True)
    mb._PRECISION_NAME = "default"
    mb.MATMUL_PRECISION = jax.lax.Precision.DEFAULT

    timed("full kernel bf16 table (closest)",
          lambda: mb._intersect_pallas(feat16, cl, o, d, tinit, None))

    # parity: winning-index agreement + reattached-t error where they agree
    t32, i32 = jax.jit(lambda: mb._intersect_pallas(
        feat32, cl, o, d, tinit, None))()
    t16, i16 = jax.jit(lambda: mb._intersect_pallas(
        feat16, cl, o, d, tinit, None))()
    i32, i16 = np.asarray(i32), np.asarray(i16)
    t32, t16 = np.asarray(t32), np.asarray(t16)
    hit32 = i32 >= 0
    agree = i32 == i16
    print(f"bf16 parity: hit-rate f32 {hit32.mean():.4f}  "
          f"index agreement {agree.mean():.6f}  "
          f"hit/miss flips {(hit32 != (i16 >= 0)).sum()}/{len(i32)}",
          flush=True)
    both = hit32 & (i16 >= 0)
    if both.any():
        print(f"bf16 parity: kernel-t max|d| where both hit "
              f"{np.abs(t32[both] - t16[both]).max():.2e} "
              f"(reattach re-derives exact f32 t from the index)",
              flush=True)

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

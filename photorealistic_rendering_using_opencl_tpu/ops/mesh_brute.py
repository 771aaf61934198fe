"""MXU brute-force mesh intersection: Moller-Trumbore as one matmul.

The round-1 skip-link BVH walk (ops/intersect.py:bvh_traverse) is correct
but HBM-gather-bound: every traversal step pays ~184 random bytes per lane
(PERF.md), which is the one access pattern a TPU cannot do fast.  This
module replaces the walk for small/medium meshes with the opposite design:
test EVERY (ray, triangle) pair, but phrase the whole Moller-Trumbore
system as a single matrix product so the work lands on the MXU with zero
gathers and zero divergence.

Math.  With the reference's triangle test (kernels/geometry/triangle.cl:
4-43): e1 = p0-p1, e2 = p2-p0, n = e1 x e2, c = p0 - o, den = n.d,
t*den = n.c, u*den = (d x c).e2, v*den = (d x c).e1.  Expanding
d x c = d x p0 - d x o and using the triple-product identity
(d x p0).e = d.(p0 x e), all four quantities are LINEAR in the 10-vector
ray feature  f = [o, d, d x o, 1]:

    den    = <f, [0,       n,       0,    0     ]>
    t*den  = <f, [-n,      0,       0,    n.p0  ]>
    u*den  = <f, [0,       p0 x e2, -e2,  0     ]>
    v*den  = <f, [0,       p0 x e1, -e1,  0     ]>

so intersecting B rays against C triangles is ONE [B,16] x [16,4C] matmul
(features padded 10->16) followed by a cheap elementwise hit test in
den-multiplied form (no divisions until the winning t).  All coefficient
vectors are pre-scaled by 1/|n| on the host so den is in [-1,1].

Triangles are kept in BVH leaf order (spatially sorted) and grouped into
tiles of TILE triangles; each tile's AABB ("cluster") lets the kernel skip
whole tiles that no ray in the block can hit closer than its current best
-- the coherence win of a BVH at matmul granularity.  The full coefficient
table lives in VMEM (256 B/triangle) up to BRUTE_MAX_TRIS; past that the
pallas grid gains a table-chunk dimension and the pipeline streams
CHUNK_TRIS-triangle chunks through VMEM from HBM (measured 4.1x the
skip-link walk at 82k tris, round 5), up to BRUTE_STREAM_MAX_TRIS where
the walk takes over.

The hit test is exhaustive, so results equal the BVH walk's closest hit
(modulo exact-tie ordering).  Traversal stays detached; gradients reattach
through the selected triangle exactly as before (tri_reattach).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photorealistic_rendering_using_opencl_tpu.ops.math import EPS

import os as _os

# triangles per cluster tile.  Round-5 sweep at the flagship fwd+bwd
# shape: 512 -> 1.290 s, 256 -> 1.232 s, 128 -> 1.222 s (finer clusters
# let the relevance prune actually bite on divergent bounce rays:
# per-block tile unions shrink faster than the per-tile branch overhead
# grows), 64 fails to compile; parity at 128 is 0/262144 flips on both
# closest and any-hit lanes and the streamed path is unaffected.
TILE = int(_os.environ.get("PRT_MESH_TILE", "128"))
# rays per kernel instance.  Round-5 sweep at TILE=128 (flagship fwd+bwd
# shape): 512 -> 1.222 s, 256 -> 1.126 s, 128 -> 1.170 s; the streamed
# 82k-tri path also improves (1.18 -> 1.30 M interior rays/s at 256).
# Finer blocks tighten each block's relevant-tile union; below 256 the
# per-block fixed costs win back.  Parity at 128/256: 0/262144 flips.
BLOCK = int(_os.environ.get("PRT_MESH_BLOCK", "256"))
FEAT = 16  # ray feature width (10 used, padded for sublane tiling)
# largest mesh whose full coefficient table stays VMEM-resident for the
# whole dispatch; bigger meshes switch to the HBM-streamed variant where
# pallas pipelines CHUNK_TRIS-triangle table chunks through VMEM (grid
# over ray-blocks x chunks, double-buffered by the pallas pipeline) --
# the per-dispatch floor becomes nblocks x table-bytes of HBM traffic
BRUTE_MAX_TRIS = 32768
CHUNK_TRIS = int(_os.environ.get("PRT_MESH_CHUNK_TRIS", "4096"))
# beyond this even streaming stops paying vs the skip-link walk (the
# traffic floor grows linearly in mesh size; decision in PERF.md r5)
BRUTE_STREAM_MAX_TRIS = 262144

# MXU precision for the intersection matmul.  DEFAULT single-pass bf16
# quantizes the [o, d, d x o] features AND the coefficient table to 8
# mantissa bits; the u*den / v*den coefficients have magnitude ~|p0|/|e1|
# (~40 on the teapot) against a [0, 1] signal, so quantization noise is
# ~16% of the edge margin -- measured on cornell as 1.6% wrong winning
# triangles / 0.26% hit<->miss flips per dispatch, compounding over ~20
# intersections/path into a 4% mean-radiance bias (TPU 0.33679 == CPU
# bf16-sim 0.33681 vs CPU f32 0.35109; PERF.md round-4).
#
# The fix is a STACKED-K hi/lo decomposition: split each operand into
# bf16 words (x = x0 + x1 + x2), stack the term pairs along the
# contracted dimension, and run ONE K = T*16 dot at native bf16 -- the
# 128-deep systolic array pads K anyway, so the extra words are free.
# Measured (262k interior rays, teapot): broken DEFAULT 16.6 ms;
# bf16x3 (T=3, ~16 mantissa bits) 16.8 ms; bf16x6 (T=6, f32-exact,
# 0/262144 disagreements vs Precision.HIGHEST) 16.8 ms; Precision
# HIGHEST 58.1 ms.  f32-exact for free -> "bf16x6" is the default.
# PRT_MESH_PRECISION in {default, bf16x3, bf16x6, highest} overrides.
_PRECISION_NAME = _os.environ.get("PRT_MESH_PRECISION", "bf16x6")
MATMUL_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "bf16x3": jax.lax.Precision.HIGHEST,  # XLA fallback path: exact
    "bf16x6": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}[_PRECISION_NAME]

# stacked-K hi/lo term lists: x = x0 + x1 (+ x2), each part bf16-exact;
# each (i, j) pair contributes a_i . p_j to the single K = len(terms)*FEAT
# dot.  bf16x3 drops the ~2^-16-relative lo.lo term; bf16x6 keeps every
# term above ~2^-24 (f32-equivalent).
_SPLIT_TERMS = {
    "bf16x3": ((0, 0), (1, 0), (0, 1)),
    "bf16x6": ((0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (0, 2)),
}
# Precision caveat (measured round 5, tools/tpu_radiance_parity.py):
# stacked-K bf16x6 matches Precision.HIGHEST bit-for-bit on random-ray
# populations (0/262144 winner flips) but NOT on render populations --
# rays originating ON the mesh and silhouette-grazing directions hit
# cancellation regimes where the MXU's single-dot K accumulation loses
# the correction products that XLA's pass-wise HIGHEST form keeps,
# measured as a +0.85% mean-radiance bias on cornell (TPU pallas
# 0.35452 vs TPU XLA 0.35153 == CPU 0.35153 exactly).  Term ORDER is
# irrelevant (reordering smallest-first reproduces the bias bitwise:
# the accumulation is a fixed tree), and a second-dispatch search for
# validate-rejected winners recovers only 0.14pp at +43% cost (grazing
# false MISSES dominate, and no re-search can recover a miss).
# PRT_MESH_PRECISION=highest restores exact parity at 58.1 vs 16.8 ms
# per dispatch -- the documented quality/speed knob.


def _hi_lo_parts(x, n):
    parts = []
    rem = x
    for _ in range(n):
        h = rem.astype(jnp.bfloat16)
        parts.append(h)
        rem = rem - h.astype(jnp.float32)
    return parts

# transposed ray-pack rows 10-12 carry per-lane control values; the
# coefficient table's rows 10-15 are all zero, so they ride through the
# intersection matmul with no effect
ROW_TINIT = 10
ROW_ACTIVE = 11
ROW_ANYHIT = 12
ROW_EXCLUDE = 13  # self-triangle index as f32 (-1 = none); exact to 2^24


class BrutePack(NamedTuple):
    """Host-packed device tables (all jnp arrays once loaded)."""
    feat: np.ndarray  # [FEAT, 4*Tpad] coefficient table, tile-grouped cols
    clusters: np.ndarray  # [NT, 8] per-tile AABB: bmin(3) bmax(3) pad(2)
    tri_verts: np.ndarray  # [Tpad,3,3] vertices, same (compact) order
    tri_normals: np.ndarray  # [Tpad,3,3] vertex normals, same order


def pack_brute(tri_verts: np.ndarray, tri_normals: np.ndarray,
               tile: int = TILE) -> BrutePack:
    """Precompute the coefficient table from spatially-sorted triangles.

    ``tri_verts`` must already be in BVH order (scene/bvh_build.py
    ``order``) so consecutive tiles are spatially compact; the cluster
    AABBs then stay tight and the kernel's tile skipping is effective.
    Padding slots get all-zero coefficients: den = t*den = 0 fails the
    strict t*den > EPS*den^2 test, so they can never register a hit.
    """
    t = tri_verts.shape[0]
    tpad = max(-(-t // tile) * tile, tile)
    v = np.zeros((tpad, 3, 3), np.float32)
    v[:t] = tri_verts
    nrm = np.zeros((tpad, 3, 3), np.float32)
    nrm[:t] = tri_normals

    p0, p1, p2 = v[:, 0], v[:, 1], v[:, 2]
    e1 = p0 - p1
    e2 = p2 - p0
    n = np.cross(e1, e2)
    nlen = np.linalg.norm(n, axis=-1, keepdims=True)
    degen = nlen[:, 0] < 1e-20
    s = np.where(degen[:, None], 0.0, 1.0 / np.maximum(nlen, 1e-30))

    coef = np.zeros((4, tpad, FEAT), np.float32)
    # den = n.d
    coef[0, :, 3:6] = n * s
    # t*den = -n.o + n.p0
    coef[1, :, 0:3] = -n * s
    coef[1, :, 9] = np.sum(n * p0, axis=-1) * s[:, 0]
    # u*den = d.(p0 x e2) - (d x o).e2
    coef[2, :, 3:6] = np.cross(p0, e2) * s
    coef[2, :, 6:9] = -e2 * s
    # v*den = d.(p0 x e1) - (d x o).e1
    coef[3, :, 3:6] = np.cross(p0, e1) * s
    coef[3, :, 6:9] = -e1 * s

    # column layout per tile j: [den(C) | tden(C) | uden(C) | vden(C)]
    nt = tpad // tile
    feat = (coef.reshape(4, nt, tile, FEAT)
            .transpose(1, 0, 2, 3)  # [nt, 4, tile, FEAT]
            .reshape(nt * 4 * tile, FEAT)
            .T.copy())  # [FEAT, 4*tpad]

    clusters = np.zeros((nt, 8), np.float32)
    vt = v.reshape(nt, tile, 3, 3)
    live = ~degen.reshape(nt, tile)
    big = np.float32(3e38)
    lo = np.where(live[..., None, None], vt, big).min(axis=(1, 2))
    hi = np.where(live[..., None, None], vt, -big).max(axis=(1, 2))
    empty = ~live.any(axis=1)
    clusters[:, 0:3] = np.where(empty[:, None], big, lo)
    clusters[:, 3:6] = np.where(empty[:, None], -big, hi)
    return BrutePack(feat, clusters, v, nrm)


# ---------------------------------------------------------------------------
# Shared hit-test math (identical formulas in the XLA and Pallas paths)
# ---------------------------------------------------------------------------

def _tile_scores(f, a_tile, c):
    """f [B,FEAT] x a_tile [FEAT,4C] -> per-pair t (inf when no hit).

    Den-multiplied Moller-Trumbore: u,v,w >= 0 and t > EPS become sign
    tests on products with den, avoiding per-pair division; the division
    producing t only matters for pairs that already pass.

    A bf16 coefficient table runs the matmul in bf16 x bf16 -> f32 (the
    MXU's native fast path; ray features converted to match).  Only the
    WINNING TRIANGLE INDEX leaves this module -- every caller re-derives
    the exact f32 t/u/v via ops/intersect.py:tri_reattach -- so table
    quantization can only flip near-ties between triangles within ~2^-8
    relative t, never bias the shading position.
    """
    if a_tile.dtype == jnp.bfloat16:
        f = f.astype(jnp.bfloat16)
    out = jnp.dot(f, a_tile, preferred_element_type=jnp.float32,
                  precision=MATMUL_PRECISION)
    den = out[:, 0 * c:1 * c]
    tden = out[:, 1 * c:2 * c]
    uden = out[:, 2 * c:3 * c]
    vden = out[:, 3 * c:4 * c]
    den2 = den * den
    m = jnp.minimum(jnp.minimum(uden * den, vden * den),
                    (den - uden - vden) * den)
    td = tden * den
    hit = (m >= 0.0) & (td > EPS * den2)
    return jnp.where(hit, td / den2, jnp.inf)


def _ray_features(origin, direction):
    o0, o1, o2 = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    d0, d1, d2 = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    dxo = jnp.concatenate([d1 * o2 - d2 * o1,
                           d2 * o0 - d0 * o2,
                           d0 * o1 - d1 * o0], axis=1)
    ones = jnp.ones_like(o0)
    zeros = jnp.zeros(origin.shape[:-1] + (FEAT - 10,), jnp.float32)
    return jnp.concatenate([origin, direction, dxo, ones, zeros], axis=1)


# ---------------------------------------------------------------------------
# XLA path (CPU tests / reference semantics; scan over tiles)
# ---------------------------------------------------------------------------

def _intersect_xla(feat, clusters, origin, direction, t_init, active,
                   exclude=None):
    n = origin.shape[0]
    c = TILE
    nt = feat.shape[1] // (4 * c)
    f = _ray_features(origin, direction)
    tiles = feat.T.reshape(nt, 4 * c, FEAT).transpose(0, 2, 1)

    def step(carry, inp):
        best_t, best_i = carry
        a_tile, off = inp
        score = _tile_scores(f, a_tile, c)
        if exclude is not None:
            # per-lane self-exclusion (see Hit.tri in ops/intersect.py)
            ids = off + jnp.arange(c, dtype=jnp.int32)
            score = jnp.where(ids[None, :] == exclude[:, None],
                              jnp.inf, score)
        tmin = jnp.min(score, axis=1)
        targ = jnp.argmin(score, axis=1).astype(jnp.int32) + off
        better = tmin < best_t
        return (jnp.where(better, tmin, best_t),
                jnp.where(better, targ, best_i)), None

    offs = jnp.arange(nt, dtype=jnp.int32) * c
    init = (jnp.asarray(jnp.broadcast_to(t_init, (n,)), jnp.float32),
            jnp.full((n,), -1, jnp.int32))
    (best_t, best_i), _ = jax.lax.scan(step, init, (tiles, offs))
    got = best_i >= 0
    if active is not None:
        got = got & active
    return (jnp.where(got, best_t, jnp.broadcast_to(t_init, (n,))),
            jnp.where(got, best_i, -1))


# ---------------------------------------------------------------------------
# Pallas TPU kernel: VMEM-resident table, cluster-skipped matmul tiles
# ---------------------------------------------------------------------------

def _make_kernel(nt: int, c: int, block: int, split: bool,
                 split_terms=(), tpc: int = None, nchunks: int = 1):
    """Pure matmul kernel; all irregularity analysis happens outside.

    Cluster relevance (which matmul tiles some ray in the block could
    improve on) is precomputed vectorized in XLA (`_block_relevance`) and
    arrives as one int32 row per block in SMEM.  The kernel itself does
    zero slab math and zero cross-lane reductions — the round-1 in-kernel
    per-tile [block,1] slab walk ran at 1/128 lane utilisation and cost
    ~29 ms per call even with every lane dead (PERF.md).  A block whose
    rays are all dead or all miss the mesh now costs ``nt`` scalar branch
    tests.

    LAYOUT: rays ride the LANE dimension.  All I/O is a transposed pack
    P[16, block] (ray features + t_init/active/anyhit in the feature rows
    the coefficient table zeroes) and [1, block] result rows — measured on
    v5e, a single (block, 3)-blocked pallas operand forces relayout copies
    costing ~13 ms per dispatch at 262k lanes, vs ~2 ms lane-aligned
    (tools/pallas_barrier_test.py).

    The any-hit (shadow) variant is a PER-LANE flag (pack row 12), so one
    kernel call can carry a mixed batch — the integrator fuses the NEE
    shadow rays and the next bounce's closest-hit rays into a single 2N-ray
    dispatch (round-3 roadmap #1).  An any-hit lane parks at -inf on its
    first occluder and never updates again (traverseShadows early-out,
    bvh.cl:43-114).

    HBM-STREAMED MODE (``nchunks > 1``, meshes past the VMEM-resident
    cap): the grid becomes (ray blocks, table chunks) with chunks
    INNERMOST, so each output block is revisited across consecutive
    steps (legal pallas accumulation) while the pallas pipeline double-
    buffers the next table chunk in from HBM.  The kernel sees ``tpc``
    tiles of the table at a time; outputs initialize at chunk 0 and
    finalize (t_init fallback for misses) at the last chunk.
    """
    tpc = nt if tpc is None else tpc

    def impl(rel_ref, p_ref, a_ref, t_ref, i_ref):
        p = p_ref[:]  # [FEAT, block] f32, or [3*FEAT, block] bf16 stacked
        if split:
            # stacked-K hi/lo: p stacks [p_{j} for (i,j) in terms] (bf16)
            # against the table stack [a_{i} ...], so ONE K=T*FEAT dot
            # yields sum a_i.p_j -- multi-word precision at a single MXU
            # dispatch per tile (the 128-deep systolic array pads the
            # contracted dim anyway, so T separate K=16 dots cost ~Tx
            # this one; measured 39.8 ms -> 16.9 ms for bf16x3).
            # Control rows reconstructed exactly from the distinct parts.
            pc = p
            seen = set()
            pf = None
            for k, (_, jpart) in enumerate(split_terms):
                if jpart in seen:
                    continue
                seen.add(jpart)
                part = p[k * FEAT:(k + 1) * FEAT].astype(jnp.float32)
                pf = part if pf is None else pf + part
            tinit = pf[ROW_TINIT:ROW_TINIT + 1, :]
            act = pf[ROW_ACTIVE:ROW_ACTIVE + 1, :] > 0.5
            anyh = pf[ROW_ANYHIT:ROW_ANYHIT + 1, :] > 0.5
            excl = pf[ROW_EXCLUDE:ROW_EXCLUDE + 1, :]
        else:
            tinit = p[ROW_TINIT:ROW_TINIT + 1, :]
            act = p[ROW_ACTIVE:ROW_ACTIVE + 1, :] > 0.5
            anyh = p[ROW_ANYHIT:ROW_ANYHIT + 1, :] > 0.5
            excl = p[ROW_EXCLUDE:ROW_EXCLUDE + 1, :]
            # bf16 table -> convert the pack ONCE per block (one VPU
            # pass); bf16 x bf16 -> f32 is the MXU's native fast path.
            pc = p.astype(jnp.bfloat16) if a_ref.dtype == jnp.bfloat16 else p

        pid = pl.program_id(0)
        pid_j = pl.program_id(1) if nchunks > 1 else 0
        nwords = -(-nt // 32)

        def init():
            # inactive lanes park at -inf so they can never record a hit
            # even when their block runs a tile for other lanes
            t_ref[:] = jnp.where(act, tinit, -jnp.inf)
            i_ref[:] = jnp.full((1, block), -1, jnp.int32)

        if nchunks > 1:
            pl.when(pid_j == 0)(init)
        else:
            init()

        row = jax.lax.broadcasted_iota(jnp.int32, (c, block), 0)
        rowf = row.astype(jnp.float32)
        for j in range(tpc):
            # rel is FLAT [grid*nwords] in SMEM: a [grid, nwords] layout
            # lane-pads each row to 128 words (1 MB of 1 MB smem at 2k
            # blocks); the flat form stays at grid*nwords*4 bytes.
            # jg is the GLOBAL tile id (chunk-offset in streamed mode).
            jg = pid_j * tpc + j
            bit = (rel_ref[pid * nwords + jg // 32] >> (jg % 32)) & 1
            @pl.when(bit != 0)
            def _(j=j, jg=jg):
                # [4C, block] = A_tile[16, 4C]^T . P[16, block]; the
                # control rows (10-12) hit all-zero coefficient rows
                sl = slice(j * 4 * c, (j + 1) * 4 * c)
                out = jax.lax.dot_general(
                    a_ref[:, sl], pc,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(jax.lax.Precision.DEFAULT if split
                               else MATMUL_PRECISION))
                den = out[0 * c:1 * c]
                tden = out[1 * c:2 * c]
                uden = out[2 * c:3 * c]
                vden = out[3 * c:4 * c]
                den2 = den * den
                m = jnp.minimum(jnp.minimum(uden * den, vden * den),
                                (den - uden - vden) * den)
                td = tden * den
                hit = (m >= 0.0) & (td > EPS * den2)
                # per-lane self-exclusion (see Hit.tri in ops/intersect.py)
                basef = jax.lax.convert_element_type(jnp.asarray(jg * c),
                                                     jnp.float32)
                hit = hit & (rowf + basef != excl)
                score = jnp.where(hit, td / den2, jnp.inf)
                tmin = jnp.min(score, axis=0, keepdims=True)
                targ = jnp.min(jnp.where(score <= tmin, row, c), axis=0,
                               keepdims=True) + jg * c
                cur_t = t_ref[:]
                better = tmin < cur_t
                t_ref[:] = jnp.where(better,
                                     jnp.where(anyh, -jnp.inf, tmin), cur_t)
                i_ref[:] = jnp.where(better, targ, i_ref[:])

        def finalize():
            got = i_ref[:] >= 0
            t_ref[:] = jnp.where(got & jnp.isfinite(t_ref[:]), t_ref[:],
                                 tinit)

        if nchunks > 1:
            pl.when(pid_j == nchunks - 1)(finalize)
        else:
            finalize()

    return impl


def _block_relevance(clusters, origin, direction, t_init, act, nblocks,
                     block, pad=0):
    """[nblocks, ceil(nt/32)] uint32 bitmask: does any active ray in block
    b enter cluster j closer than its t_init?  Vectorized slab test left
    to XLA — it fuses into a few passes over [N, nt] and replaces the
    kernel-resident scalar walk that dominated the round-1 kernel's fixed
    cost."""
    nt = clusters.shape[0]
    safe = jnp.where(jnp.abs(direction) < 1e-12,
                     jnp.where(direction >= 0.0, 1e-12, -1e-12), direction)
    inv_d = 1.0 / safe
    # axis-at-a-time accumulation keeps intermediates at [N,nt] instead of
    # materializing [N,nt,3] broadcasts (3x the HBM traffic; the whole
    # bounce step is traffic-bound, PERF.md round-2 budget)
    ent = jnp.full((origin.shape[0], nt), EPS, jnp.float32)
    ext = jnp.full((origin.shape[0], nt), jnp.inf, jnp.float32)
    for k in range(3):
        lo = (clusters[None, :, k] - origin[:, k:k + 1]) * inv_d[:, k:k + 1]
        hi = (clusters[None, :, 3 + k] - origin[:, k:k + 1]) * inv_d[:, k:k + 1]
        ent = jnp.maximum(ent, jnp.minimum(lo, hi))
        ext = jnp.minimum(ext, jnp.maximum(lo, hi))
    rel = (ent <= jnp.minimum(ext, t_init[:, None])) & act[:, None]
    if pad:
        rel = jnp.pad(rel, ((0, pad), (0, 0)))
    rel = rel.reshape(nblocks, block, nt).any(axis=1)  # [nblocks, nt]
    nwords = -(-nt // 32)
    npad_bits = nwords * 32
    relp = jnp.pad(rel, ((0, 0), (0, npad_bits - nt)))
    weights = (jnp.uint32(1) << (jnp.arange(npad_bits, dtype=jnp.uint32)
                                 % 32)).reshape(nwords, 32)
    words = jnp.sum(relp.reshape(nblocks, nwords, 32).astype(jnp.uint32)
                    * weights[None], axis=-1, dtype=jnp.uint32)
    return words


def ray_cluster_count(clusters, origin, direction, t_init):
    """Per-ray count of matmul tiles whose AABB the ray enters closer than
    ``t_init`` -- the brute backend's traversal-cost metric for the debug
    AOV (VIEW_STACK_INDEX analogue, kernels/main.cl:6-13,144-147)."""
    safe = jnp.where(jnp.abs(direction) < 1e-12,
                     jnp.where(direction >= 0.0, 1e-12, -1e-12), direction)
    inv_d = 1.0 / safe
    lo = (clusters[None, :, 0:3] - origin[:, None, :]) * inv_d[:, None, :]
    hi = (clusters[None, :, 3:6] - origin[:, None, :]) * inv_d[:, None, :]
    ent = jnp.maximum(jnp.max(jnp.minimum(lo, hi), axis=-1), EPS)
    ext = jnp.min(jnp.maximum(lo, hi), axis=-1)
    rel = ent <= jnp.minimum(ext, jnp.broadcast_to(t_init, ent.shape[:1])[:, None])
    return jnp.sum(rel, axis=-1).astype(jnp.int32)


def _intersect_pallas(feat, clusters, origin, direction, t_init, active,
                      any_hit=False, exclude=None, interpret=False):
    n = origin.shape[0]
    c = TILE
    tpad = feat.shape[1] // 4
    # HBM-streamed mode for meshes past the VMEM-resident cap: pad the
    # table to a whole number of CHUNK_TRIS-triangle chunks (zero
    # coefficients can never hit; empty clusters never set a rel bit)
    stream = tpad > BRUTE_MAX_TRIS
    if stream:
        ccols = 4 * CHUNK_TRIS
        colpad = (-feat.shape[1]) % ccols
        if colpad:
            feat = jnp.pad(feat, ((0, 0), (0, colpad)))
            ntile_pad = colpad // (4 * c)
            empty = jnp.tile(jnp.asarray(
                [[3e38, 3e38, 3e38, -3e38, -3e38, -3e38, 0, 0]],
                jnp.float32), (ntile_pad, 1))
            clusters = jnp.concatenate([clusters, empty], axis=0)
        nchunks = feat.shape[1] // ccols
        tpc = CHUNK_TRIS // c
    else:
        nchunks, tpc = 1, None
    nt = feat.shape[1] // (4 * c)
    pad = (-n) % BLOCK
    npad = n + pad
    act = active if active is not None else jnp.ones((n,), bool)
    t_init = jnp.broadcast_to(t_init, (n,))
    ah = jnp.broadcast_to(jnp.asarray(any_hit, jnp.float32), (n,))
    ex = (jnp.full((n,), -1.0, jnp.float32) if exclude is None
          else exclude.astype(jnp.float32))

    grid = npad // BLOCK
    if _os.environ.get("PRT_MESH_NOREL"):  # debug: disable tile pruning
        nt_ = clusters.shape[0]
        rel = jnp.full((grid * (-(-nt_ // 32)),), 0xFFFFFFFF, jnp.uint32)
    else:
        rel = _block_relevance(clusters, origin, direction, t_init,
                               act, grid, BLOCK, pad).reshape(-1)

    # transposed lane-aligned pack [FEAT, npad]: rows 0-9 the Moller-
    # Trumbore ray features, rows 10-12 control (t_init/active/anyhit);
    # built as one stack of [N] rows so no (block, 3) pallas operand ever
    # exists (see _make_kernel LAYOUT note)
    o0, o1, o2 = origin[:, 0], origin[:, 1], origin[:, 2]
    d0, d1, d2 = direction[:, 0], direction[:, 1], direction[:, 2]
    rows = [o0, o1, o2, d0, d1, d2,
            d1 * o2 - d2 * o1, d2 * o0 - d0 * o2, d0 * o1 - d1 * o0,
            jnp.ones((n,), jnp.float32),
            t_init, act.astype(jnp.float32), ah, ex]
    rows += [jnp.zeros((n,), jnp.float32)] * (FEAT - len(rows))
    p = jnp.stack(rows, axis=0)
    if pad:
        p = jnp.pad(p, ((0, 0), (0, pad)))

    split_terms = _SPLIT_TERMS.get(_PRECISION_NAME, ())
    split = bool(split_terms) and feat.dtype != jnp.bfloat16
    kfeat = len(split_terms) * FEAT if split else FEAT
    if split:
        # stacked-K hi/lo decomposition (see _make_kernel); loop-
        # invariant, so XLA hoists the table split out of any scan
        np_parts = max(j for _, j in split_terms) + 1
        na_parts = max(i for i, _ in split_terms) + 1
        pp = _hi_lo_parts(p, np_parts)
        ap = _hi_lo_parts(feat, na_parts)
        p = jnp.concatenate([pp[j] for _, j in split_terms], axis=0)
        feat = jnp.concatenate([ap[i] for i, _ in split_terms], axis=0)
    operands = (rel, p, feat)
    mm_passes = len(split_terms) if split else 1
    if stream:
        # 2-D grid, chunks INNERMOST: the same output block is revisited
        # across consecutive steps (accumulation) while pallas double-
        # buffers the next table chunk from HBM.  Traffic floor:
        # nblocks x table bytes per dispatch.
        grid_spec = (grid, nchunks)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((kfeat, BLOCK), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((kfeat, ccols), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM)]
        out_specs = (
            pl.BlockSpec((1, BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        )
        bytes_est = grid * feat.shape[0] * feat.shape[1] * feat.dtype.itemsize \
            + npad * 8 * 4
    else:
        grid_spec = (grid,)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((kfeat, BLOCK), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((kfeat, feat.shape[1]), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)]
        out_specs = (
            pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        )
        bytes_est = npad * 8 * 4 + feat.size * feat.dtype.itemsize

    out_t, out_i = pl.pallas_call(
        _make_kernel(nt, c, BLOCK, split, split_terms,
                     tpc=tpc, nchunks=nchunks),
        grid=grid_spec,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * FEAT * 4 * feat.shape[1] * mm_passes,
            bytes_accessed=int(bytes_est),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out_t[0, :n], out_i[0, :n]


def uses_pallas() -> bool:
    """True when mesh_intersect will take the TPU pallas kernel path
    (callers gate pallas-specific backstops -- e.g. the validate-reject
    second pass -- on this; the XLA path is exact and never needs them).
    """
    return (jax.devices()[0].platform == "tpu"
            and not _os.environ.get("PRT_MESH_FORCE_XLA"))


def mesh_intersect(feat, clusters, origin, direction, t_init, active=None,
                   any_hit=False, exclude=None):
    """Closest mesh hit by exhaustive matmul testing.

    Returns (t [N], tri [N] int32 index into the compact bf arrays, -1 on
    miss); t falls back to t_init when no triangle beats it.  ``any_hit``
    may be a python bool or a PER-LANE [N] array (mixed shadow/closest
    batches share one dispatch): for any-hit lanes the returned t is
    t_init everywhere and only tri >= 0 (occluded) is meaningful; occluded
    lanes stop scanning clusters early.
    Fully detached (gradients reattach through the chosen triangle).
    """
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    t_init = jax.lax.stop_gradient(t_init)
    feat = jax.lax.stop_gradient(feat)
    if active is not None:
        active = jax.lax.stop_gradient(active)
    if exclude is not None:
        exclude = jax.lax.stop_gradient(exclude)
    if (jax.devices()[0].platform == "tpu"
            and not _os.environ.get("PRT_MESH_FORCE_XLA")):
        return _intersect_pallas(feat, clusters, origin, direction, t_init,
                                 active, any_hit=any_hit, exclude=exclude)
    # the XLA fallback always computes the closest hit; that subsumes
    # any-hit semantics (tri >= 0 iff some triangle is closer than t_init)
    return _intersect_xla(feat, clusters, origin, direction, t_init, active,
                          exclude=exclude)

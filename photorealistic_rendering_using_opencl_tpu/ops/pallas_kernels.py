"""Pallas TPU kernels for bandwidth-bound pipeline stages.

Two kernels ship here:

  * ``tonemap_pallas`` -- the full display transform (vignette, filmic
    Reinhard, toe smoothstep, gamma) fused into ONE VMEM pass over the
    image.  The pure-JAX version (ops/tonemap.py) materializes several
    [H,W,3] temporaries through HBM; this reads the HDR image once and
    writes the LDR image once.
  * ``exclusive_prefix_sum`` / ``compact_indices`` -- the sort-free stream
    compaction primitive for wavefront scheduling (SURVEY §2.4: compaction
    via prefix-sum rather than the GPU-style atomic queues).

Both run in interpret mode off-TPU so the test suite covers them on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W = 1.2
_T2 = 7.5
LANE = 128


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _curve(x):
    q = (_T2 * _T2 + 1.0) * x * x
    return q / (q + x + _T2 * _T2)


def _tonemap_kernel(img_ref, vig_ref, out_ref):
    color = img_ref[:] * vig_ref[:]
    color = _curve(color) / _curve(_W)
    # smoothstep(-0.025, 1.0, color)
    t = jnp.clip((color + 0.025) / 1.025, 0.0, 1.0)
    color = t * t * (3.0 - 2.0 * t)
    out_ref[:] = jnp.power(jnp.clip(color, 0.0, 1.0), 1.0 / 2.2)


def tonemap_pallas(img: jnp.ndarray, vignette: bool = True,
                   brightness: float = 1.0) -> jnp.ndarray:
    """Fused display transform; img [H,W,3] -> LDR [H,W,3] in [0,1].

    The vignette weight is a tiny separable precompute; the heavy
    per-pixel chain runs in one Pallas pass, tiled over rows so arbitrary
    image sizes stay within VMEM.
    """
    h, w = img.shape[0], img.shape[1]
    if vignette:
        ys = 1.0 - 2.0 * (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = 1.0 - 2.0 * (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        pp = ys[:, None] ** 2 + xs[None, :] ** 2
        vig = 1.25 / (1.1 + 1.1 * pp)
        vig = vig * vig
        t = jnp.clip((vig - 0.1) / 1.0, 0.0, 1.0)
        vig = 1.0 + (t * t * (3.0 - 2.0 * t) - 1.0) * 0.25
    else:
        vig = jnp.ones((h, w), jnp.float32)
    vig = (vig * brightness)[..., None]

    flat = img.reshape(h * w, 3)
    vflat = jnp.broadcast_to(vig.reshape(h * w, 1), flat.shape)
    n = h * w
    rows = 512
    pad = (-n) % rows
    flat = jnp.pad(flat, ((0, pad), (0, 0)))
    vflat = jnp.pad(vflat, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        _tonemap_kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        grid=(flat.shape[0] // rows,),
        in_specs=[
            pl.BlockSpec((rows, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(flat, vflat)
    return out[:n].reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Prefix-sum compaction
# ---------------------------------------------------------------------------

def _block_scan_kernel(flags_ref, out_ref, total_ref):
    """Per-block exclusive scan + block total (flags are 0/1 int32)."""
    f = flags_ref[:]
    inc = jnp.cumsum(f, axis=0)
    out_ref[:] = inc - f
    total_ref[0] = inc[-1]


def exclusive_prefix_sum(flags: jnp.ndarray, block: int = 1024):
    """Exclusive prefix sum of an int32 vector, Pallas-blocked.

    Two-level scan: per-block scans run as a Pallas grid, block totals are
    scanned on the host trace (tiny), offsets broadcast back.  Returns
    (scan[N], total).
    """
    n = flags.shape[0]
    pad = (-n) % block
    f = jnp.pad(flags.astype(jnp.int32), (0, pad))
    nb = f.shape[0] // block

    scans, totals = pl.pallas_call(
        _block_scan_kernel,
        out_shape=(jax.ShapeDtypeStruct(f.shape, jnp.int32),
                   jax.ShapeDtypeStruct((nb,), jnp.int32)),
        grid=(nb,),
        in_specs=[pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((block,), lambda i: (i,),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1,), lambda i: (i,),
                                memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(f)
    offsets = jnp.cumsum(totals) - totals  # [nb], exclusive
    full = scans + jnp.repeat(offsets, block)
    return full[:n], jnp.sum(totals)


def compact_indices(alive: jnp.ndarray):
    """Indices of live lanes packed to the front (stable), dead behind.

    Returns (perm[N], n_alive): perm is a permutation of [0, N); applying
    ``x[perm]`` groups live lanes first -- the TPU-native wavefront
    compaction (no atomics; prefix-sum addressing).
    """
    n = alive.shape[0]
    flags = alive.astype(jnp.int32)
    pos_alive, n_alive = exclusive_prefix_sum(flags)
    pos_dead, _ = exclusive_prefix_sum(1 - flags)
    slot = jnp.where(alive, pos_alive, n_alive + pos_dead)
    perm = jnp.zeros((n,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, n_alive

"""Environment map: equirect lookup on miss + importance sampling.

The lookup mirrors ``envMapEquirect`` (kernels/utils.cl:46) with bilinear
filtering (the reference relies on the GL sampler's CLK_FILTER_LINEAR,
main.cl:25).  Importance sampling over the luminance distribution is new --
the reference has none (SURVEY §7 stage 8) -- and is needed for IBL with
small bright regions and for stable gradients w.r.t. the map.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.ops.math import (
    INV_FOUR_PI, INV_PI, INV_TWO_PI, PI, TWO_PI,
)


def equirect_uv(direction: jnp.ndarray):
    """direction[...,3] -> (u, v) in [0,1]^2 (utils.cl:46)."""
    u = jnp.arctan2(direction[..., 2], direction[..., 0]) * INV_TWO_PI + 0.5
    v = jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0)) * INV_PI
    return u, v


def sample_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear fetch from img[H,W,3]; u wraps, v clamps."""
    h, w = img.shape[0], img.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = img[y0i, x0i]
    c10 = img[y0i, x1i]
    c01 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def radiance(env_map: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    u, v = equirect_uv(direction)
    return sample_bilinear(env_map, u, v)


# ---------------------------------------------------------------------------
# Luminance-CDF importance sampling (host precompute + device inverse-CDF)
# ---------------------------------------------------------------------------

def build_env_distribution(env_map: jnp.ndarray):
    """Precompute row/conditional CDFs weighted by sin(theta).

    Returns a dict usable by sample_env / env_pdf; all arrays static-shaped.
    """
    h, w = env_map.shape[0], env_map.shape[1]
    lum = jnp.sum(env_map * jnp.asarray([0.2126, 0.7152, 0.0722]), axis=-1)
    theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * PI
    weights = lum * jnp.sin(theta)[:, None] + 1e-12
    row_sums = jnp.sum(weights, axis=1)  # [H]
    cond_cdf = jnp.cumsum(weights, axis=1) / row_sums[:, None]  # [H,W]
    marg_cdf = jnp.cumsum(row_sums) / jnp.sum(row_sums)  # [H]
    return dict(cond_cdf=cond_cdf, marg_cdf=marg_cdf,
                weights=weights, total=jnp.sum(row_sums))


def sample_env(dist: dict, u1: jnp.ndarray, u2: jnp.ndarray):
    """Continuous inverse-CDF sample -> (direction[N,3], solid-angle pdf[N]).

    The sample is uniform *within* the selected texel (intra-cell CDF
    fraction) so the estimator radiance(d)/pdf is unbiased -- emitting only
    cell centers would be a discrete distribution masquerading as a
    density and biases bright-texel scenes.
    """
    h, w = dist["cond_cdf"].shape
    marg = dist["marg_cdf"]
    row = jnp.clip(jnp.searchsorted(marg, u1), 0, h - 1)
    c_hi = marg[row]
    c_lo = jnp.where(row > 0, marg[jnp.maximum(row - 1, 0)], 0.0)
    frac_v = jnp.clip((u1 - c_lo) / jnp.maximum(c_hi - c_lo, 1e-12), 0., 1.)

    cond = dist["cond_cdf"]
    col = jnp.clip(jax_searchsorted_rows(cond, row, u2), 0, w - 1)
    d_hi = cond[row, col]
    d_lo = jnp.where(col > 0, cond[row, jnp.maximum(col - 1, 0)], 0.0)
    frac_u = jnp.clip((u2 - d_lo) / jnp.maximum(d_hi - d_lo, 1e-12), 0., 1.)

    v = (row.astype(jnp.float32) + frac_v) / h
    u = (col.astype(jnp.float32) + frac_u) / w
    theta = v * PI
    phi = (u - 0.5) * TWO_PI
    sin_t = jnp.sin(theta)
    direction = jnp.stack([
        jnp.cos(phi) * sin_t, jnp.cos(theta), jnp.sin(phi) * sin_t
    ], axis=-1)
    pdf = env_pdf_from_cell(dist, row, col, sin_t)
    return direction, pdf


def jax_searchsorted_rows(cdf_table: jnp.ndarray, row: jnp.ndarray,
                          u: jnp.ndarray):
    """Per-ray searchsorted within a selected row of a [H,W] CDF table.

    Bisection with O(log W) single-element gathers -- never materializes
    the [N,W] row gather (256 MB+ for megapixel batches on wide HDRs).
    Returns the first index where cdf >= u.
    """
    import jax

    h, w = cdf_table.shape
    steps = max(1, int(np.ceil(np.log2(max(w, 2)))))
    lo = jnp.zeros_like(row)
    hi = jnp.full_like(row, w - 1)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        below = cdf_table[row, mid] < u
        return jnp.where(below, mid + 1, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo.astype(jnp.int32)


def env_pdf_from_cell(dist, row, col, sin_theta):
    h, w = dist["cond_cdf"].shape
    cell = dist["weights"][row, col] / dist["total"]
    # p(u,v) = cell * H*W ; dw = (2pi/W)(pi/H) sin(theta)
    pdf = cell * h * w / jnp.maximum(
        TWO_PI * PI * sin_theta, 1e-12)
    return pdf


def env_pdf(dist: dict, direction: jnp.ndarray):
    """Solid-angle pdf of sampling a given direction."""
    h, w = dist["cond_cdf"].shape
    u, v = equirect_uv(direction)
    col = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    sin_t = jnp.sqrt(jnp.maximum(
        1.0 - direction[..., 1] * direction[..., 1], 1e-12))
    return env_pdf_from_cell(dist, row, col, sin_t)

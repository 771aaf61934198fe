"""Microfacet distributions: Beckmann / Phong / GGX (D, G1, G, pdf, sample).

Vectorized, branch-free re-design of ``kernels/bxdf/microfacet.cl`` (itself
a Tungsten port).  The distribution id is a per-ray int bitmask; instead of
scalar if/else chains we compute the selected distribution with masked
selects -- on the VPU the three closed forms are cheaper than divergence.
"""
from __future__ import annotations

import jax.numpy as jnp

from photorealistic_rendering_using_opencl_tpu.ops.math import INV_PI, INV_TWO_PI, TWO_PI, safe_sqrt
from photorealistic_rendering_using_opencl_tpu.scene.types import BECKMANN, GGX, PHONG


def roughness_to_alpha(dist: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """microfacet.cl:11-18; Phong maps roughness -> exponent."""
    r = jnp.maximum(roughness, 1e-3)
    phong = 2.0 / (r * r) - 2.0
    return jnp.where((dist & PHONG) != 0, phong, r)


def D(dist: jnp.ndarray, alpha: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    mz = m[..., 2]
    a2 = alpha * alpha
    c2 = mz * mz
    t2 = jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-12)
    c4 = jnp.maximum(c2 * c2, 1e-20)
    # Beckmann in log space: the quotient form's partial wrt c4 is
    # exp(-t2/a2) / (a2 * c4^2), which overflows f32 to inf at grazing
    # half-vectors (c2 ~ 0) while exp underflows to exactly 0 -- the
    # backward pass then evaluates 0 * inf = NaN on masked lanes.  In log
    # space every partial carries the (zero) value as a factor.
    a2s = jnp.maximum(a2, 1e-12)
    c2s = jnp.maximum(c2, 1e-12)
    beck = INV_PI * jnp.exp(-t2 / a2s - jnp.log(a2s) - 2.0 * jnp.log(c2s))
    phong = (alpha + 2.0) * INV_TWO_PI * jnp.power(jnp.maximum(mz, 1e-12), alpha)
    ggx = a2 * INV_PI / (c4 * jnp.square(a2 + t2))
    d = jnp.where((dist & BECKMANN) != 0, beck,
                  jnp.where((dist & PHONG) != 0, phong, ggx))
    return jnp.where(mz <= 0.0, 0.0, d)


def G1(dist: jnp.ndarray, alpha: jnp.ndarray, v: jnp.ndarray,
       m: jnp.ndarray) -> jnp.ndarray:
    vz = v[..., 2]
    back = jnp.sum(v * m, axis=-1) * vz <= 0.0
    c2 = vz * vz
    tan_theta = jnp.abs(safe_sqrt(1.0 - c2) / jnp.where(vz == 0.0, 1e-12, vz))
    tan_theta = jnp.maximum(tan_theta, 1e-12)

    def _smith_rational(a):
        a = jnp.maximum(a, 1e-12)
        low = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
        return jnp.where(a < 1.6, low, 1.0)

    beck = _smith_rational(1.0 / (jnp.maximum(alpha, 1e-12) * tan_theta))
    phong = _smith_rational(jnp.sqrt(0.5 * alpha + 1.0) / tan_theta)
    t2 = jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-12)
    ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * t2))
    g = jnp.where((dist & BECKMANN) != 0, beck,
                  jnp.where((dist & PHONG) != 0, phong, ggx))
    return jnp.where(back, 0.0, g)


def G(dist, alpha, wi, wo, m):
    return G1(dist, alpha, wi, m) * G1(dist, alpha, wo, m)


def pdf(dist, alpha, m):
    return D(dist, alpha, m) * jnp.maximum(m[..., 2], 0.0)


def sample(dist: jnp.ndarray, alpha: jnp.ndarray, u1: jnp.ndarray,
           u2: jnp.ndarray) -> jnp.ndarray:
    phi = u2 * TWO_PI
    xs = jnp.clip(u1, 0.0, 1.0 - 1e-7)
    beck_t2 = -alpha * alpha * jnp.log1p(-xs)
    beck_c = 1.0 / jnp.sqrt(1.0 + beck_t2)
    phong_c = jnp.power(xs, 1.0 / (alpha + 2.0))
    ggx_t2 = alpha * alpha * xs / (1.0 - xs)
    ggx_c = 1.0 / jnp.sqrt(1.0 + ggx_t2)
    cos_theta = jnp.where((dist & BECKMANN) != 0, beck_c,
                          jnp.where((dist & PHONG) != 0, phong_c, ggx_c))
    r = safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, cos_theta], axis=-1)


# ---------------------------------------------------------------------------
# Blinn NDF (kernels/bxdf/old/blinn.cl -- dead in the reference: nothing
# includes it; kept live here for capability parity)
# ---------------------------------------------------------------------------

def blinn_d(cos_nh, alpha):
    """DistributionBlinn (blinn.cl:5-7): (a+2) max(0, n.wh)^a / 2pi."""
    from photorealistic_rendering_using_opencl_tpu.ops.math import INV_TWO_PI
    return (alpha + 2.0) * jnp.power(jnp.maximum(cos_nh, 0.0),
                                     alpha) * INV_TWO_PI


def blinn_sample(u1, u2, alpha):
    """SampleBlinn (blinn.cl:9-19) in the local frame: cosTheta =
    u^(1/(a+1)); returns a unit half-vector about +z."""
    from photorealistic_rendering_using_opencl_tpu.ops.math import TWO_PI
    phi = TWO_PI * u1
    cos_t = jnp.power(u2, 1.0 / (alpha + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t],
                     axis=-1)

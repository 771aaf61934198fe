"""Fresnel reflectance: exact conductor + dielectric with refraction cosine.

Vectorized equivalents of ``kernels/bxdf/Fresnel.cl:6-67`` (Shirley's exact
conductor form and the dielectric form returning cos(theta_t)), broadcast
over ray batches and RGB simultaneously.
"""
from __future__ import annotations

import jax.numpy as jnp

from photorealistic_rendering_using_opencl_tpu.ops.math import safe_sqrt


def conductor_reflectance(eta: jnp.ndarray, k: jnp.ndarray,
                          cos_theta_i: jnp.ndarray) -> jnp.ndarray:
    """Exact unpolarized conductor Fresnel.

    eta/k broadcast against cos_theta_i; for RGB pass eta[...,3], k[...,3]
    and cos_theta_i[..., None].
    """
    c = cos_theta_i
    c2 = c * c
    sin2 = jnp.maximum(1.0 - c2, 0.0)
    sin4 = sin2 * sin2
    inner = eta * eta - k * k - sin2
    a2b2 = safe_sqrt(inner * inner + 4.0 * eta * eta * k * k)
    a = safe_sqrt((a2b2 + inner) * 0.5)
    rs = ((a2b2 + c2) - 2.0 * a * c) / jnp.maximum((a2b2 + c2) + 2.0 * a * c, 1e-30)
    rp_num = (c2 * a2b2 + sin4) - 2.0 * a * c * sin2
    rp_den = (c2 * a2b2 + sin4) + 2.0 * a * c * sin2
    rp = rp_num / jnp.maximum(rp_den, 1e-30)
    # NB the reference returns 0.5*(Rs + Rs*Rp) (Fresnel.cl:20) -- Rp there is
    # the *ratio* Rp/Rs from Shirley's derivation, so this is 0.5*(Rs+Rp_true).
    return 0.5 * (rs + rs * rp)


def conductor_reflectance_rgb(eta3: jnp.ndarray, k3: jnp.ndarray,
                              cos_theta_i: jnp.ndarray) -> jnp.ndarray:
    return conductor_reflectance(eta3, k3, cos_theta_i[..., None])


def dielectric_reflectance(eta: jnp.ndarray, cos_theta_i: jnp.ndarray):
    """Returns (F, cos_theta_t).

    ``eta`` is the relative IOR for rays entering along +z; a negative
    incident cosine flips the interface, matching Fresnel.cl:41-45.
    cos_theta_t is the magnitude of the transmitted cosine (0 at TIR).
    """
    flip = cos_theta_i < 0.0
    eta_eff = jnp.where(flip, 1.0 / eta, eta)
    ci = jnp.abs(cos_theta_i)
    sin2t = eta_eff * eta_eff * jnp.maximum(1.0 - ci * ci, 0.0)
    tir = sin2t > 1.0
    ct = safe_sqrt(1.0 - sin2t)
    rs = (eta_eff * ci - ct) / jnp.maximum(eta_eff * ci + ct, 1e-30)
    rp = (eta_eff * ct - ci) / jnp.maximum(eta_eff * ct + ci, 1e-30)
    f = 0.5 * (rs * rs + rp * rp)
    f = jnp.where(tir, 1.0, f)
    ct = jnp.where(tir, 0.0, ct)
    return f, ct

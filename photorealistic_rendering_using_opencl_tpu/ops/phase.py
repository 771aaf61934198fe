"""Phase functions: isotropic / Henyey-Greenstein / Rayleigh, batched.

Re-design of ``kernels/phasefunctions/*.cl``.  The reference selects one
phase function per *build* by include choice (SURVEY §2.2); here the choice
is a static config string and the HG anisotropy ``g`` is a differentiable
scene parameter instead of a baked macro (HenyeyGreenstein.cl:4).

All functions take world-space directions; ``wi`` is the propagation
direction of the ray entering the scatter event.
"""
from __future__ import annotations

import jax.numpy as jnp

from photorealistic_rendering_using_opencl_tpu.ops.math import (
    INV_FOUR_PI, PI, TWO_PI, dot, to_global,
)


# ----------------------------- isotropic -----------------------------------

def iso_eval(wi, wo, g=None):
    return jnp.full(wi.shape[:-1], INV_FOUR_PI, jnp.float32)


def iso_pdf(wi, wo, g=None):
    return jnp.full(wi.shape[:-1], INV_FOUR_PI, jnp.float32)


def iso_sample(wi, u1, u2, g=None):
    from photorealistic_rendering_using_opencl_tpu.ops.sampling import uniform_sphere
    w = uniform_sphere(u1, u2)
    pdf = jnp.full(wi.shape[:-1], INV_FOUR_PI, jnp.float32)
    return w, pdf


# ------------------------- Henyey-Greenstein -------------------------------

def _hg(cos_theta, g):
    term = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_FOUR_PI * (1.0 - g * g) / (term * jnp.sqrt(jnp.maximum(term, 1e-12)))


def hg_eval(wi, wo, g):
    return _hg(dot(wi, wo), g)


def hg_pdf(wi, wo, g):
    return _hg(dot(wi, wo), g)


def hg_sample(wi, u1, u2, g):
    phi = u1 * TWO_PI
    g_safe = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    cos_theta = (1.0 + g_safe * g_safe
                 - jnp.square((1.0 - g_safe * g_safe)
                              / (1.0 + g_safe * (u2 * 2.0 - 1.0)))) / (2.0 * g_safe)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    local = jnp.stack([jnp.cos(phi) * sin_theta,
                       jnp.sin(phi) * sin_theta,
                       cos_theta], axis=-1)
    w = to_global(wi, local)
    return w, _hg(cos_theta, g)


# ------------------------------ Rayleigh -----------------------------------

def _rayleigh(cos_theta):
    return (3.0 / (16.0 * PI)) * (1.0 + cos_theta * cos_theta)


def rayleigh_eval(wi, wo, g=None):
    return _rayleigh(dot(wi, wo))


def rayleigh_pdf(wi, wo, g=None):
    return _rayleigh(dot(wi, wo))


def rayleigh_sample(wi, u1, u2, g=None):
    """Exact inverse-CDF via the cubic root (Rayleigh.cl:16-39)."""
    phi = u1 * TWO_PI
    z = u2 * 4.0 - 2.0
    inv_z = jnp.sqrt(z * z + 1.0)
    u = jnp.cbrt(z + inv_z)
    cos_theta = u - 1.0 / u
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    local = jnp.stack([jnp.cos(phi) * sin_theta,
                       jnp.sin(phi) * sin_theta,
                       cos_theta], axis=-1)
    w = to_global(wi, local)
    return w, _rayleigh(cos_theta)


_TABLE = {
    "isotropic": (iso_eval, iso_pdf, iso_sample),
    "hg": (hg_eval, hg_pdf, hg_sample),
    "rayleigh": (rayleigh_eval, rayleigh_pdf, rayleigh_sample),
}


def get(name: str):
    """Return (eval, pdf, sample) for a statically selected phase function."""
    return _TABLE[name]

"""Direction sampling library with pdfs and inverses, batched.

Vectorized re-design of ``kernels/utils.cl:92-169`` (uniform sphere /
hemisphere / spherical cap / cosine / phong-hemisphere samplers and their
inverses).  All samplers take uniform variates in [0,1) with trailing-axis
vectors and broadcast over ray batches.
"""
from __future__ import annotations

import jax.numpy as jnp

from photorealistic_rendering_using_opencl_tpu.ops.math import (
    INV_FOUR_PI, INV_PI, INV_TWO_PI, TWO_PI, safe_sqrt,
)


def _from_polar(phi, z):
    # safe_sqrt: z hits +-1 exactly (u=0 draws; f32 rounding of cap
    # cosines), where sqrt's inf partial turns masked lanes' zero
    # cotangents into NaN gradients
    r = safe_sqrt(1.0 - z * z)
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1)


def invert_phi(w: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
    x, y = w[..., 0], w[..., 1]
    deg = (x == 0.0) & (y == 0.0)
    res = jnp.where(deg, mu * INV_TWO_PI, jnp.arctan2(y, x) * INV_TWO_PI)
    return jnp.where(res < 0.0, res + 1.0, res)


# -------------------------- uniform sphere ---------------------------------

def uniform_sphere(u1, u2):
    return _from_polar(u1 * TWO_PI, u2 * 2.0 - 1.0)


def uniform_sphere_pdf():
    return INV_FOUR_PI


def invert_uniform_sphere(w, mu):
    return invert_phi(w, mu), (w[..., 2] + 1.0) * 0.5


# ------------------------- uniform hemisphere ------------------------------

def uniform_hemisphere(u1, u2):
    phi = TWO_PI * u1
    r = jnp.sqrt(jnp.maximum(1.0 - u2 * u2, 0.0))
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, u2], axis=-1)


def uniform_hemisphere_pdf():
    return INV_TWO_PI


def invert_uniform_hemisphere(w, mu):
    return invert_phi(w, mu), w[..., 2]


# ------------------------- spherical cap -----------------------------------

def uniform_spherical_cap(u1, u2, cos_theta_max):
    z = u2 * (1.0 - cos_theta_max) + cos_theta_max
    return _from_polar(u1 * TWO_PI, z)


def uniform_spherical_cap_pdf(cos_theta_max):
    return INV_TWO_PI / jnp.maximum(1.0 - cos_theta_max, 1e-12)


def invert_uniform_spherical_cap(w, cos_theta_max, mu):
    """Returns (valid, u1, u2)."""
    xi_y = (w[..., 2] - cos_theta_max) / (1.0 - cos_theta_max)
    valid = (xi_y >= 0.0) & (xi_y < 1.0)
    return valid, invert_phi(w, mu), xi_y


# ------------------------- cosine hemisphere -------------------------------

def cosine_hemisphere(u1, u2):
    phi = u1 * TWO_PI
    r = jnp.sqrt(u2)
    return jnp.stack([
        jnp.cos(phi) * r,
        jnp.sin(phi) * r,
        jnp.sqrt(jnp.maximum(1.0 - u2, 0.0)),
    ], axis=-1)


def cosine_hemisphere_pdf(w):
    return jnp.abs(w[..., 2]) * INV_PI


def invert_cosine_hemisphere(w, mu):
    return invert_phi(w, mu), jnp.maximum(1.0 - w[..., 2] * w[..., 2], 0.0)


# ------------------------- phong hemisphere --------------------------------

def phong_hemisphere(u1, u2, n):
    phi = u1 * TWO_PI
    cos_theta = jnp.power(u2, 1.0 / (n + 1.0))
    return _from_polar(phi, cos_theta)


def phong_hemisphere_pdf(w, n):
    return INV_TWO_PI * (n + 1.0) * jnp.power(jnp.maximum(w[..., 2], 0.0), n)


def invert_phong_hemisphere(w, n, mu):
    return invert_phi(w, mu), jnp.power(w[..., 2], n + 1.0)


# ------------------------- concentric-ish disk -----------------------------

def uniform_disk(u1, u2):
    """Polar disk sample (matches the aperture sampling in camera.cl:46-55)."""
    angle = TWO_PI * u1
    r = jnp.sqrt(u2)
    return jnp.stack([jnp.cos(angle) * r, jnp.sin(angle) * r], axis=-1)

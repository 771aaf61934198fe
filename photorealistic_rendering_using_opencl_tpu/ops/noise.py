"""Procedural value noise + fractal Brownian motion, batched.

Equivalent of ``kernels/noise/value_noise.cl:14-49`` (sin-hash value noise
with quintic smoothing and a 5-octave FBM).  The reference includes it in
the megakernel as a procedural-texture hook with no live caller; here it is
a first-class op usable as a material albedo modulator.
"""
from __future__ import annotations

import jax.numpy as jnp


def _hash3(p: jnp.ndarray) -> jnp.ndarray:
    """sin-based lattice hash -> [0,1); p[...,3] integer lattice coords."""
    h = jnp.sum(p * jnp.asarray([127.1, 311.7, 74.7], jnp.float32), axis=-1)
    return jnp.abs(jnp.sin(h) * 43758.5453123) % 1.0


def value_noise(p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear value noise in [0,1); p[...,3] sample positions."""
    pi = jnp.floor(p)
    pf = p - pi
    # quintic fade
    w = pf * pf * pf * (pf * (pf * 6.0 - 15.0) + 10.0)

    def corner(dx, dy, dz):
        off = jnp.asarray([dx, dy, dz], jnp.float32)
        return _hash3(pi + off)

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    x00 = c000 + wx * (c100 - c000)
    x10 = c010 + wx * (c110 - c010)
    x01 = c001 + wx * (c101 - c001)
    x11 = c011 + wx * (c111 - c011)
    y0 = x00 + wy * (x10 - x00)
    y1 = x01 + wy * (x11 - x01)
    return y0 + wz * (y1 - y0)


def value_fbm(p: jnp.ndarray, octaves: int = 5, lacunarity: float = 2.0,
              gain: float = 0.5) -> jnp.ndarray:
    """Fractal Brownian motion over value noise (value_noise.cl:31-48)."""
    amp = 1.0
    freq = 1.0
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    norm = 0.0
    for _ in range(octaves):
        total = total + amp * value_noise(p * freq)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm

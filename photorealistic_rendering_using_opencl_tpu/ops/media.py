"""Participating media: homogeneous + exponential (height-fog) distance
sampling with spectral-channel MIS, batched.

Re-design of ``kernels/media/homogeneous.cl`` and ``media/exponential.cl``.
The medium type is a static config choice; sigma_a/sigma_s/sigma_t are
differentiable scene arrays.  Channel selection uses the reference's
round(u*3) trick which picks channel 0/1/2 with probs 1/6, 1/3+1/3, 1/6
clamped -- we use the unbiased uniform-channel pick instead (pdf is the
channel average either way, homogeneous.cl:40-44).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from photorealistic_rendering_using_opencl_tpu.ops.math import avg3


class MediumSample(NamedTuple):
    t: jnp.ndarray  # [N] sampled distance (min(t_medium, t_surface))
    weight: jnp.ndarray  # [N,3] throughput multiplier (includes sigma_s /pdf)
    pdf: jnp.ndarray  # [N]
    exited: jnp.ndarray  # [N] bool -- True: reached the surface
    p: jnp.ndarray  # [N,3] scatter/exit point


def homogeneous_sample_distance(sigma_s, sigma_t, absorption_only: bool,
                                origin, direction, max_t, u_chan, u_dist
                                ) -> MediumSample:
    """HomogeneousMedium_sampleDistance (homogeneous.cl:11-51), batched.

    sigma_* are [3] scene arrays; origin/direction [N,3]; max_t [N].
    """
    if absorption_only:
        t = max_t
        weight = jnp.exp(-t[..., None] * sigma_t)
        pdf = jnp.ones_like(t)
        exited = jnp.ones_like(t, bool)
        p = origin + direction * t[..., None]
        return MediumSample(t, weight, pdf, exited, p)

    chan = jnp.clip((u_chan * 3.0).astype(jnp.int32), 0, 2)
    sigma_tc = jnp.maximum(sigma_t[chan], 1e-12)
    t_free = -jnp.log1p(-jnp.clip(u_dist, 0.0, 1.0 - 1e-7)) / sigma_tc
    t = jnp.minimum(t_free, max_t)
    exited = t_free >= max_t

    tau = t[..., None] * sigma_t
    weight = jnp.exp(-tau)
    pdf_exit = avg3(jnp.exp(-tau))
    pdf_scat = avg3(sigma_t * jnp.exp(-tau))
    pdf = jnp.where(exited, pdf_exit, pdf_scat)
    weight = jnp.where(exited[..., None], weight, weight * sigma_s)
    weight = weight / jnp.maximum(pdf, 1e-30)[..., None]
    p = origin + direction * t[..., None]
    return MediumSample(t, weight, pdf, exited, p)


def homogeneous_transmittance(sigma_t, dist):
    """exp(-sigma_t * d) -- the explicit shadow-ray attenuation the
    integrator applies to NEE contributions (base.cl:66-69, 124-128)."""
    return jnp.exp(-dist[..., None] * sigma_t)


# ---------------------------------------------------------------------------
# Exponential (height-fog) medium, density = exp(-scale*dot(p - p0, dir_f))
# (media/exponential.cl).  Falloff params are static config floats matching
# the reference's macros (_falloffScale=1, _falloffDirection=+y, _unitPoint=0).
# ---------------------------------------------------------------------------

_INF = 1e30


def _density_integral(x, dx, t_max):
    """Optical-depth integral of exp(-(x + dx*t)) over [0, t_max]."""
    safe_dx = jnp.where(jnp.abs(dx) < 1e-12, 1.0, dx)
    finite = (jnp.exp(-x) - jnp.exp(-safe_dx * t_max - x)) / safe_dx
    flat = jnp.exp(-x) * t_max
    return jnp.where(jnp.abs(dx) < 1e-12, flat, finite)


def _inverse_optical_depth(x, dx, sigma_t, log_xi):
    flat = -log_xi / jnp.maximum(sigma_t * jnp.exp(-x), 1e-30)
    denom = sigma_t + dx * jnp.exp(x) * log_xi
    safe_dx = jnp.where(jnp.abs(dx) < 1e-12, 1.0, dx)
    slope = jnp.where(denom <= 0.0, _INF,
                      jnp.log(jnp.maximum(sigma_t / jnp.maximum(denom, 1e-30), 1e-30))
                      / safe_dx)
    return jnp.where(jnp.abs(dx) < 1e-12, flat, slope)


def exponential_sample_distance(sigma_s, sigma_t, absorption_only: bool,
                                origin, direction, max_t, u_chan, u_dist,
                                falloff_scale: float = 1.0,
                                falloff_dir=(0.0, 1.0, 0.0),
                                unit_point=(0.0, 0.0, 0.0)) -> MediumSample:
    fdir = jnp.asarray(falloff_dir, jnp.float32)
    upt = jnp.asarray(unit_point, jnp.float32)
    x = falloff_scale * jnp.sum((origin - upt) * fdir, axis=-1)
    dx = falloff_scale * jnp.sum(direction * fdir, axis=-1)

    if absorption_only:
        t = max_t
        weight = jnp.exp(-sigma_t * _density_integral(x, dx, t)[..., None])
        pdf = jnp.ones_like(t)
        exited = jnp.ones_like(t, bool)
        return MediumSample(t, weight, pdf, exited,
                            origin + direction * t[..., None])

    chan = jnp.clip((u_chan * 3.0).astype(jnp.int32), 0, 2)
    sigma_tc = jnp.maximum(sigma_t[chan], 1e-12)
    log_xi = jnp.log(jnp.maximum(1.0 - u_dist, 1e-12))
    t_free = _inverse_optical_depth(x, dx, sigma_tc, log_xi)
    t = jnp.minimum(t_free, max_t)
    exited = t_free >= max_t

    trans = jnp.exp(-sigma_t * _density_integral(x, dx, t)[..., None])
    rho = jnp.exp(-(x + dx * t))
    pdf_exit = avg3(trans)
    pdf_scat = avg3(rho[..., None] * sigma_t * trans)
    pdf = jnp.where(exited, pdf_exit, pdf_scat)
    weight = jnp.where(exited[..., None], trans,
                       rho[..., None] * sigma_t * trans)
    # NOTE exponential.cl multiplies by rho*sigmaT (not sigma_s) on scatter,
    # and divides by the channel-average pdf; scattering albedo is applied by
    # the caller as sigma_s/sigma_t if desired.  We fold sigma_s here for a
    # consistent API with the homogeneous medium.
    weight = jnp.where(exited[..., None], weight,
                       weight * (sigma_s / jnp.maximum(sigma_t, 1e-30)))
    weight = weight / jnp.maximum(pdf, 1e-30)[..., None]
    return MediumSample(t, weight, pdf, exited,
                        origin + direction * t[..., None])


def exponential_transmittance(sigma_t, origin, direction, dist,
                              falloff_scale: float = 1.0,
                              falloff_dir=(0.0, 1.0, 0.0),
                              unit_point=(0.0, 0.0, 0.0)):
    fdir = jnp.asarray(falloff_dir, jnp.float32)
    upt = jnp.asarray(unit_point, jnp.float32)
    x = falloff_scale * jnp.sum((origin - upt) * fdir, axis=-1)
    dx = falloff_scale * jnp.sum(direction * fdir, axis=-1)
    return jnp.exp(-sigma_t * _density_integral(x, dx, dist)[..., None])


def equiangular_sample(origin, direction, t_max, light_pos, xi):
    """Equiangular distance sampling toward a point/sphere light.

    Port of ``sampleEquiAngular`` (kernels/media.cl:34-55) -- present but
    never called by the reference integrator; exposed here for volumetric
    NEE experiments.  Returns (dist [N], pdf [N]) with dist measured along
    the ray and the pdf in distance measure over [0, t_max].
    """
    delta = jnp.sum((light_pos - origin) * direction, axis=-1)
    closest = origin + delta[..., None] * direction
    dd = jnp.maximum(jnp.linalg.norm(light_pos - closest, axis=-1), 1e-6)
    theta_a = jnp.arctan2(0.0 - delta, dd)
    theta_b = jnp.arctan2(t_max - delta, dd)
    t = dd * jnp.tan(theta_a + (theta_b - theta_a) * xi)
    dist = delta + t
    pdf = dd / (jnp.maximum(theta_b - theta_a, 1e-9) * (dd * dd + t * t))
    return dist, pdf

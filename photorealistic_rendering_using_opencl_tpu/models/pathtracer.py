"""Renderer front-end: full-frame renders, progressive accumulation, AOVs.

The flagship "model".  Replaces the reference's per-frame host loop +
megakernel relaunch (``src/main.cpp:247-302``, ``kernels/main.cl:66-163``)
with two jitted entry points:

  * ``render``: scan over samples, each sample a full path trace
    (models/integrator.py), returning the converged HDR image.
  * ``progressive_step``: one sample for every pixel, accumulating into a
    persistent ``ProgressiveState`` -- exact parity with the reference's
    interactive accumulate/reset cycle (src/main.cpp:283-302), checkpoint-
    able as a pytree (SURVEY §5 checkpoint/resume).

Debug AOVs mirror the VIEW_* compile options of kernels/main.cl:4-13.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from photorealistic_rendering_using_opencl_tpu.models import integrator
from photorealistic_rendering_using_opencl_tpu.ops import camera_rays
from photorealistic_rendering_using_opencl_tpu.ops.intersect import intersect_scene
from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler
from photorealistic_rendering_using_opencl_tpu.scene.types import SceneConfig, SceneData


def pixel_grid(width: int, height: int):
    px = jnp.tile(jnp.arange(width, dtype=jnp.int32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.int32), width)
    return px, py


def camera_rays_for_sample(cam_pytree, width, height, px, py, pixel_idx,
                           sample_idx, seed, rng_scheme="pcg4d",
                           jitter=True):
    sampler = Sampler(pixel_idx, sample_idx, seed=seed, scheme=rng_scheme,
                      dim=0)  # camera owns dims [0, 8)
    jx, jy = sampler.next2d()
    a1, a2 = sampler.next2d()
    return camera_rays.generate_rays(cam_pytree, width, height, px, py,
                                     (jx, jy), (a1, a2), jitter=jitter)


def render_sample(cfg: SceneConfig, scene: SceneData, cam_pytree,
                  width: int, height: int, sample_idx, seed=0,
                  rng_scheme: str = "pcg4d", jitter: bool = True,
                  method: str = "scan"):
    """One sample per pixel -> (radiance [N,3], alpha [N])."""
    px, py = pixel_grid(width, height)
    pixel_idx = py.astype(jnp.uint32) * width + px.astype(jnp.uint32)
    sample_arr = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32),
                                  pixel_idx.shape)
    origin, direction = camera_rays_for_sample(
        cam_pytree, width, height, px, py, pixel_idx, sample_arr, seed,
        rng_scheme, jitter)
    return integrator.trace(cfg, scene, origin, direction, pixel_idx,
                            sample_arr, seed=seed, rng_scheme=rng_scheme,
                            method=method)


@functools.partial(jax.jit, static_argnames=("cfg", "width", "height", "spp",
                                             "rng_scheme", "jitter",
                                             "method"))
def render(cfg: SceneConfig, scene: SceneData, cam_pytree,
           width: int, height: int, spp: int, seed=0,
           rng_scheme: str = "pcg4d", jitter: bool = True,
           method: str = "scan"):
    """Full render -> (hdr [H,W,3], alpha [H,W]).

    method="scan" is reverse-mode differentiable; method="while" is the
    faster forward-only path (see integrator.trace).
    """

    def body(carry, sample_idx):
        acc, aac = carry
        rad, alpha = render_sample(cfg, scene, cam_pytree, width, height,
                                   sample_idx, seed, rng_scheme, jitter,
                                   method)
        return (acc + rad, aac + alpha), None

    n = width * height
    (acc, aac), _ = jax.lax.scan(
        body,
        (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.float32)),
        jnp.arange(spp, dtype=jnp.uint32))
    img = (acc / spp).reshape(height, width, 3)
    alpha = (aac / spp).reshape(height, width)
    return img, alpha


# ---------------------------------------------------------------------------
# Progressive (interactive-parity) API
# ---------------------------------------------------------------------------

class ProgressiveState(NamedTuple):
    acc: jnp.ndarray  # [H,W,3] radiance sum
    alpha: jnp.ndarray  # [H,W] alpha sum
    samples: jnp.ndarray  # [] uint32 accumulated sample count
    seed: jnp.ndarray  # [] uint32


def progressive_init(width: int, height: int, seed: int = 0
                     ) -> ProgressiveState:
    return ProgressiveState(
        acc=jnp.zeros((height, width, 3), jnp.float32),
        alpha=jnp.zeros((height, width), jnp.float32),
        samples=jnp.zeros((), jnp.uint32),
        seed=jnp.asarray(seed, jnp.uint32),
    )


def progressive_reset(state: ProgressiveState) -> ProgressiveState:
    """Camera-moved reset (src/main.cpp:283-290 buffer_reset)."""
    return ProgressiveState(
        acc=jnp.zeros_like(state.acc), alpha=jnp.zeros_like(state.alpha),
        samples=jnp.zeros_like(state.samples), seed=state.seed)


@functools.partial(jax.jit, static_argnames=("cfg", "rng_scheme"))
def progressive_step(cfg: SceneConfig, scene: SceneData, cam_pytree,
                     state: ProgressiveState, rng_scheme: str = "pcg4d"
                     ) -> ProgressiveState:
    height, width = state.acc.shape[0], state.acc.shape[1]
    # interactive accumulation never differentiates: take the early-exit path
    rad, alpha = render_sample(cfg, scene, cam_pytree, width, height,
                               state.samples, state.seed, rng_scheme,
                               method="while")
    return ProgressiveState(
        acc=state.acc + rad.reshape(height, width, 3),
        alpha=state.alpha + alpha.reshape(height, width),
        samples=state.samples + 1,
        seed=state.seed,
    )


def progressive_image(state: ProgressiveState):
    s = jnp.maximum(state.samples.astype(jnp.float32), 1.0)
    return state.acc / s, state.alpha / s


# ---------------------------------------------------------------------------
# Debug AOVs (kernels/main.cl VIEW_NORMAL / VIEW_ALBEDO / VIEW_BVH_HIT)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "width", "height", "mode"))
def render_aov(cfg: SceneConfig, scene: SceneData, cam_pytree,
               width: int, height: int, mode: str = "normal", seed=0):
    """mode in {normal, albedo, depth, mesh_id}."""
    px, py = pixel_grid(width, height)
    pixel_idx = py.astype(jnp.uint32) * width + px.astype(jnp.uint32)
    sample_arr = jnp.zeros_like(pixel_idx)
    origin, direction = camera_rays_for_sample(
        cam_pytree, width, height, px, py, pixel_idx, sample_arr, seed,
        jitter=False)
    hit = intersect_scene(cfg, scene, origin, direction)
    if mode == "normal":
        out = hit.normal * 0.5 + 0.5
    elif mode == "albedo":
        mat = integrator.gather_material(cfg, scene, hit.mesh_id)
        out = mat.color
    elif mode == "depth":
        out = jnp.broadcast_to(hit.t[..., None], hit.normal.shape)
    elif mode == "mesh_id":
        out = jnp.broadcast_to(
            (hit.mesh_id[..., None].astype(jnp.float32) + 1.0)
            / (cfg.n_objects + 2), hit.normal.shape)
    else:
        raise ValueError(mode)
    out = jnp.where(hit.valid[..., None], out, 0.0)
    return out.reshape(height, width, 3)

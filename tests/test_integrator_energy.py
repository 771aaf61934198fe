"""Integrator-level energy conservation: the white furnace.

A unit-albedo Lambertian sphere inside a uniform unit environment must
render to exactly 1 everywhere in expectation (convex body: every bounce
escapes, so no budget truncation bias).  This validates the whole chain:
camera rays, intersection, BSDF sampling weights, env NEE + MIS, RR, and
accumulation -- any double counting or lost 1/pdf factor breaks it.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.models import pathtracer
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.scene.loader import build_scene

DOC = {
    "settings": {"MAX_BOUNCES": 6, "MAX_DIFF_BOUNCES": 6,
                 "MAX_SPEC_BOUNCES": 6, "MAX_TRANS_BOUNCES": 6},
    "scene": {"spheres": [
        {"pos": [0.0, 0.0, 0.0], "radius": 1.0,
         "material": {"color": [1.0, 1.0, 1.0], "type": 1}}]},
}


def _furnace(cfg, scene, spp=96):
    cam = default_camera(24, 24).pytree()
    img, _ = pathtracer.render(cfg, scene, cam, 24, 24, spp, seed=3)
    return np.asarray(img)


def test_white_furnace_with_env_nee():
    env = np.ones((8, 16, 3), np.float32)
    cfg, scene = build_scene(DOC, env_map=env)
    assert cfg.env_nee
    img = _furnace(cfg, scene)
    assert abs(img.mean() - 1.0) < 0.02, img.mean()
    # per-pixel: tight thanks to NEE
    assert np.abs(img - 1.0).max() < 0.2


def test_white_furnace_bsdf_only():
    env = np.ones((8, 16, 3), np.float32)
    cfg, scene = build_scene(DOC, env_map=env)
    cfg = dataclasses.replace(cfg, enable_env_sampling=False)
    img = _furnace(cfg, scene)
    assert abs(img.mean() - 1.0) < 0.02, img.mean()

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


def test_pick_random_light_unbiased():
    """With >1 light, the random-pick strategy (pdf/n compensation,
    base.cl:9 PICK_RANDOM_LIGHT semantics with the missing 1/N fixed) and
    the first-light-only strategy are both unbiased: converged means must
    agree within MC noise."""
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    cfg, scene = load_scene("scenes/multilight.json")
    assert cfg.n_lights == 2
    cam = default_camera(20, 20).pytree()
    spp = 512
    pick = dataclasses.replace(cfg, pick_random_light=True)
    a = np.asarray(pathtracer.render(cfg, scene, cam, 20, 20, spp, seed=5,
                                     method="regen")[0])
    b = np.asarray(pathtracer.render(pick, scene, cam, 20, 20, spp, seed=9,
                                     method="regen")[0])
    rel = abs(a.mean() - b.mean()) / a.mean()
    assert rel < 0.03, (a.mean(), b.mean())


def test_alpha_testing_channel():
    """-alpha mode: background pixels transparent, foreground opaque
    (header.cl:39 ALPHA_TESTING; coverage = primary-ray hit, documented
    deviation from the reference's per-bounce alpha bookkeeping)."""
    doc = {
        "settings": {"MAX_BOUNCES": 4, "MAX_DIFF_BOUNCES": 4,
                     "MAX_SPEC_BOUNCES": 4, "MAX_TRANS_BOUNCES": 4},
        "scene": {"spheres": [
            {"pos": [0.0, 2.5, 0.0], "radius": 0.5,
             "material": {"color": [20.0, 20.0, 20.0], "type": 0}},
            {"pos": [0.0, 0.0, 0.0], "radius": 0.9,
             "material": {"color": [0.7, 0.7, 0.7]}}]},
    }
    cfg, scene = build_scene(doc, alpha_testing=True)
    cam = default_camera(24, 24).pytree()
    img, alpha = pathtracer.render(cfg, scene, cam, 24, 24, 16, seed=2,
                                   method="regen")
    alpha = np.asarray(alpha)
    assert alpha.min() < 0.05   # sky pixels transparent
    assert alpha.max() > 0.95   # sphere pixels opaque (even though most
    #                             secondary bounces escape to the sky)

"""Bidirectional path tracer: unbiasedness vs the unidirectional tracer.

Both integrate the same path space (surface paths with <= max_bounces
non-light vertices ending on an emitter), so converged means must agree.
The reference ships an empty bidirectional.cl; these tests pin OUR
implementation (models/bidirectional.py).
"""
from __future__ import annotations

import numpy as np

from photorealistic_rendering_using_opencl_tpu.models import pathtracer
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def _render(scene_path, w, spp, seed, method):
    cfg, scene = load_scene(scene_path)
    cam = default_camera(w, w).pytree()
    img, _ = pathtracer.render(cfg, scene, cam, w, w, spp, seed=seed,
                               method=method)
    return np.asarray(img)


def test_bdpt_matches_pt_cornell():
    w = 10
    pt = _render("scenes/cornell_simple.json", w, 512, 3, "regen")
    bd = _render("scenes/cornell_simple.json", w, 512, 7, "bdpt")
    rel = abs(pt.mean() - bd.mean()) / pt.mean()
    assert rel < 0.03, (pt.mean(), bd.mean())
    # localized MIS-weight bugs show up per-pixel long before the mean
    assert np.abs(pt - bd).max() < 0.12


def test_bdpt_matches_pt_multilight():
    """Two lights: only light[0] is NEE/light-subpath sampled; paths to
    the other light must come through the s=0 strategy at full weight."""
    w = 8
    pt = _render("scenes/multilight.json", w, 1024, 3, "regen")
    bd = _render("scenes/multilight.json", w, 1024, 7, "bdpt")
    rel = abs(pt.mean() - bd.mean()) / pt.mean()
    assert rel < 0.06, (pt.mean(), bd.mean())  # noise-bound scene


def test_bdpt_nonnegative_and_finite():
    bd = _render("scenes/cornell_simple.json", 8, 16, 1, "bdpt")
    assert np.isfinite(bd).all()
    assert (bd >= 0.0).all()

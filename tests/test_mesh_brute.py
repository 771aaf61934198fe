"""MXU brute-force mesh intersection (ops/mesh_brute.py) vs the BVH walk.

The two backends implement the same closest-hit semantics
(kernels/geometry/triangle.cl:4-43 + bvh.cl:132-206 in the reference);
exhaustive testing must agree with the traversal on every ray, and the
Pallas kernel must agree with the XLA reference path exactly.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photorealistic_rendering_using_opencl_tpu.ops import mesh_brute
from photorealistic_rendering_using_opencl_tpu.ops.intersect import bvh_traverse
from photorealistic_rendering_using_opencl_tpu.ops.math import RAY_INF
from photorealistic_rendering_using_opencl_tpu.scene import bvh_build
from photorealistic_rendering_using_opencl_tpu.scene.obj import make_icosphere
from photorealistic_rendering_using_opencl_tpu.scene.types import empty_scene_data


@pytest.fixture(scope="module")
def mesh_setup():
    tv, tn = make_icosphere(subdiv=3, radius=0.8, center=(0.1, -0.2, 0.3))
    tv, tn = np.asarray(tv), np.asarray(tn)
    bvh = bvh_build.build_bvh(tv)
    packed = bvh_build.pack_for_device(bvh, tv, tn)
    scene = empty_scene_data(n_objects=1, n_tris=packed[2].shape[0],
                             n_nodes=bvh.miss.shape[0])
    scene.tri_verts = jnp.asarray(packed[2])
    scene.tri_normals = jnp.asarray(packed[3])
    scene.bvh_nodes = jnp.asarray(packed[0])
    scene.leaf_verts = jnp.asarray(packed[1])
    scene.bvh_links = jnp.asarray(packed[4])
    bp = mesh_brute.pack_brute(tv[bvh.order], tn[bvh.order])
    return scene, bp


def _rays(rng, n):
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_brute_matches_bvh(mesh_setup, rng):
    scene, bp = mesh_setup
    o, d = _rays(rng, 2048)
    tinit = jnp.full((2048,), RAY_INF)
    t_b, tri_b, _, _ = bvh_traverse(scene, o, d, tinit)
    t_n, tri_n = mesh_brute.mesh_intersect(
        jnp.asarray(bp.feat), jnp.asarray(bp.clusters), o, d, tinit)
    t_b, tri_b = np.asarray(t_b), np.asarray(tri_b)
    t_n, tri_n = np.asarray(t_n), np.asarray(tri_n)
    assert ((tri_b >= 0) == (tri_n >= 0)).all()
    both = tri_b >= 0
    np.testing.assert_allclose(t_b[both], t_n[both], atol=5e-5)
    # winning triangle is the same geometric triangle (indices live in
    # different orders, so compare sorted vertex tuples)
    vb = np.sort(np.asarray(scene.tri_verts)[tri_b[both]].reshape(-1, 9), 1)
    vn = np.sort(bp.tri_verts[tri_n[both]].reshape(-1, 9), 1)
    np.testing.assert_allclose(vb, vn, atol=1e-6)


def test_pallas_kernel_matches_xla(mesh_setup, rng):
    scene, bp = mesh_setup
    o, d = _rays(rng, 600)  # non-multiple of BLOCK exercises padding
    tinit = jnp.full((600,), RAY_INF)
    feat, cl = jnp.asarray(bp.feat), jnp.asarray(bp.clusters)
    t_x, tri_x = mesh_brute._intersect_xla(feat, cl, o, d, tinit, None)
    t_p, tri_p = mesh_brute._intersect_pallas(feat, cl, o, d, tinit, None,
                                              interpret=True)
    assert (np.asarray(tri_p) == np.asarray(tri_x)).all()
    # the kernel's bf16x3 hi/lo matmul carries ~16 mantissa bits; its t is
    # advisory (callers re-derive exact f32 t from the index via
    # tri_reattach), so near-equality is the contract
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), rtol=1e-3,
                               atol=1e-5)


def test_any_hit_matches_closest_occlusion(mesh_setup, rng):
    scene, bp = mesh_setup
    o, d = _rays(rng, 512)
    feat, cl = jnp.asarray(bp.feat), jnp.asarray(bp.clusters)
    tinit = jnp.full((512,), 2.0)
    t_c, tri_c = mesh_brute._intersect_pallas(feat, cl, o, d, tinit, None,
                                              interpret=True)
    t_a, tri_a = mesh_brute._intersect_pallas(feat, cl, o, d, tinit, None,
                                              any_hit=True, interpret=True)
    # occlusion agrees with the closest-hit test and t degrades to t_init
    assert ((np.asarray(tri_a) >= 0) == (np.asarray(tri_c) >= 0)).all()
    np.testing.assert_array_equal(np.asarray(t_a), np.full(512, 2.0))


def test_active_mask_and_t_init(mesh_setup, rng):
    scene, bp = mesh_setup
    o, d = _rays(rng, 512)
    feat, cl = jnp.asarray(bp.feat), jnp.asarray(bp.clusters)
    tinit = jnp.full((512,), RAY_INF)
    t0, tri0 = mesh_brute.mesh_intersect(feat, cl, o, d, tinit)
    # inactive lanes return (t_init, -1) regardless of geometry
    act = jnp.asarray(rng.uniform(size=512) < 0.5)
    t1, tri1 = mesh_brute.mesh_intersect(feat, cl, o, d, tinit, active=act)
    act_np = np.asarray(act)
    assert (np.asarray(tri1)[~act_np] == -1).all()
    assert (np.asarray(t1)[~act_np] == RAY_INF).all()
    assert (np.asarray(tri1)[act_np] == np.asarray(tri0)[act_np]).all()
    # a tight t_init suppresses hits beyond it
    tcap = jnp.full((512,), 0.5)
    t2, tri2 = mesh_brute.mesh_intersect(feat, cl, o, d, tcap)
    got = np.asarray(tri2) >= 0
    assert (np.asarray(t2)[got] < 0.5).all()
    assert (np.asarray(t2)[~got] == 0.5).all()


def test_render_backends_identical(rng):
    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    mesh = make_icosphere(subdiv=1, radius=0.6, center=(0.0, -1.0, 0.0))
    cfg, scene = load_scene("scenes/cornell.json", mesh_override=mesh)
    assert cfg.mesh_accel == "brute"
    cam = default_camera(32, 32).pytree()
    img_b, _ = pathtracer.render(cfg, scene, cam, 32, 32, 1, seed=3)
    cfg_v = dataclasses.replace(cfg, mesh_accel="bvh")
    img_v, _ = pathtracer.render(cfg_v, scene, cam, 32, 32, 1, seed=3)
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_v))


def test_streamed_chunked_kernel_matches_xla(mesh_setup, rng, monkeypatch):
    """HBM-streamed mode (meshes past the VMEM-resident cap): force the
    chunked 2-D-grid path at test scale by shrinking the caps, and pin it
    against the exact XLA reference -- winners, any-hit occlusion,
    padding lanes, and mixed batches all covered."""
    scene, bp = mesh_setup
    monkeypatch.setattr(mesh_brute, "BRUTE_MAX_TRIS", mesh_brute.TILE)
    monkeypatch.setattr(mesh_brute, "CHUNK_TRIS", mesh_brute.TILE)
    feat, cl = jnp.asarray(bp.feat), jnp.asarray(bp.clusters)
    assert feat.shape[1] // 4 > mesh_brute.BRUTE_MAX_TRIS  # streams

    n = 600  # non-multiple of BLOCK exercises ray padding
    o, d = _rays(rng, n)
    tinit = jnp.asarray(rng.uniform(0.1, 8.0, n).astype(np.float32))
    anyh = jnp.asarray(rng.random(n) < 0.5)
    act = jnp.asarray(rng.random(n) < 0.9)
    t_x, tri_x = mesh_brute._intersect_xla(feat, cl, o, d, tinit, act)
    t_p, tri_p = mesh_brute._intersect_pallas(feat, cl, o, d, tinit, act,
                                              any_hit=anyh, interpret=True)
    anyh_np, act_np = np.asarray(anyh), np.asarray(act)
    cl_m = act_np & ~anyh_np
    sh_m = act_np & anyh_np
    assert (np.asarray(tri_p)[cl_m] == np.asarray(tri_x)[cl_m]).all()
    assert ((np.asarray(tri_p)[sh_m] >= 0)
            == (np.asarray(tri_x)[sh_m] >= 0)).all()
    assert (np.asarray(tri_p)[~act_np] == -1).all()
    np.testing.assert_allclose(np.asarray(t_p)[cl_m],
                               np.asarray(t_x)[cl_m], rtol=1e-3, atol=1e-5)


def test_ray_sorting_is_result_invariant(mesh_setup, rng, monkeypatch):
    """mesh_sort_rays permutes lanes before the dispatch and unpermutes
    the results; tile relevance is conservative per lane, so the hit must
    be BITWISE identical with sorting on or off (here through the XLA
    backend with the pallas gate forced open so the sort wrapper runs)."""
    import dataclasses

    from photorealistic_rendering_using_opencl_tpu.ops import intersect
    from photorealistic_rendering_using_opencl_tpu.scene.loader import (
        build_scene,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.obj import (
        make_icosphere,
    )

    monkeypatch.setattr(mesh_brute, "uses_pallas", lambda: True)
    doc = {"settings": {"MAX_BOUNCES": 2},
           "scene": {"spheres": [
               {"pos": [0.0, 3.0, 0.0], "radius": 0.5,
                "material": {"color": [5.0, 5.0, 5.0], "type": 0}}]}}
    mesh = make_icosphere(subdiv=2, radius=0.9, center=(0.0, 0.5, 0.0))
    cfg, scene = build_scene(doc, mesh_override=mesh)
    cfg = dataclasses.replace(cfg, mesh_accel="brute")

    n = 700
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    h0 = intersect.intersect_scene(cfg, scene, o, d)
    cfg_s = dataclasses.replace(cfg, mesh_sort_rays=True)
    h1 = intersect.intersect_scene(cfg_s, scene, o, d)
    np.testing.assert_array_equal(np.asarray(h0.tri), np.asarray(h1.tri))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    np.testing.assert_array_equal(np.asarray(h0.mesh_id),
                                  np.asarray(h1.mesh_id))

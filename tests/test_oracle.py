"""Forward-radiance parity vs an independent port of the REFERENCE integrator.

tests/oracle.py implements the reference's estimator (pathtracing.cl:4-120,
base.cl:31-192) in plain numpy with no imports from the package; these tests
assert converged-mean agreement, so they fail if the JAX renderer drifts from
*reference* semantics rather than from its own pinned past (the golden tests'
job).  Tolerances are calibrated to the Monte-Carlo noise floor of the sample
counts used (~4-7 sigma).
"""
from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402

SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                     "cornell_simple.json")


def _repo_render(width, height, spp, seed, **cfg_overrides):
    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    cfg, scene = load_scene(SCENE)
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    cam = default_camera(width, height).pytree()
    img, _ = pathtracer.render(cfg, scene, cam, width, height, spp, seed=seed)
    return np.asarray(img)


def test_forward_radiance_matches_reference_port():
    """NEE+MIS path (the live estimator) vs the oracle, converged means."""
    w = 8
    spp = 2048
    ref = oracle.render(SCENE, w, w, spp, seed=11)
    img = _repo_render(w, w, spp, seed=23)

    # image mean: ~6x the MC sigma of the mean at this sample count
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.015, f"image-mean drift vs reference port: {rel:.4f}"

    # per-pixel: generous bound, catches localized estimator bugs (wrong
    # MIS weight on a wall, flipped normal on one primitive, ...)
    assert np.abs(img - ref).max() < 0.08, (
        f"per-pixel drift {np.abs(img - ref).max():.4f}")


def test_forward_radiance_matches_reference_port_no_nee():
    """Pure BSDF transport (light sampling off): validates the emission
    gating (pathtracing.cl:76-84) and throughput bookkeeping without the
    NEE/MIS machinery in the loop."""
    w = 6
    ref = oracle.render(SCENE, w, w, 6144, seed=3, light_sampling=False)
    img = _repo_render(w, w, 6144, seed=7, enable_light_sampling=False)
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.04, f"no-NEE image-mean drift: {rel:.4f}"


def test_final_vertex_mis_term_is_subnoise():
    """The reference collects the bsdfSample light contribution at budget-
    terminated vertices (handleSurface runs before the budget check); the
    JAX renderer's carried single-intersect scheme drops that term.  Pin
    that the term stays below the comparison noise floor on the parity
    config so the deviation remains immaterial (documented in
    models/integrator.py)."""
    w = 6
    spp = 4096
    full = oracle.render(SCENE, w, w, spp, seed=1)
    nofin = oracle.render(SCENE, w, w, spp, seed=2, final_vertex_mis=False)
    rel = abs(full.mean() - nofin.mean()) / full.mean()
    assert rel < 0.01, f"final-vertex MIS term unexpectedly large: {rel:.4f}"


GGX_SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                         "oracle_ggx.json")
DIEL_SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                          "oracle_diel.json")


def _repo_render_scene(scene_path, width, spp, seed):
    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    cfg, scene = load_scene(scene_path)
    cam = default_camera(width, width).pytree()
    img, _ = pathtracer.render(cfg, scene, cam, width, width, spp, seed=seed)
    return np.asarray(img)


def test_ggx_rough_conductor_matches_reference_port():
    """GGX microfacet conductor (RoughConductor.cl:4-62 semantics: sample
    weight wiDotM*G*D/(wi.z*mPdf), eval F*G*D/(4 wi.z), pdf mPdf/(4 wiDotM),
    exact conductor Fresnel) vs the oracle, converged means.  Planted-error
    sensitivity (measured): swapping the MIS power-heuristic arguments
    shifts the mean 99%; dropping NEE MIS entirely 0.4%; true drift at
    this sample count is ~0.02%."""
    w = 8
    spp = 1024
    ref = oracle.render(GGX_SCENE, w, w, spp, seed=11)
    img = _repo_render_scene(GGX_SCENE, w, spp, seed=23)
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.01, f"GGX image-mean drift vs reference port: {rel:.4f}"
    assert np.abs(img - ref).max() < 0.08, (
        f"GGX per-pixel drift {np.abs(img - ref).max():.4f}")


MEDIA_SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                           "oracle_media.json")


def test_homogeneous_medium_matches_reference_port():
    """Homogeneous global medium (homogeneous.cl:11-51: spectral-channel
    distance sampling, exited-weight exp(-tau)/avg(exp(-tau)) bookkeeping,
    sigma_s scatter weight) + volumetric NEE / phase MIS (base.cl:194-260)
    vs the oracle, converged means.  Planted-error sensitivity (measured at
    512 spp): skipping the exited-path pdf division shifts the mean 47%,
    dropping the sigma_s scatter factor breaks it entirely (1e5x), and
    dropping the volumetric-NEE shadow transmittance shifts 4.7%; true
    drift at this sample count is ~0.1%."""
    w = 8
    spp = 1024
    ref = oracle.render(MEDIA_SCENE, w, w, spp, seed=11)
    img = _repo_render_scene(MEDIA_SCENE, w, spp, seed=23)
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.015, f"media image-mean drift vs reference port: {rel:.4f}"
    assert np.abs(img - ref).max() < 0.08, (
        f"media per-pixel drift {np.abs(img - ref).max():.4f}")


def test_homogeneous_medium_spectral_channels_match_reference_port():
    """Per-channel sigmas make the spectral-channel selection and the
    channel-average pdfs (homogeneous.cl:26-44) actually load-bearing: a
    wrong channel-average or a per-channel mixup shifts individual channel
    means far beyond noise (sigma_t varies 2x across channels here).
    Measured true drift ~0.9% at this sample count (seed noise ~0.5%)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    w = 8
    spp = 1024
    sa = np.array([0.02, 0.03, 0.05])
    ss = np.array([0.10, 0.07, 0.04])
    ref = oracle.render(MEDIA_SCENE, w, w, spp, seed=11, sigma_a=sa,
                        sigma_s=ss)
    cfg, scene = load_scene(MEDIA_SCENE)
    scene = dc.replace(
        scene,
        medium_sigma_a=jnp.asarray(sa, jnp.float32),
        medium_sigma_s=jnp.asarray(ss, jnp.float32),
        medium_sigma_t=jnp.asarray(sa + ss, jnp.float32))
    cam = default_camera(w, w).pytree()
    img = np.asarray(pathtracer.render(cfg, scene, cam, w, w, spp, seed=23)[0])
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.025, f"spectral media mean drift: {rel:.4f}"
    for c in range(3):
        rc = abs(img[..., c].mean() - ref[..., c].mean()) / ref[..., c].mean()
        assert rc < 0.04, f"channel {c} drift: {rc:.4f}"


def test_smooth_dielectric_matches_reference_port():
    """Smooth dielectric (Dielectric.cl:4-87 semantics: Fresnel-weighted
    reflect/refract with weight == choice probability, eta^2 non-adjoint
    scaling from bxdf.cl:105-143, no NEE on specular lobes, full-weight
    light hits through the wasSpecular gate) vs the oracle, converged
    means.  The scene places a light INSIDE the glass sphere so odd
    refraction counts leave the eta^2 factor uncancelled: planted-error
    sensitivity (measured): dropping eta^2 shifts the mean 2.0%, flipping
    the refraction z sign 2.2%, inverting the eta selection 2.2%; true
    drift at this sample count is ~0.2%."""
    w = 8
    spp = 1024
    ref = oracle.render(DIEL_SCENE, w, w, spp, seed=11)
    img = _repo_render_scene(DIEL_SCENE, w, spp, seed=23)
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.012, (
        f"dielectric image-mean drift vs reference port: {rel:.4f}")
    assert np.abs(img - ref).max() < 0.15, (
        f"dielectric per-pixel drift {np.abs(img - ref).max():.4f}")


def test_medium_times_mesh_matches_reference_port():
    """Global medium WRAPPING a triangle mesh (VERDICT r4 next #9): pins
    the interaction terms no single-family row covers -- transmittance
    across mesh shadow segments (base.cl:124-128 with the BVH in the
    shadow query), mesh occlusion of volumetric NEE, and the
    scattered-lane self-exclusion exemption (a lane that scatters in the
    medium continues from INSIDE the volume where its previous triangle
    is legitimately hittable again).  The mesh is shared DATA; the
    oracle's triangle intersector/shading is an independent numpy port.

    Planted-error sensitivity (measured at 8x8 x 768 spp, seed 11/23):
    surface-NEE shadow rays ignoring the mesh shifts the mean +20.5%,
    dropping the medium transmittance on surface-NEE segments +22.7%;
    true drift at this sample count is 0.91% (bound 2%).
    """
    import dataclasses as dc
    import json as _json

    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import build_scene
    from photorealistic_rendering_using_opencl_tpu.scene.obj import make_icosphere

    w = 8
    spp = 768
    mesh_mat = {"color": [0.75, 0.75, 0.75], "type": 1}
    mesh = make_icosphere(subdiv=1, radius=0.9, center=(0.0, 1.2, 0.0))

    ref = oracle.render(MEDIA_SCENE, w, w, spp, seed=11,
                        mesh_verts=mesh[0], mesh_normals=mesh[1],
                        mesh_mat=mesh_mat)

    doc = _json.load(open(MEDIA_SCENE))
    doc["scene"]["obj"] = {"material": mesh_mat}
    cfg, scene = build_scene(doc, mesh_override=mesh)
    assert cfg.has_mesh and cfg.has_global_medium
    cam = default_camera(w, w).pytree()
    img = np.asarray(pathtracer.render(cfg, scene, cam, w, w, spp,
                                       seed=23)[0])

    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.02, f"medium x mesh mean drift: {rel:.4f}"
    assert np.abs(img - ref).max() < 0.08, (
        f"medium x mesh per-pixel drift {np.abs(img - ref).max():.4f}")

"""BSDF correctness: sample<->pdf consistency, energy (furnace), reciprocity
of the estimator weight (weight == eval/pdf for sampled directions).

These are the tests the reference never had (SURVEY §4): they catch exactly
the class of bug the reference ships (LambertBSDF_pdf missing return).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from photorealistic_rendering_using_opencl_tpu.ops import bsdf, sampling
from photorealistic_rendering_using_opencl_tpu.scene.types import (
    BECKMANN, BURLEY, COAT, COND, DIEL, DIFF, GGX, PHONG, ROUGH_COND,
    ROUGH_DIEL, SceneConfig, default_lobes_for_type,
)

N = 50_000


def _mat(t, n=N, roughness=0.3, dist=GGX, color=(1.0, 1.0, 1.0),
         eta=(0.17229, 0.36901, 1.5478), k=(4.2223, 2.4628, 1.8063)):
    if t & (DIEL | ROUGH_DIEL):
        eta = (1.5, 1.5, 1.5)
    return bsdf.MatProps(
        color=jnp.broadcast_to(jnp.asarray(color, jnp.float32), (n, 3)),
        eta=jnp.broadcast_to(jnp.asarray(eta, jnp.float32), (n, 3)),
        k=jnp.broadcast_to(jnp.asarray(k, jnp.float32), (n, 3)),
        roughness=jnp.full((n,), roughness, jnp.float32),
        mat_type=jnp.full((n,), t, jnp.int32),
        lobes=jnp.full((n,), default_lobes_for_type(t), jnp.int32),
        dist=jnp.full((n,), dist, jnp.int32),
    )


def _cfg(t):
    return SceneConfig(active_mats=t)


def _wi(n=N, z=0.6):
    s = np.sqrt(1.0 - z * z)
    return jnp.broadcast_to(
        jnp.asarray([s * 0.8, s * 0.6, z], jnp.float32), (n, 3))


def _u(rng, n=N):
    return (jnp.asarray(rng.random(n, dtype=np.float32)),
            jnp.asarray(rng.random(n, dtype=np.float32)),
            jnp.asarray(rng.random(n, dtype=np.float32)))


def _zero(n=N):
    return jnp.zeros((n,), jnp.float32), jnp.zeros((n,), bool)


@pytest.mark.parametrize("t,rough,dist", [
    (DIFF, 0.0, BECKMANN),
    (BURLEY, 0.3, BECKMANN),
    (ROUGH_COND, 0.4, GGX),
    (ROUGH_COND, 0.4, BECKMANN),
    (ROUGH_COND, 0.5, PHONG),
    (COAT, 0.4, GGX),
])
def test_sample_weight_equals_eval_over_pdf(rng, t, rough, dist):
    """For sampled (non-Dirac) directions: weight ~= eval(wi,wo)/pdf(wi,wo)."""
    cfg = _cfg(t)
    mat = _mat(t, roughness=rough, dist=dist)
    wi = _wi()
    u0, u1, u2 = _u(rng)
    rt, bs = _zero()
    samp = bsdf.sample(cfg, mat, wi, bs, rt, u0, u1, u2)
    f = bsdf.evaluate(cfg, mat, wi, samp.wo)
    p = bsdf.pdf(cfg, mat, wi, samp.wo)
    valid = np.asarray(samp.valid) & (np.asarray(p) > 1e-4)
    # Dirac sub-lobes (coat spec) get pdf checks skipped via lobe mask
    from photorealistic_rendering_using_opencl_tpu.scene.types import SPECULAR_LOBE
    valid &= (np.asarray(samp.lobe) & SPECULAR_LOBE) == 0
    pn = np.asarray(p)
    w_est = np.asarray(f) / np.where(pn > 0, pn, 1.0)[..., None]
    w = np.asarray(samp.weight)
    err = np.abs(w_est[valid] - w[valid]) / (np.abs(w[valid]) + 0.05)
    frac_bad = (err.max(axis=-1) > 0.05).mean()
    assert frac_bad < 0.01, (t, rough, dist, frac_bad)


@pytest.mark.parametrize("t,rough,dist", [
    (DIFF, 0.0, BECKMANN),
    (ROUGH_COND, 0.4, GGX),
    (ROUGH_COND, 0.4, BECKMANN),
    (ROUGH_DIEL, 0.4, GGX),
    (COAT, 0.4, GGX),
])
def test_pdf_normalized(rng, t, rough, dist):
    """pdf integrates to <= 1 over the (hemi)sphere, ~1 for reflective lobes.

    Estimated with uniform sphere MC; Dirac components are excluded so
    dielectric/coat integrate to (1 - dirac probability mass) < 1.
    """
    cfg = _cfg(t)
    n = N
    mat = _mat(t, n=n, roughness=rough, dist=dist)
    wi = _wi(n)
    u1 = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random(n, dtype=np.float32))
    wo = sampling.uniform_sphere(u1, u2)
    p = np.asarray(bsdf.pdf(cfg, mat, wi, wo))
    est = (p * 4.0 * np.pi).mean()
    if t == DIFF:
        assert abs(est - 1.0) < 0.08, (t, est)
    else:
        # microfacet pdfs integrate to <1 over the visible hemisphere: the
        # below-horizon reflection mass is discarded at sampling (standard
        # Tungsten/reference behavior, not renormalized).
        assert est < 1.1, (t, est)
        assert est > 0.1, (t, est)


def test_lambert_furnace(rng):
    """White albedo Lambert: E[weight] == 1 exactly (energy conserving)."""
    cfg = _cfg(DIFF)
    mat = _mat(DIFF)
    wi = _wi()
    u0, u1, u2 = _u(rng)
    rt, bs = _zero()
    samp = bsdf.sample(cfg, mat, wi, bs, rt, u0, u1, u2)
    w = np.asarray(samp.weight)
    assert np.allclose(w, 1.0, atol=1e-5)


def test_smooth_conductor_mirror(rng):
    cfg = _cfg(COND)
    mat = _mat(COND, n=8)
    wi = _wi(8)
    u0, u1, u2 = _u(rng, 8)
    rt, bs = _zero(8)
    samp = bsdf.sample(cfg, mat, wi, bs, rt, u0, u1, u2)
    wo = np.asarray(samp.wo)
    wi_n = np.asarray(wi)
    assert np.allclose(wo[:, :2], -wi_n[:, :2], atol=1e-6)
    assert np.allclose(wo[:, 2], wi_n[:, 2], atol=1e-6)
    # gold Fresnel at 53deg: reflectance in (0,1), R_red > R_blue for gold
    w = np.asarray(samp.weight)
    assert (w > 0).all() and (w < 1).all()
    assert (w[:, 0] > w[:, 2]).all()


def test_dielectric_snell_and_energy(rng):
    cfg = _cfg(DIEL)
    n = 4096
    mat = _mat(DIEL, n=n)
    wi = _wi(n, z=0.8)
    u0, u1, u2 = _u(rng, n)
    rt, bs = _zero(n)
    samp = bsdf.sample(cfg, mat, wi, bs, rt, u0, u1, u2)
    wo = np.asarray(samp.wo)
    refracted = wo[:, 2] < 0
    # Snell: sin_t = sin_i / 1.5
    sin_i = np.sqrt(1 - 0.8 ** 2)
    sin_t = np.linalg.norm(wo[refracted][:, :2], axis=1)
    assert np.allclose(sin_t, sin_i / 1.5, atol=1e-5)
    # refracted directions are unit
    assert np.allclose(np.linalg.norm(wo, axis=1), 1.0, atol=1e-5)
    # weight = eta^2 * color for transmission (radiance scaling), 1 for reflect
    w = np.asarray(samp.weight)
    assert np.allclose(w[~refracted], 1.0, atol=1e-5)
    assert np.allclose(w[refracted], (1 / 1.5) ** 2, atol=1e-4)
    # refraction fraction ~ 1 - F(0.8) for eta 1.5 (~0.95)
    assert 0.9 < refracted.mean() < 0.99


def test_rough_dielectric_directions_unit(rng):
    cfg = _cfg(ROUGH_DIEL)
    mat = _mat(ROUGH_DIEL, roughness=0.3)
    wi = _wi()
    u0, u1, u2 = _u(rng)
    rt, bs = _zero()
    samp = bsdf.sample(cfg, mat, wi, bs, rt, u0, u1, u2)
    wo = np.asarray(samp.wo)
    v = np.asarray(samp.valid)
    assert v.mean() > 0.8
    assert np.allclose(np.linalg.norm(wo[v], axis=1), 1.0, atol=1e-3)
    # energy: weight bounded (no fireflies beyond microfacet weight ~ G2/G1)
    w = np.asarray(samp.weight)[v]
    assert np.isfinite(w).all()
    # Walter-style sampling has unbounded-but-rare weights (G/cos spikes);
    # the mean must stay near 1 (energy), extremes bounded for sanity.
    assert w.max() < 100.0
    assert w.mean() < 1.1


def test_rough_conductor_white_furnace_bound(rng):
    """Energy: E[weight] <= 1 (white albedo, perfect mirror metal)."""
    cfg = _cfg(ROUGH_COND)
    mat = _mat(ROUGH_COND, roughness=0.5, dist=GGX,
               eta=(0.0, 0.0, 0.0), k=(1e6, 1e6, 1e6))  # reflectance -> 1
    wi = _wi()
    u0, u1, u2 = _u(rng)
    rt, bs = _zero()
    samp = bsdf.sample(cfg, mat, wi, bs, rt, u0, u1, u2)
    w = np.asarray(samp.weight)[np.asarray(samp.valid)]
    est = w.mean(axis=0)
    assert (est < 1.02).all(), est
    assert (est > 0.6).all(), est  # shadowing loses some energy, not most

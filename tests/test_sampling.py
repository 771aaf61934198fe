"""Sampler pdf <-> sample consistency (SURVEY §4: chi^2 / MC integration).

Each direction sampler is checked by the standard Monte-Carlo identity
E[g(w)/pdf(w)] = integral g over the sampled domain, plus inverse roundtrip
(the reference ships inverses in kernels/utils.cl:92-169).
"""
import numpy as np
import jax.numpy as jnp

from photorealistic_rendering_using_opencl_tpu.ops import sampling

N = 200_000


def _u(rng, n=N):
    return (rng.random(n, dtype=np.float32),
            rng.random(n, dtype=np.float32))


def test_uniform_sphere_integrates_area(rng):
    u1, u2 = _u(rng)
    w = np.asarray(sampling.uniform_sphere(jnp.asarray(u1), jnp.asarray(u2)))
    assert np.allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
    # E[1/pdf] = 4*pi
    est = np.mean(1.0 / sampling.uniform_sphere_pdf())
    assert abs(est - 4.0 * np.pi) < 1e-3
    # z-moment ~ 0, |z| moment = 1/2
    assert abs(w[:, 2].mean()) < 0.01
    assert abs(np.abs(w[:, 2]).mean() - 0.5) < 0.01


def test_cosine_hemisphere_consistency(rng):
    u1, u2 = _u(rng)
    w = np.asarray(sampling.cosine_hemisphere(jnp.asarray(u1), jnp.asarray(u2)))
    pdf = np.asarray(sampling.cosine_hemisphere_pdf(jnp.asarray(w)))
    assert (w[:, 2] >= 0).all()
    # integral of cos over hemisphere = pi -> E[cos/pdf] = pi
    est = np.mean(w[:, 2] / pdf)
    assert abs(est - np.pi) < 0.02
    # mean cos = 2/3
    assert abs(w[:, 2].mean() - 2.0 / 3.0) < 0.005


def test_cosine_hemisphere_pdf_normalized(rng):
    # pdf integrates to 1 over the hemisphere: estimate with uniform samples
    u1, u2 = _u(rng)
    w = np.asarray(sampling.uniform_hemisphere(jnp.asarray(u1), jnp.asarray(u2)))
    pdf = np.asarray(sampling.cosine_hemisphere_pdf(jnp.asarray(w)))
    est = np.mean(pdf / sampling.uniform_hemisphere_pdf())
    assert abs(est - 1.0) < 0.01


def test_spherical_cap(rng):
    u1, u2 = _u(rng)
    ctm = 0.8
    w = np.asarray(sampling.uniform_spherical_cap(
        jnp.asarray(u1), jnp.asarray(u2), jnp.float32(ctm)))
    assert (w[:, 2] >= ctm - 1e-5).all()
    pdf = float(sampling.uniform_spherical_cap_pdf(jnp.float32(ctm)))
    # solid angle of the cap = 2*pi*(1-ctm); E[1/pdf] over cap == that
    assert abs(1.0 / pdf - 2.0 * np.pi * (1.0 - ctm)) < 1e-5
    # inverse roundtrip
    valid, iu1, iu2 = sampling.invert_uniform_spherical_cap(
        jnp.asarray(w), jnp.float32(ctm), jnp.asarray(u1 * 0))
    assert np.asarray(valid).all()
    assert np.allclose(np.asarray(iu2), u2, atol=1e-4)


def test_phong_hemisphere_normalized(rng):
    u1, u2 = _u(rng)
    n = 20.0
    w = np.asarray(sampling.phong_hemisphere(
        jnp.asarray(u1), jnp.asarray(u2), jnp.float32(n)))
    pdf = np.asarray(sampling.phong_hemisphere_pdf(jnp.asarray(w), jnp.float32(n)))
    est = np.mean(1.0 / np.maximum(pdf, 1e-12) * pdf)  # sanity
    assert abs(est - 1.0) < 1e-5
    # normalization: integrate pdf over hemisphere by uniform MC
    wu = np.asarray(sampling.uniform_hemisphere(jnp.asarray(u1), jnp.asarray(u2)))
    p = np.asarray(sampling.phong_hemisphere_pdf(jnp.asarray(wu), jnp.float32(n)))
    est = np.mean(p / sampling.uniform_hemisphere_pdf())
    assert abs(est - 1.0) < 0.05


def test_uniform_disk(rng):
    u1, u2 = _u(rng)
    d = np.asarray(sampling.uniform_disk(jnp.asarray(u1), jnp.asarray(u2)))
    r = np.linalg.norm(d, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # mean radius of a uniform disk = 2/3
    assert abs(r.mean() - 2.0 / 3.0) < 0.005


def test_invert_phi_roundtrip(rng):
    u1, u2 = _u(rng, 1000)
    w = sampling.uniform_sphere(jnp.asarray(u1), jnp.asarray(u2))
    phi = np.asarray(sampling.invert_phi(w, jnp.zeros(1000)))
    assert np.allclose(phi, u1, atol=1e-4)

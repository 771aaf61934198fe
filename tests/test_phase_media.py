"""Phase functions + participating media estimators."""
import numpy as np
import jax.numpy as jnp
import pytest

from photorealistic_rendering_using_opencl_tpu.ops import media, phase, sampling

N = 100_000


@pytest.mark.parametrize("name,g", [("isotropic", 0.0), ("hg", 0.6),
                                    ("hg", -0.4), ("rayleigh", 0.0)])
def test_phase_pdf_normalized(rng, name, g):
    ev, pd, sa = phase.get(name)
    u1 = jnp.asarray(rng.random(N, dtype=np.float32))
    u2 = jnp.asarray(rng.random(N, dtype=np.float32))
    wo = sampling.uniform_sphere(u1, u2)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
    p = np.asarray(pd(wi, wo, jnp.float32(g)))
    est = (p * 4.0 * np.pi).mean()
    assert abs(est - 1.0) < 0.02, (name, g, est)


@pytest.mark.parametrize("name,g", [("isotropic", 0.0), ("hg", 0.6),
                                    ("rayleigh", 0.0)])
def test_phase_sample_matches_pdf(rng, name, g):
    """Estimator identity: E[h(w)/pdf(w)] over samples == uniform integral."""
    ev, pd, sa = phase.get(name)
    u1 = jnp.asarray(rng.random(N, dtype=np.float32))
    u2 = jnp.asarray(rng.random(N, dtype=np.float32))
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
    w, pdf = sa(wi, u1, u2, jnp.float32(g))
    w = np.asarray(w)
    assert np.allclose(np.linalg.norm(w, axis=1), 1.0, atol=1e-4)
    # MC identity: E[(1+cos)/pdf] = integral over sphere of (1+cos) = 4*pi
    cos = (w * np.asarray([0, 0, 1.0])).sum(-1)
    est = ((1.0 + cos) / np.asarray(pdf)).mean()
    assert abs(est - 4.0 * np.pi) / (4 * np.pi) < 0.03, (name, g, est)
    # anisotropy: HG mean cosine equals g
    if name == "hg":
        assert abs(cos.mean() - g) < 0.01
    # sample == eval identity
    p2 = np.asarray(pd(wi, jnp.asarray(w), jnp.float32(g)))
    assert np.allclose(p2, np.asarray(pdf), rtol=1e-3, atol=1e-6)


def test_homogeneous_distance_sampling_unbiased(rng):
    """E[weight | exit] * P(exit-path picked correctly): the estimator's
    expected exit throughput equals analytic transmittance."""
    sigma_a = jnp.asarray([0.1, 0.2, 0.3])
    sigma_s = jnp.asarray([0.5, 0.4, 0.3])
    sigma_t = sigma_a + sigma_s
    n = N
    o = jnp.zeros((n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    max_t = jnp.full((n,), 2.0)
    uc = jnp.asarray(rng.random(n, dtype=np.float32))
    ud = jnp.asarray(rng.random(n, dtype=np.float32))
    ms = media.homogeneous_sample_distance(sigma_s, sigma_t, False,
                                           o, d, max_t, uc, ud)
    w = np.asarray(ms.weight)
    exited = np.asarray(ms.exited)
    # surface estimator: E[w * 1{exit}] = exp(-sigma_t * L)
    est_exit = (w * exited[:, None]).mean(axis=0)
    ref = np.exp(-np.asarray(sigma_t) * 2.0)
    assert np.abs(est_exit - ref).max() < 0.01
    # scatter estimator: E[w * 1{scatter}] = albedo*(1-exp(-sigma_t L))
    est_scat = (w * (~exited)[:, None]).mean(axis=0)
    ref_scat = np.asarray(sigma_s) / np.asarray(sigma_t) * (1.0 - ref)
    assert np.abs(est_scat - ref_scat).max() < 0.01


def test_homogeneous_absorption_only():
    sigma_t = jnp.asarray([0.5, 0.5, 0.5])
    n = 8
    o = jnp.zeros((n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    ms = media.homogeneous_sample_distance(jnp.zeros(3), sigma_t, True,
                                           o, d, jnp.full((n,), 3.0),
                                           jnp.zeros(n), jnp.zeros(n))
    assert np.asarray(ms.exited).all()
    assert np.allclose(np.asarray(ms.weight), np.exp(-0.5 * 3.0), atol=1e-6)


def test_exponential_medium_transmittance_matches_quadrature(rng):
    """Optical depth of the height fog vs numeric integration."""
    sigma_t = jnp.asarray([0.4, 0.4, 0.4])
    o = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -0.5, 0.0], [0.0, 0.3, 0.0]])
    dirs = np.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0],
                       [1.0, 0.0, 0.0]], np.float32)
    d = jnp.asarray(dirs)
    L = 2.5
    tr = np.asarray(media.exponential_transmittance(
        sigma_t, o, d, jnp.full((3,), L)))
    # numeric quadrature of exp(-int sigma_t * rho)
    ts = np.linspace(0, L, 20001)
    for i in range(3):
        y = np.asarray(o)[i, 1] + ts * dirs[i, 1]
        rho = np.exp(-y)
        tau = 0.4 * np.trapezoid(rho, ts)
        assert abs(tr[i, 0] - np.exp(-tau)) < 1e-3, i


def test_exponential_distance_sampling_unbiased(rng):
    sigma_a = jnp.asarray([0.1, 0.1, 0.1])
    sigma_s = jnp.asarray([0.4, 0.4, 0.4])
    sigma_t = sigma_a + sigma_s
    n = N
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.5, 0.0]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -0.6, 0.8]), (n, 3))
    L = 3.0
    uc = jnp.asarray(rng.random(n, dtype=np.float32))
    ud = jnp.asarray(rng.random(n, dtype=np.float32))
    ms = media.exponential_sample_distance(sigma_s, sigma_t, False, o, d,
                                           jnp.full((n,), L), uc, ud)
    w = np.asarray(ms.weight)
    exited = np.asarray(ms.exited)
    tr = np.asarray(media.exponential_transmittance(
        sigma_t, o[:1], d[:1], jnp.full((1,), L)))[0]
    est_exit = (w * exited[:, None]).mean(axis=0)
    assert np.abs(est_exit - tr).max() < 0.02

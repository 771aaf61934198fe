"""Counter-based RNG: determinism, uniformity, stream independence."""
import numpy as np
import jax.numpy as jnp

from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler, pcg4d, threefry2x32


def _draws(scheme, n=100_000, dim=0, seed=0, sample=0):
    pix = jnp.arange(n, dtype=jnp.uint32)
    s = Sampler(pix, jnp.full((n,), sample, jnp.uint32), seed=seed,
                scheme=scheme, dim=dim)
    return np.asarray(s.next1d())


def test_determinism():
    for scheme in ("pcg4d", "threefry"):
        a = _draws(scheme)
        b = _draws(scheme)
        assert (a == b).all(), scheme


def test_uniformity_and_range():
    for scheme in ("pcg4d", "threefry"):
        u = _draws(scheme)
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 0.005, scheme
        assert abs(u.var() - 1.0 / 12.0) < 0.002, scheme
        # 16-bin chi-square
        hist, _ = np.histogram(u, bins=16, range=(0, 1))
        expected = len(u) / 16
        chi2 = ((hist - expected) ** 2 / expected).sum()
        assert chi2 < 50, (scheme, chi2)  # dof=15, p~1e-5 cutoff


def test_stream_independence_across_dims():
    for scheme in ("pcg4d", "threefry"):
        a = _draws(scheme, dim=4)
        b = _draws(scheme, dim=8)
        corr = np.corrcoef(a, b)[0, 1]
        assert abs(corr) < 0.01, scheme


def test_stream_independence_within_window():
    """pcg4d hands out 4 words per hash; consecutive draws (same hash,
    different words) must still be uncorrelated."""
    from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler
    import jax.numpy as jnp

    pix = jnp.arange(4096, dtype=jnp.uint32)
    s = Sampler(pix, jnp.zeros_like(pix), seed=1, scheme="pcg4d", dim=0)
    a, b, c, d = (np.asarray(x) for x in s.nextnd(4))
    for x, y in ((a, b), (a, c), (a, d), (b, c), (c, d)):
        assert abs(np.corrcoef(x, y)[0, 1]) < 0.05
    # and across the window boundary
    e = np.asarray(s.next1d())
    assert abs(np.corrcoef(d, e)[0, 1]) < 0.05


def test_stream_independence_across_samples():
    for scheme in ("pcg4d", "threefry"):
        a = _draws(scheme, sample=0)
        b = _draws(scheme, sample=1)
        assert not (a == b).all()
        corr = np.corrcoef(a, b)[0, 1]
        assert abs(corr) < 0.01, scheme


def test_sampler_dim_advances():
    pix = jnp.zeros((4,), jnp.uint32)
    s = Sampler(pix, pix, scheme="pcg4d")
    u1 = s.next1d()
    u2 = s.next1d()
    assert not np.allclose(np.asarray(u1), np.asarray(u2))
    assert s.dim == 2


def test_threefry_vector_consistency():
    # scalar vs batched agreement
    k0 = jnp.uint32(12)
    k1 = jnp.uint32(34)
    x0 = jnp.arange(8, dtype=jnp.uint32)
    x1 = jnp.arange(8, dtype=jnp.uint32) * 7
    a0, a1 = threefry2x32(k0, k1, x0, x1)
    for i in range(8):
        b0, b1 = threefry2x32(k0, k1, x0[i], x1[i])
        assert a0[i] == b0 and a1[i] == b1

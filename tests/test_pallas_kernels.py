"""Pallas kernels (interpret mode on CPU): fused tonemap, prefix-sum
compaction."""
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.ops import pallas_kernels as pk
from photorealistic_rendering_using_opencl_tpu.ops.tonemap import tonemap


def test_tonemap_pallas_matches_reference():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 3, (33, 47, 3)), jnp.float32)
    got = np.asarray(pk.tonemap_pallas(img))
    want = np.asarray(tonemap(img))
    np.testing.assert_allclose(got, want, atol=2e-5)
    got2 = np.asarray(pk.tonemap_pallas(img, vignette=False))
    want2 = np.asarray(tonemap(img, vignette=False))
    np.testing.assert_allclose(got2, want2, atol=2e-5)


def test_exclusive_prefix_sum_matches_numpy():
    rng = np.random.default_rng(1)
    flags = jnp.asarray(rng.integers(0, 2, 3000), jnp.int32)
    scan, total = pk.exclusive_prefix_sum(flags, block=256)
    f = np.asarray(flags)
    want = np.cumsum(f) - f
    np.testing.assert_array_equal(np.asarray(scan), want)
    assert int(total) == int(f.sum())


def test_compact_indices_groups_alive_first():
    rng = np.random.default_rng(2)
    alive = jnp.asarray(rng.integers(0, 2, 1000).astype(bool))
    perm, n_alive = pk.compact_indices(alive)
    a = np.asarray(alive)
    p = np.asarray(perm)
    assert sorted(p.tolist()) == list(range(1000))  # permutation
    k = int(n_alive)
    assert k == int(a.sum())
    assert a[p[:k]].all() and not a[p[k:]].any()
    # stability: original order preserved within each group
    assert (np.diff(p[:k]) > 0).all() and (np.diff(p[k:]) > 0).all()

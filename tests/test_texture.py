"""Texture sampling: mips, trilinear, anisotropic."""
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.ops import texture


def _checker(h=16, w=16):
    y, x = np.mgrid[0:h, 0:w]
    c = ((x + y) % 2).astype(np.float32)
    return np.stack([c, 1 - c, np.full_like(c, 0.5)], axis=-1)


def test_pyramid_shapes_and_means():
    pyr = texture.build_mip_pyramid(jnp.asarray(_checker()))
    assert pyr[0].shape == (16, 16, 3)
    assert pyr[-1].shape[0] == 1
    # box filter preserves the mean exactly
    for level in pyr:
        np.testing.assert_allclose(float(level.mean()), float(pyr[0].mean()),
                                   atol=1e-6)


def test_bilinear_interpolates_between_texels():
    tex = jnp.asarray(np.array([[[0.0], [1.0]]], np.float32))  # 1x2
    u = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    v = jnp.full((3,), 0.5, jnp.float32)
    out = np.asarray(texture.sample_bilinear(tex, u, v))[:, 0]
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0], atol=1e-6)


def test_trilinear_lod_blends_to_average():
    pyr = texture.build_mip_pyramid(jnp.asarray(_checker()))
    u = jnp.asarray([0.37], jnp.float32)
    v = jnp.asarray([0.61], jnp.float32)
    fine = np.asarray(texture.sample_trilinear(pyr, u, v,
                                               jnp.asarray([0.0])))
    coarse = np.asarray(texture.sample_trilinear(
        pyr, u, v, jnp.asarray([float(len(pyr) - 1)])))
    np.testing.assert_allclose(coarse[0], np.asarray(pyr[-1]).reshape(-1)[:3],
                               atol=1e-5)
    assert not np.allclose(fine, coarse)


def test_anisotropic_runs_and_averages():
    pyr = texture.build_mip_pyramid(jnp.asarray(_checker()))
    n = 8
    u = jnp.linspace(0.1, 0.9, n)
    v = jnp.linspace(0.2, 0.8, n)
    du = jnp.tile(jnp.asarray([[0.2, 0.0]], jnp.float32), (n, 1))
    dv = jnp.tile(jnp.asarray([[0.0, 0.01]], jnp.float32), (n, 1))
    out = np.asarray(texture.sample_anisotropic(pyr, u, v, du, dv))
    assert out.shape == (n, 3)
    assert np.isfinite(out).all()
    # heavy anisotropy along x averages the checker toward 0.5
    assert np.abs(out[:, 0] - 0.5).max() < 0.45

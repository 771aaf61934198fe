"""Small parity rows: mwc RNG scheme, Phong tessellation, config describe,
BDPT stub, materials scene."""
import jax.numpy as jnp
import numpy as np
import pytest

from photorealistic_rendering_using_opencl_tpu.models import bidirectional, pathtracer
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler, mwc_hash
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene
from photorealistic_rendering_using_opencl_tpu.scene.phong_tess import (
    phong_tessellate, tessellated_aabb,
)
from photorealistic_rendering_using_opencl_tpu.scene.types import (
    ABS_REFR, BURLEY, COAT, COND, DIEL, DIFF, ROUGH_COND, ROUGH_DIEL,
)
from photorealistic_rendering_using_opencl_tpu.utils.config import describe, manifest


def test_mwc_scheme_uniform_and_decorrelated():
    pix = jnp.arange(4096, dtype=jnp.uint32)
    s = Sampler(pix, jnp.zeros_like(pix), seed=1, scheme="mwc")
    u1 = np.asarray(s.next1d())
    u2 = np.asarray(s.next1d())
    assert ((u1 >= 0) & (u1 < 1)).all()
    assert abs(u1.mean() - 0.5) < 0.03
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.06
    # per-pixel decorrelation: neighbors differ
    assert np.abs(np.diff(u1)).mean() > 0.2


def test_phong_tessellate_flat_and_curved():
    p1 = jnp.asarray([1.0, 0.0, 0.0])
    p2 = jnp.asarray([0.0, 1.0, 0.0])
    p3 = jnp.asarray([0.0, 0.0, 1.0])
    # sphere normals: position on unit sphere
    n1, n2, n3 = p1, p2, p3
    # alpha = 0 -> barycentric point
    mid0 = phong_tessellate(p1, p2, p3, n1, n2, n3, 0.0, 1 / 3, 1 / 3)
    np.testing.assert_allclose(np.asarray(mid0), [1 / 3, 1 / 3, 1 / 3],
                               atol=1e-6)
    # alpha = 1 -> curved point bulges toward the unit sphere
    mid1 = phong_tessellate(p1, p2, p3, n1, n2, n3, 1.0, 1 / 3, 1 / 3)
    assert float(jnp.linalg.norm(mid1)) > float(jnp.linalg.norm(mid0))
    assert float(jnp.linalg.norm(mid1)) <= 1.0 + 1e-5
    # conservative bounds contain vertices and curved samples
    bmin, bmax = tessellated_aabb(p1, p2, p3, n1, n2, n3, 1.0)
    assert (np.asarray(bmin) <= np.asarray(mid1) + 1e-6).all()
    assert (np.asarray(bmax) >= np.asarray(mid1) - 1e-6).all()


def test_bdpt_stub_raises():
    with pytest.raises(NotImplementedError):
        bidirectional.trace()


def test_config_describe_and_manifest():
    cfg, scene = load_scene("scenes/materials.json")
    d = describe(cfg)
    assert d["n_spheres"] == 8 and d["n_quads"] == 2
    # every BSDF family of the reference is active in the materials scene
    for bit in (DIFF, COND, ROUGH_COND, DIEL, ABS_REFR, ROUGH_DIEL, COAT,
                BURLEY):
        assert d["active_mats"] & bit, bin(d["active_mats"])
    m = manifest(cfg, 32, 32, 4, seed=7)
    assert '"width": 32' in m


def test_materials_scene_renders_all_lobes():
    cfg, scene = load_scene("scenes/materials.json")
    cam = default_camera(48, 48).pytree()
    img, _ = pathtracer.render(cfg, scene, cam, 48, 48, 4, seed=2)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.max() > 0.5 and a.mean() > 0.01

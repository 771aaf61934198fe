"""Distributed bootstrap helpers + sharded-vs-single-chip equivalence."""
import jax
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.models import pathtracer
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.parallel import distributed
from photorealistic_rendering_using_opencl_tpu.parallel.render import render_sharded
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def test_global_mesh_covers_all_devices():
    mesh = distributed.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("rays",)


def test_local_shard_bounds_partition():
    lo, hi = distributed.local_shard_bounds(100)
    assert 0 <= lo <= hi <= 100
    # single process: full range
    if jax.process_count() == 1:
        assert (lo, hi) == (0, 100)


def test_initialize_single_process_noop():
    distributed.initialize()  # no coordinator configured -> no-op
    distributed.initialize()  # idempotent


def test_sharded_render_matches_single_chip():
    """Counter-based RNG keyed on global pixel id: the 8-way sharded image
    must equal the single-device render bit-for-bit (SURVEY §2.4 RNG row)."""
    cfg, scene = load_scene("scenes/cornell_simple.json")
    cam = default_camera(24, 24).pytree()
    mesh = distributed.global_mesh()
    img_sharded, a_sharded = render_sharded(cfg, scene, cam, 24, 24, 2, mesh,
                                            seed=5)
    img_single, a_single = pathtracer.render(cfg, scene, cam, 24, 24, 2,
                                             seed=5, method="while")
    np.testing.assert_allclose(np.asarray(img_sharded),
                               np.asarray(img_single), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_sharded),
                               np.asarray(a_single), atol=1e-6)

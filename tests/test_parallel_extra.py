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


def test_train_step_update_device_count_invariant():
    """The SGD update must be bitwise identical on 1, 2, and 8 devices.

    Round-3 audit catch: under check_rep=False the psum'd loss autodiffs
    into per-shard LOCAL gradients scaled by n_dev, and out_specs=P()
    published shard 0's copy -- training silently depended on the device
    count.  parallel/render.py now all-reduces the parameter gradients
    explicitly (the compiled HLO carries exactly two all-reduces: the
    scalar loss and the 84-byte gradient pytree; tools/spmd_audit.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.parallel.render import (
        RAYS_AXIS, make_train_step,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    cfg, scene = load_scene("scenes/cornell_simple.json")
    W = 16
    cam = default_camera(W, W).pytree()
    target = jnp.full((W * W, 3), 0.2, jnp.float32)

    updates = {}
    for n in (1, 2, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n]), (RAYS_AXIS,))
        step = make_train_step(cfg, W, W, 1, mesh)
        loss, s2 = step(scene, cam, target, 0)
        updates[n] = (float(loss), np.asarray(s2.color),
                      np.asarray(s2.medium_sigma_t))
    for n in (2, 8):
        assert abs(updates[n][0] - updates[1][0]) < 1e-6
        np.testing.assert_array_equal(updates[n][1], updates[1][1])
        np.testing.assert_array_equal(updates[n][2], updates[1][2])
    # and the update must actually move the parameters
    assert np.abs(updates[1][1] - np.asarray(scene.color)).max() > 1e-5

"""Static SPMD audit: count collectives/padding in the compiled HLO.

Round-2 verdict item 10: the weak-scaling claim needs static evidence that
the compiled SPMD programs communicate exactly as designed --

  * ``render_sharded``   : ZERO collectives (each shard owns its pixels);
  * ``make_train_step``  : gradient all-reduce(s) over the mesh and
                           nothing else crossing chips per step.

Runs on the virtual CPU mesh (the partitioner emits the same collectives
it would for real chips); prints one JSON line per program per device
count, recording collective-op counts by kind and the psum'd byte volume.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/spmd_audit.py
"""
from __future__ import annotations

import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVE_KINDS = ("all-reduce", "all-gather", "all-to-all",
                    "collective-permute", "reduce-scatter")


def _dtype_bytes(dt: str) -> int:
    return {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
            "pred": 1, "s8": 1, "u8": 1}.get(dt, 4)


def collective_stats(hlo_text: str) -> dict:
    """Count collective ops and the bytes they move (from result shapes)."""
    stats = {k: 0 for k in COLLECTIVE_KINDS}
    bytes_by_kind = {k: 0 for k in COLLECTIVE_KINDS}
    # lines like: %x = f32[7,3]{1,0} all-reduce(...), replica_groups=...
    pat = re.compile(
        r"=\s*(?:\()?([a-z0-9]+)\[([0-9,]*)\][^=]*?\b(" +
        "|".join(COLLECTIVE_KINDS) + r")\(")
    for m in pat.finditer(hlo_text):
        dt, shape, kind = m.groups()
        stats[kind] += 1
        numel = 1
        for d in shape.split(","):
            if d:
                numel *= int(d)
        bytes_by_kind[kind] += numel * _dtype_bytes(dt)
    # *-start/-done variants (async) -- count starts only
    for kind in COLLECTIVE_KINDS:
        n_start = len(re.findall(kind + r"-start\(", hlo_text))
        if n_start:
            stats[kind] += n_start
    return {"counts": stats, "bytes": bytes_by_kind,
            "total_collectives": sum(stats.values())}


def audit(n_devices: int) -> list[dict]:
    import jax
    want = os.environ.get("JAX_PLATFORMS")
    if want and jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
    from photorealistic_rendering_using_opencl_tpu.parallel.render import (
        RAYS_AXIS, make_train_step, render_sharded,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene
    from photorealistic_rendering_using_opencl_tpu.scene.obj import make_icosphere

    mesh_dev = jax.devices()[:n_devices]
    assert len(mesh_dev) == n_devices
    mesh = Mesh(np.asarray(mesh_dev), (RAYS_AXIS,))
    mesh_icos = make_icosphere(subdiv=1, radius=0.6, center=(0.0, -1.0, 0.0))
    cfg, scene = load_scene("scenes/cornell.json", mesh_override=mesh_icos)
    W = 16
    cam = default_camera(W, W).pytree()

    results = []

    lowered = render_sharded.lower(cfg, scene, cam, W, W, 2, mesh, seed=0)
    hlo = lowered.compile().as_text()
    fwd = collective_stats(hlo)
    fwd.update(program="render_sharded", n_devices=n_devices,
               padded_pixels=(-(W * W) % n_devices))
    results.append(fwd)

    step = make_train_step(cfg, W, W, 1, mesh)
    target = jnp.zeros((W * W, 3), jnp.float32)
    hlo2 = jax.jit(step).lower(scene, cam, target, 0).compile().as_text()
    bwd = collective_stats(hlo2)
    n_param_elems = sum(np.asarray(getattr(scene, n)).size for n in
                        ("color", "obj_color", "medium_sigma_a",
                         "medium_sigma_s", "medium_sigma_t"))
    bwd.update(program="train_step", n_devices=n_devices,
               param_gradient_bytes=int(n_param_elems * 4),
               padded_pixels=(-(W * W) % n_devices))
    results.append(bwd)
    return results


def main():
    out = []
    for n in (1, 8):
        out.extend(audit(n))
    for row in out:
        print(json.dumps(row))
    return out


if __name__ == "__main__":
    main()

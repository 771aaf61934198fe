"""Cross-platform mesh-kernel parity: TPU pallas vs CPU exact-f32 XLA.

Saves CPU reference indices for a fixed ray population, then compares the
TPU kernel's winners (closest AND mixed any-hit batches, with per-lane
t_init from a real analytic prepass) against them.  Run once with
JAX_PLATFORMS=cpu-style config to generate /tmp/kernel_parity_ref.npz
(the tool does this automatically in-process using the XLA path), then
the TPU comparison happens in the same run.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.ops import mesh_brute as mb
from photorealistic_rendering_using_opencl_tpu.ops.math import RAY_INF
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def main():
    cfg, scene = load_scene("scenes/cornell.json")
    n = 262144
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    # mixed population: half closest with random finite t_init, half
    # any-hit with random limits; ~1/8 inactive
    tinit = jnp.asarray(
        rng.uniform(0.05, 6.0, n).astype(np.float32))
    anyh = jnp.asarray(rng.random(n) < 0.5)
    act = jnp.asarray(rng.random(n) < 0.875)

    feat = jnp.asarray(scene.bf_feat, jnp.float32)
    cl = scene.bf_clusters

    # CPU-exact reference via the XLA path on host
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t_ref, i_ref = jax.jit(
            lambda: mb._intersect_xla(feat, cl, o, d, tinit, act),
            device=cpu)()
    i_ref = np.asarray(i_ref)
    occl_ref = i_ref >= 0  # any-hit semantics are subsumed by closest

    # device kernel (whatever backend mesh_intersect picks)
    t_dev, i_dev = jax.jit(lambda: mb.mesh_intersect(
        feat, cl, o, d, tinit, active=act, any_hit=anyh))()
    i_dev = np.asarray(i_dev)
    occl_dev = i_dev >= 0

    anyh_np, act_np = np.asarray(anyh), np.asarray(act)
    cl_mask = act_np & ~anyh_np
    sh_mask = act_np & anyh_np
    print("platform:", jax.devices()[0].platform)
    print(f"closest lanes {cl_mask.sum()}: index agreement "
          f"{(i_ref[cl_mask] == i_dev[cl_mask]).mean():.6f}  "
          f"hit/miss flips {(occl_ref[cl_mask] != occl_dev[cl_mask]).sum()}")
    print(f"any-hit lanes {sh_mask.sum()}: occlusion agreement "
          f"{(occl_ref[sh_mask] == occl_dev[sh_mask]).mean():.6f}  "
          f"flips {(occl_ref[sh_mask] != occl_dev[sh_mask]).sum()}")
    ina = ~act_np
    print(f"inactive lanes {ina.sum()}: device reports hit on "
          f"{occl_dev[ina].sum()} (must be 0)")


if __name__ == "__main__":
    main()

"""Does a pallas custom-call mid-chain fragment XLA fusion catastrophically?

bounce_step on the analytic scene costs ~1.3 ms; the mesh scene's step
costs ~81 ms of which only ~37 ms is attributable to the mesh kernels
themselves.  Hypothesis: each pallas call is a fusion barrier that forces
the surrounding elementwise chain to materialize to HBM in many small
fusions.  Test: replace shadow_visible with a TRIVIAL pallas passthrough
on the analytic scene and see what the step costs.
"""
from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photorealistic_rendering_using_opencl_tpu.models import integrator
from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def timed(name, fn, lo=4, hi=16):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def multi(reps):
        def body(acc, i):
            return acc + fn(i), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(reps, dtype=jnp.uint32))
        return acc

    def run(reps):
        float(multi(reps))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(multi(reps))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(lo), run(hi)
    per = max(t_hi - t_lo, 1e-9) / (hi - lo)
    if per < 0.05 * (t_hi / hi):
        per = t_hi / hi
    print(f"{name:44s} {per*1e3:9.2f} ms", flush=True)


def _passthrough(x):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]
    n = x.shape[0]
    return pl.pallas_call(
        kernel, grid=(n // 1024,),
        in_specs=[pl.BlockSpec((1024, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1024, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3), jnp.float32),
    )(x)


def main():
    cfg, scene = load_scene("scenes/cornell_simple.json")
    n = 262144
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    pix = jnp.arange(n, dtype=jnp.uint32)
    smp = jnp.zeros_like(pix)
    state = integrator.init_state(o, d)

    real_shadow = integrator.shadow_visible

    def step(i):
        sampler = Sampler(pix, smp + i, seed=0, scheme="pcg4d", dim=8)
        out = integrator.bounce_step(cfg, scene, state, sampler,
                                     jnp.asarray(0, jnp.int32))
        return out.acc.sum() + out.mask.sum()

    timed("analytic bounce_step (baseline)", step)

    def pallas_shadow(cfg2, scene2, origin, direction, max_dist,
                      active=None):
        v = real_shadow(cfg2, scene2, origin, direction, max_dist,
                        active=active)
        bounced = _passthrough(origin + direction)
        return v & (jnp.sum(bounced, axis=-1) > -1e30)

    integrator.shadow_visible = pallas_shadow
    timed("analytic bounce_step + 1 pallas barrier", step)

    def pallas_shadow2(cfg2, scene2, origin, direction, max_dist,
                       active=None):
        v = real_shadow(cfg2, scene2, origin, direction, max_dist,
                        active=active)
        bounced = _passthrough(_passthrough(origin + direction) + direction)
        return v & (jnp.sum(bounced, axis=-1) > -1e30)

    integrator.shadow_visible = pallas_shadow2
    timed("analytic bounce_step + 2 pallas barriers", step)

    def _passthrough_flat(x):
        # lane-aligned variant: [N] viewed as [N/128, 128] rows
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:]
        n = x.shape[0]
        y = x.reshape(n // 128, 128)
        out = pl.pallas_call(
            kernel, grid=(n // 128 // 256,),
            in_specs=[pl.BlockSpec((256, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.float32),
        )(y)
        return out.reshape(n)

    def pallas_shadow3(cfg2, scene2, origin, direction, max_dist,
                       active=None):
        v = real_shadow(cfg2, scene2, origin, direction, max_dist,
                        active=active)
        bounced = _passthrough_flat((origin + direction).reshape(-1))
        return v & (bounced.reshape(-1, 3).sum(axis=-1) > -1e30)

    integrator.shadow_visible = pallas_shadow3
    timed("analytic bounce_step + 1 lane-aligned barrier", step)
    integrator.shadow_visible = real_shadow


if __name__ == "__main__":
    main()

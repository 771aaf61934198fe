"""Dissect the per-bounce fixed cost: mesh-kernel overheads, lane scaling,
and the elementwise shading floor."""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.models import integrator, pathtracer
from photorealistic_rendering_using_opencl_tpu.ops import bsdf as bsdf_ops
from photorealistic_rendering_using_opencl_tpu.ops import mesh_brute
from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
from photorealistic_rendering_using_opencl_tpu.ops.intersect import intersect_scene
from photorealistic_rendering_using_opencl_tpu.ops.math import RAY_INF
from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:9.2f} ms")
    return out


def main():
    cfg, scene = load_scene("scenes/cornell.json")
    for n in (65536, 262144):
        print(f"--- lanes {n}")
        rng = np.random.default_rng(0)
        o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
        tinit = jnp.full((n,), RAY_INF)
        act = jnp.ones((n,), bool)

        feat, clusters = scene.bf_feat, scene.bf_clusters

        rel = jax.jit(lambda o, d: mesh_brute._block_relevance(
            clusters, o, d, tinit, act, n // mesh_brute.BLOCK,
            mesh_brute.BLOCK))
        timeit("block_relevance alone", rel, o, d)

        mesh = jax.jit(lambda o, d: mesh_brute.mesh_intersect(
            feat, clusters, o, d, tinit, active=act)[0])
        timeit("mesh kernel (all active)", mesh, o, d)

        isect = jax.jit(lambda o, d: intersect_scene(cfg, scene, o, d,
                                                     active=act).t)
        timeit("intersect_scene", isect, o, d)

        # shading-only: bounce_step with mesh removed via analytic scene
        pix = jnp.arange(n, dtype=jnp.uint32)
        smp = jnp.zeros_like(pix)

        @jax.jit
        def step(state):
            sampler = Sampler(pix, smp, seed=0, scheme="pcg4d", dim=8)
            return integrator.bounce_step(cfg, scene, state, sampler,
                                          jnp.asarray(0, jnp.int32))

        state = integrator.init_state(o, d)
        timeit("bounce_step full", step, state)

        cfg2, scene2 = load_scene("scenes/cornell_simple.json")

        @jax.jit
        def step2(state):
            sampler = Sampler(pix, smp, seed=0, scheme="pcg4d", dim=8)
            return integrator.bounce_step(cfg2, scene2, state, sampler,
                                          jnp.asarray(0, jnp.int32))

        timeit("bounce_step analytic-only scene", step2, state)

        mat = integrator.gather_material(cfg, scene,
                                         jnp.zeros((n,), jnp.int32))
        u = jnp.full((n,), 0.4)
        wi = jnp.concatenate([d[:, :2] * 0.1, jnp.abs(d[:, 2:3])], axis=1)
        bs = jax.jit(lambda wi: bsdf_ops.sample(cfg, mat, wi,
                                                jnp.zeros((n,), bool),
                                                tinit, u, u, u).pdf)
        timeit("bsdf sample (full set)", bs, wi)
        be = jax.jit(lambda wi: bsdf_ops.evaluate(cfg, mat, wi, wi,
                                                  jnp.zeros((n,), bool),
                                                  tinit))
        timeit("bsdf evaluate (full set)", be, wi)


if __name__ == "__main__":
    main()

"""Component timings with the tunnel latency cancelled (differenced reps).

Single-dispatch timings through the axon tunnel carry a ~23 ms fixed
round-trip (tools/profile_floor.py measured a flat 23 ms on trivially
small jitted calls), so every component here is timed as a jitted scan
over reps at two rep counts, differenced -- the same methodology as
bench.py.
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

from photorealistic_rendering_using_opencl_tpu.models import integrator, pathtracer
from photorealistic_rendering_using_opencl_tpu.ops import mesh_brute
from photorealistic_rendering_using_opencl_tpu.ops.intersect import (
    bvh_smooth_normal, intersect_scene, shadow_visible, tri_reattach,
)
from photorealistic_rendering_using_opencl_tpu.ops.math import RAY_INF
from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def timed(name, fn, lo=4, hi=16):
    """fn(i) -> scalar; prints differenced per-call ms."""

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
    return per


def main():
    cfg, scene = load_scene("scenes/cornell.json")
    n = int(os.environ.get("N", "262144"))
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tinit = jnp.full((n,), RAY_INF)
    act = jnp.ones((n,), bool)
    tri = jnp.asarray(rng.integers(0, cfg.n_triangles, n, dtype=np.int32))
    print(f"lanes {n}")

    timed("mesh kernel closest", lambda i: mesh_brute.mesh_intersect(
        scene.bf_feat, scene.bf_clusters, o + 0.0 * i, d, tinit,
        active=act)[0].sum())
    timed("mesh kernel any-hit", lambda i: mesh_brute.mesh_intersect(
        scene.bf_feat, scene.bf_clusters, o + 0.0 * i, d,
        jnp.full((n,), 5.0), active=act, any_hit=True)[1].sum().astype(
            jnp.float32))
    timed("intersect_scene", lambda i: intersect_scene(
        cfg, scene, o + 0.0 * i, d, active=act).t.sum())
    timed("shadow_visible", lambda i: shadow_visible(
        cfg, scene, o + 0.0 * i, d, jnp.full((n,), 5.0),
        active=act).sum().astype(jnp.float32))
    timed("tri_reattach + smooth normal", lambda i: sum(
        x.sum() for x in tri_reattach(scene.bf_tri_verts,
                                      tri + 0 * i.astype(jnp.int32), o, d))
        + bvh_smooth_normal(scene.bf_tri_normals,
                            tri + 0 * i.astype(jnp.int32), tinit,
                            tinit).sum())

    pix = jnp.arange(n, dtype=jnp.uint32)
    smp = jnp.zeros_like(pix)
    state = integrator.init_state(o, d)

    def step(i):
        sampler = Sampler(pix, smp + i, seed=0, scheme="pcg4d", dim=8)
        out = integrator.bounce_step(cfg, scene, state, sampler,
                                     jnp.asarray(0, jnp.int32))
        return out.acc.sum() + out.mask.sum()

    timed("bounce_step", step, lo=2, hi=8)

    cfg2, scene2 = load_scene("scenes/cornell_simple.json")

    def step2(i):
        sampler = Sampler(pix, smp + i, seed=0, scheme="pcg4d", dim=8)
        out = integrator.bounce_step(cfg2, scene2, state, sampler,
                                     jnp.asarray(0, jnp.int32))
        return out.acc.sum() + out.mask.sum()

    timed("bounce_step analytic scene", step2)


if __name__ == "__main__" and not os.environ.get("VARIANTS"):
    main()


def variants():
    import dataclasses
    cfg, scene = load_scene("scenes/cornell.json")
    n = int(os.environ.get("N", "262144"))
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    pix = jnp.arange(n, dtype=jnp.uint32)
    smp = jnp.zeros_like(pix)
    state = integrator.init_state(o, d)

    def mk(cfg):
        def step(i):
            sampler = Sampler(pix, smp + i, seed=0, scheme="pcg4d", dim=8)
            out = integrator.bounce_step(cfg, scene, state, sampler,
                                         jnp.asarray(0, jnp.int32))
            return out.acc.sum() + out.mask.sum()
        return step

    print(f"lanes {n}")
    timed("bounce_step full", mk(cfg), lo=2, hi=8)
    timed("bounce_step no NEE", mk(dataclasses.replace(
        cfg, enable_light_sampling=False)), lo=2, hi=8)
    act = jnp.ones((n,), bool)

    def two_isect(i):
        h1 = intersect_scene(cfg, scene, o + 0.0 * i, d, active=act)
        h2 = intersect_scene(cfg, scene, h1.pos, -d, active=act)
        return h1.t.sum() + h2.t.sum()

    timed("two intersect_scene chained", two_isect, lo=2, hi=8)

    def isect_plus_shadow(i):
        h1 = intersect_scene(cfg, scene, o + 0.0 * i, d, active=act)
        v = shadow_visible(cfg, scene, h1.pos, d, jnp.full((n,), 5.0),
                           active=act)
        return h1.t.sum() + v.sum().astype(jnp.float32)

    timed("intersect + shadow chained", isect_plus_shadow, lo=2, hi=8)


if __name__ == "__main__" and os.environ.get("VARIANTS"):
    variants()

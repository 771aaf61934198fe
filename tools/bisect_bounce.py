"""Bisect bounce_step cost by stubbing out intersect/shadow (TPU)."""
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

from photorealistic_rendering_using_opencl_tpu.models import integrator
from photorealistic_rendering_using_opencl_tpu.ops.intersect import Hit
from photorealistic_rendering_using_opencl_tpu.ops.rng import Sampler
from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene


def timed(name, fn, lo=2, hi=8):
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
    print(f"{name:40s} {per*1e3:9.2f} ms", flush=True)


def main():
    cfg, scene = load_scene("scenes/cornell.json")
    n = 262144
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    pix = jnp.arange(n, dtype=jnp.uint32)
    smp = jnp.zeros_like(pix)
    state = integrator.init_state(o, d)

    real_isect = integrator.intersect_scene
    real_shadow = integrator.shadow_visible

    def fake_isect(cfg, scene, origin, direction, active=None):
        t = jnp.full((n,), 2.0)
        return Hit(t, jnp.zeros((n,), jnp.int32),
                   origin + direction * 2.0, -direction,
                   jnp.zeros((n,), bool))

    def fake_shadow(cfg, scene, origin, direction, max_dist, active=None):
        return jnp.sum(direction, axis=-1) > 0.0

    def mk(name):
        def step(i):
            sampler = Sampler(pix, smp + i, seed=0, scheme="pcg4d", dim=8)
            out = integrator.bounce_step(cfg, scene, state, sampler,
                                         jnp.asarray(0, jnp.int32))
            return out.acc.sum() + out.mask.sum()
        timed(name, step)

    mk("full")
    integrator.shadow_visible = fake_shadow
    mk("shadow stubbed")
    integrator.shadow_visible = real_shadow
    integrator.intersect_scene = fake_isect
    mk("intersect stubbed")
    integrator.shadow_visible = fake_shadow
    mk("both stubbed")
    integrator.intersect_scene = real_isect
    integrator.shadow_visible = real_shadow


if __name__ == "__main__" and not os.environ.get("ISECT"):
    main()


def isect_full():
    """intersect_scene with ALL outputs consumed (no DCE) vs t-only."""
    cfg, scene = load_scene("scenes/cornell.json")
    n = 262144
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    act = jnp.ones((n,), bool)
    isect = integrator.intersect_scene

    timed("isect t only", lambda i: isect(
        cfg, scene, o + 0.0 * i, d, active=act).t.sum())

    def full(i):
        h = isect(cfg, scene, o + 0.0 * i, d, active=act)
        return (h.t.sum() + h.pos.sum() + h.normal.sum()
                + h.mesh_id.sum().astype(jnp.float32)
                + h.backside.sum().astype(jnp.float32))

    timed("isect all outputs", full)

    from photorealistic_rendering_using_opencl_tpu.ops import mesh_brute

    def kern_full(i):
        t, tri = mesh_brute.mesh_intersect(
            scene.bf_feat, scene.bf_clusters, o + 0.0 * i, d,
            jnp.full((n,), 20.0), active=act)
        return t.sum() + tri.sum().astype(jnp.float32)

    timed("mesh kernel t+tri", kern_full)

    from photorealistic_rendering_using_opencl_tpu.ops.intersect import (
        bvh_smooth_normal, tri_reattach,
    )
    from photorealistic_rendering_using_opencl_tpu.ops.math import normalize

    def reattach_after_kernel(i):
        t, tri = mesh_brute.mesh_intersect(
            scene.bf_feat, scene.bf_clusters, o + 0.0 * i, d,
            jnp.full((n,), 20.0), active=act)
        tm, u, v = tri_reattach(scene.bf_tri_verts, tri, o, d)
        nm = normalize(bvh_smooth_normal(scene.bf_tri_normals, tri, u, v))
        return tm.sum() + nm.sum() + t.sum()

    timed("kernel + reattach + normal", reattach_after_kernel)


if __name__ == "__main__" and os.environ.get("ISECT"):
    isect_full()

"""Decompose the regen_scan backward cost on the real TPU.

The round-4 sweep measured fwd-only 1.10 s vs fwd+bwd 4.66 s at
512^2 x 4 spp x 64 iters (body remat, chunk 8): the backward sweep costs
~55 ms/iter against a 17 ms/iter forward whose elementwise share is only
~7 ms.  Each child process here times one hypothesis:

  all      grad w.r.t. every float leaf (the bench configuration)
  one      grad w.r.t. obj_color ONLY -- if much faster, the per-parameter
           broadcast-transpose reductions (one [N,3]->[3] sum per object
           per field per iteration) dominate
  nosan    _sanitize_grad patched to identity -- measures the per-iteration
           custom_vjp barrier's fusion cost
  chunk4   SCAN_CHUNK=4 (smaller differentiated segment)

Round-5 addition: ``fields:a,b,c`` variants differentiate w.r.t. a named
subset of SceneData fields, decomposing the all-leaves gap into parameter
groups (material tables vs geometry tables vs light/medium scalars).

Usage: python tools/bwd_anatomy.py [width] [spp] [variant|all-variants]
"""
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("all", "one", "nosan", "chunk4")
GROUPS = {
    "mat": "color,eta,k,roughness,obj_color,obj_eta,obj_k,obj_roughness",
    "geom": ("position,params,quad_base,quad_edge0,quad_edge1,quad_normal,"
             "quad_area"),
}


def run_one(width, spp, variant):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from photorealistic_rendering_using_opencl_tpu.models import (
        integrator, pathtracer,
    )
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    if variant == "nosan":
        # identity WITHOUT the custom_vjp barrier
        integrator._sanitize_grad = lambda x: x

    cfg, scene = load_scene("scenes/cornell.json")
    label = variant
    if variant == "vgrads":
        # opt-in vertex/normal-table gradients (SceneConfig.
        # mesh_vertex_grads): measures the cost of d(image)/d(vertex)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, mesh_vertex_grads=True)
        variant = "all"
    cam = default_camera(width, width).pytree()
    regen_iters = pathtracer.calibrate_regen_iters(
        cfg, scene, cam, width, width, spp, seed=3)
    px, py = pathtracer.pixel_grid(width, width)

    if variant == "one":
        import dataclasses

        def loss(oc):
            sc = dataclasses.replace(scene, obj_color=oc)
            acc, _, _ = pathtracer.trace_regen_scan(
                cfg, sc, cam, width, width, spp, px, py, 3, regen_iters)
            return jnp.mean(acc)
        arg = scene.obj_color
    elif variant.startswith("fields:"):
        import dataclasses
        names = variant.split(":", 1)[1].split(",")

        def loss(vals):
            sc = dataclasses.replace(scene, **dict(zip(names, vals)))
            acc, _, _ = pathtracer.trace_regen_scan(
                cfg, sc, cam, width, width, spp, px, py, 3, regen_iters)
            return jnp.mean(acc)
        arg = [getattr(scene, n) for n in names]
    else:
        leaves, treedef = jax.tree_util.tree_flatten(scene)
        is_f = [jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
                for l in leaves]
        rest = [l for l, f in zip(leaves, is_f) if not f]

        def loss(f_leaves):
            it_f, it_r = iter(f_leaves), iter(rest)
            merged = [next(it_f) if f else next(it_r) for f in is_f]
            sc = jax.tree_util.tree_unflatten(treedef, merged)
            acc, _, _ = pathtracer.trace_regen_scan(
                cfg, sc, cam, width, width, spp, px, py, 3, regen_iters)
            return jnp.mean(acc)
        arg = [l for l, f in zip(leaves, is_f) if f]

    @jax.jit
    def vg(a):
        val, grad = jax.value_and_grad(loss)(a)
        # single-scalar device reduction: per-leaf grad transfers cost a
        # tunnel round trip apiece (~0.8 s of phantom backward time)
        return val + sum(jnp.sum(g)
                         for g in jax.tree_util.tree_leaves(grad))

    t0 = time.perf_counter()
    compiled = vg.lower(arg).compile()
    compile_s = time.perf_counter() - t0
    mem = compiled.memory_analysis()
    temp = getattr(mem, "temp_size_in_bytes", 0) if mem else 0

    def run():
        return float(compiled(arg))

    run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT variant={label:7s} iters={regen_iters} "
          f"chunk={integrator.SCAN_CHUNK} best={best:.3f}s "
          f"rate={width*width*spp/best:.0f}/s temp={temp/1e9:.2f}GB "
          f"compile={compile_s:.0f}s", flush=True)


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    which = sys.argv[3] if len(sys.argv) > 3 else "all-variants"
    if os.environ.get("PRT_PROBE_CHILD"):
        run_one(width, spp, which)
        return
    if which == "all-variants":
        variants = VARIANTS
    elif which in GROUPS:
        variants = (f"fields:{GROUPS[which]}",)
    else:
        variants = (which,)
    for v in variants:
        env = dict(os.environ, PRT_PROBE_CHILD="1")
        if v == "chunk4":
            env["PRT_SCAN_CHUNK"] = "4"
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(width), str(spp), v], env=env)


if __name__ == "__main__":
    main()

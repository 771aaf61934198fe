"""Probe: full-depth fwd+bwd compile + timing at the north-star shape.

Usage: python tools/fwd_bwd_probe.py [width] [spp] [max_bounces] [method]
(max_bounces 0 = full scene budget; method in {scan, regen_scan})
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    # the axon plugin force-overrides JAX_PLATFORMS; honor the env var
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp
    import numpy as np
    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    method = sys.argv[4] if len(sys.argv) > 4 else "scan"
    cfg, scene = load_scene("scenes/cornell.json")
    if cap:
        cfg = dataclasses.replace(
            cfg, max_bounces=cap,
            max_diff_bounces=min(cfg.max_diff_bounces, cap),
            max_spec_bounces=min(cfg.max_spec_bounces, cap),
            max_trans_bounces=min(cfg.max_trans_bounces, cap))
    cam = default_camera(width, width).pytree()
    regen_iters = 0
    if method == "regen_scan":
        t0 = time.perf_counter()
        regen_iters = pathtracer.calibrate_regen_iters(
            cfg, scene, cam, width, width, spp, seed=3)
        print(f"calibrated regen_iters={regen_iters} "
              f"(vs scan {spp}x{cfg.max_bounces}="
              f"{spp * cfg.max_bounces} steps) "
              f"in {time.perf_counter()-t0:.1f}s", flush=True)
    print("device", jax.devices()[0], "width", width, "spp", spp,
          "bounces", cfg.max_bounces, "method", method, flush=True)

    leaves, treedef = jax.tree_util.tree_flatten(scene)
    is_f = [jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
            for l in leaves]
    f_leaves = [l for l, f in zip(leaves, is_f) if f]
    rest = [l for l, f in zip(leaves, is_f) if not f]

    def loss(f_leaves):
        it_f, it_r = iter(f_leaves), iter(rest)
        merged = [next(it_f) if f else next(it_r) for f in is_f]
        sc = jax.tree_util.tree_unflatten(treedef, merged)
        img, _ = pathtracer.render.__wrapped__(
            cfg, sc, cam, width, width, spp, seed=3, method=method,
            regen_iters=regen_iters)
        return jnp.mean(img)

    vg = jax.jit(jax.value_and_grad(loss))

    t0 = time.perf_counter()
    lowered = vg.lower(f_leaves)
    print(f"lowered in {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    mem = compiled.memory_analysis()
    if mem is not None:
        print("temp", getattr(mem, "temp_size_in_bytes", None),
              "argument", getattr(mem, "argument_size_in_bytes", None),
              "output", getattr(mem, "output_size_in_bytes", None), flush=True)

    def run():
        val, grad = compiled(f_leaves)
        s = float(val) + float(sum(np.asarray(g).sum() for g in grad))
        return s

    t0 = time.perf_counter()
    val, grad = compiled(f_leaves)
    print(f"first run {time.perf_counter()-t0:.2f}s  val {float(val):.5f}",
          flush=True)
    names = [f"leaf{k}" for k in range(len(grad))]
    for nm, g in zip(names, grad):
        a = np.asarray(g)
        bad = (~np.isfinite(a)).sum()
        if bad:
            print(f"  NONFINITE {nm} shape {a.shape}: {bad}/{a.size}",
                  flush=True)
    print("grad l1:",
          float(sum(np.abs(np.asarray(g)).sum() for g in grad)), flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); run()
        best = min(best, time.perf_counter() - t0)
    rate = width * width * spp / best
    print(f"best {best:.3f}s -> {rate:.0f} fwd+bwd samples/s", flush=True)


if __name__ == "__main__":
    main()

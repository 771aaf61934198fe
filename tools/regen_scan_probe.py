"""Sweep the differentiable regen driver's knobs on the real TPU.

Measures, at the flagship fwd+bwd shape (512^2 x 4 spp, full 32-bounce
budget), with the tunnel's fixed dispatch latency amortized by best-of-3:

  * forward-only regen_scan (no grad) -- isolates the fixed-length-scan
    cost from the AD multiplier;
  * fwd+bwd with remat in {segment, body} x SCAN_CHUNK in {8, 16, 32};
  * compiled temp-memory analysis for each variant.

Usage: python tools/regen_scan_probe.py [width] [spp] [mode]
mode in {all, fwd, sweep}.
"""
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(width, spp, chunk, remat, fwd_only):
    """Measure one variant in THIS process (SCAN_CHUNK is baked at import)."""
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

    assert integrator.SCAN_CHUNK == chunk, (integrator.SCAN_CHUNK, chunk)
    cfg, scene = load_scene("scenes/cornell.json")
    cam = default_camera(width, width).pytree()
    regen_iters = pathtracer.calibrate_regen_iters(
        cfg, scene, cam, width, width, spp, seed=3)
    px, py = pathtracer.pixel_grid(width, width)

    leaves, treedef = jax.tree_util.tree_flatten(scene)
    is_f = [jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
            for l in leaves]
    f_leaves = [l for l, f in zip(leaves, is_f) if f]
    rest = [l for l, f in zip(leaves, is_f) if not f]

    def loss(f_leaves):
        it_f, it_r = iter(f_leaves), iter(rest)
        merged = [next(it_f) if f else next(it_r) for f in is_f]
        sc = jax.tree_util.tree_unflatten(treedef, merged)
        acc, _, _ = pathtracer.trace_regen_scan(
            cfg, sc, cam, width, width, spp, px, py, 3, regen_iters,
            remat=remat)
        return jnp.mean(acc)

    fn = jax.jit(loss) if fwd_only else jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    compiled = fn.lower(f_leaves).compile()
    compile_s = time.perf_counter() - t0
    mem = compiled.memory_analysis()
    temp = getattr(mem, "temp_size_in_bytes", None) if mem else None

    def run():
        out = compiled(f_leaves)
        if fwd_only:
            return float(out)
        val, grad = out
        return float(val) + float(sum(np.asarray(g).sum() for g in grad))

    run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    rate = width * width * spp / best
    tag = "fwd-only" if fwd_only else "fwd+bwd "
    print(f"RESULT {tag} chunk={chunk:2d} remat={remat:7s} "
          f"iters={regen_iters} best={best:.3f}s rate={rate:.0f}/s "
          f"temp={temp/1e9 if temp else -1:.2f}GB compile={compile_s:.0f}s",
          flush=True)


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"
    if os.environ.get("PRT_PROBE_CHILD"):
        chunk = int(os.environ["PRT_SCAN_CHUNK"])
        remat = os.environ["PRT_PROBE_REMAT"]
        fwd_only = os.environ["PRT_PROBE_FWD"] == "1"
        run_one(width, spp, chunk, remat, fwd_only)
        return
    variants = []
    if mode in ("all", "fwd"):
        variants.append((8, "segment", True))
    if mode in ("all", "sweep"):
        variants += [(8, "segment", False), (8, "body", False),
                     (16, "segment", False), (32, "segment", False)]
    for chunk, remat, fwd in variants:
        env = dict(os.environ, PRT_PROBE_CHILD="1",
                   PRT_SCAN_CHUNK=str(chunk), PRT_PROBE_REMAT=remat,
                   PRT_PROBE_FWD="1" if fwd else "0")
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(width), str(spp), mode], env=env)


if __name__ == "__main__":
    main()

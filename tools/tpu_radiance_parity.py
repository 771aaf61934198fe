"""End-to-end TPU-vs-CPU radiance parity on the flagship mesh scene.

Round-4 recorded a +0.7% residual (TPU 0.35344 vs CPU-exact 0.35110 at
96^2 x 8 spp) attributed to grazing false-misses and any-hit ordering.
This probe renders the SAME (scene, camera, seed) on the TPU kernel path
and on the CPU exact-f32 XLA path (separate subprocesses: the platform
choice is baked in at trace time) and reports mean/per-pixel deltas --
the committed instrument + bound for VERDICT r5 task #5.

Usage: python tools/tpu_radiance_parity.py [width] [spp]
"""
from __future__ import annotations

import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Documented bound for the DEFAULT (bf16x6 stacked-K) kernel: the known
# +0.85% grazing-population accumulation bias plus margin.  The exact
# escape hatch (PRT_MESH_PRECISION=highest) measures 0.000% and the
# bound for it would be 0.1%; see ops/mesh_brute.py precision caveat and
# PERF.md round-5 for the full decomposition.
BOUND = 0.010


def child(width, spp, platform, out_path):
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if platform == "tpu_xla":
        # exact-f32 tile-scan mesh path ON the TPU: separates pallas-
        # kernel effects from TPU elementwise-arithmetic divergence
        os.environ["PRT_MESH_FORCE_XLA"] = "1"
    import numpy as np

    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import (
        default_camera,
    )
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    cfg, scene = load_scene("scenes/cornell.json")
    cam = default_camera(width, width).pytree()
    img, _ = pathtracer.render(cfg, scene, cam, width, width, spp, seed=5,
                               method="scan")
    np.save(out_path, np.asarray(img))
    print(f"{platform}: mean={np.asarray(img).mean():.5f} "
          f"(device {jax.devices()[0].platform})", flush=True)


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if os.environ.get("PRT_PARITY_CHILD"):
        child(width, spp, os.environ["PRT_PARITY_CHILD"],
              os.environ["PRT_PARITY_OUT"])
        return

    import numpy as np
    paths = {}
    for platform in ("tpu", "tpu_xla", "cpu"):
        out = f"/tmp/radparity_{platform}.npy"
        env = dict(os.environ, PRT_PARITY_CHILD=platform,
                   PRT_PARITY_OUT=out)
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            str(width), str(spp)], env=env)
        if r.returncode == 0 and os.path.exists(out):
            paths[platform] = out
        else:
            print(f"{platform} leg failed (rc={r.returncode})")

    if "cpu" in paths:
        c = np.load(paths["cpu"])
        for name in ("tpu", "tpu_xla"):
            if name not in paths:
                continue
            t = np.load(paths[name])
            rel = abs(t.mean() - c.mean()) / c.mean()
            pix = np.abs(t - c).max()
            frac = (np.abs(t - c).max(axis=-1) > 1e-3).mean()
            print(f"{name} vs cpu: mean rel delta {rel*100:.3f}%  "
                  f"max pixel delta {pix:.4f}  "
                  f"pixels>1e-3: {frac*100:.2f}%")
        if "tpu" in paths and "tpu_xla" in paths:
            t, x = np.load(paths["tpu"]), np.load(paths["tpu_xla"])
            rel = abs(t.mean() - x.mean()) / x.mean()
            print(f"tpu(pallas) vs tpu(xla): mean rel delta {rel*100:.3f}%"
                  " -- the kernel's own share")
        t = np.load(paths["tpu"])
        rel = abs(t.mean() - c.mean()) / c.mean()
        print(f"BOUND: tpu-vs-cpu mean rel delta must stay < "
              f"{BOUND*100:.1f}% ({'PASS' if rel < BOUND else 'FAIL'})")


if __name__ == "__main__":
    main()

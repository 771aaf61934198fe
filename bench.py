"""Benchmark: cornell path-tracing throughput on the available device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md north star): cornell 1024x1024 at 256 spp
forward+backward in <10 s on v5e-8 => 3.355e6 pixel-samples/s/chip.
``vs_baseline`` is measured forward throughput per chip over that target
rate (>1.0 means beating the target).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

BASELINE_SAMPLES_PER_SEC_PER_CHIP = 1024 * 1024 * 256 / 10.0 / 8.0


def main() -> None:
    import jax
    import numpy as np
    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene
    from photorealistic_rendering_using_opencl_tpu.scene.obj import make_icosphere

    on_tpu = jax.devices()[0].platform == "tpu"
    width = height = 1024 if on_tpu else 128
    spp = 16 if on_tpu else 2

    try:
        cfg, scene = load_scene("scenes/cornell.json")
    except FileNotFoundError:
        mesh = make_icosphere(subdiv=2, radius=0.6, center=(0.0, -1.0, 0.0))
        cfg, scene = load_scene("scenes/cornell.json", mesh_override=mesh)
    cam = default_camera(width, height).pytree()

    # warm-up / compile
    img, _ = pathtracer.render(cfg, scene, cam, width, height, spp)
    img.block_until_ready()

    t0 = time.perf_counter()
    reps = 3 if on_tpu else 1
    for r in range(reps):
        img, _ = pathtracer.render(cfg, scene, cam, width, height, spp,
                                   seed=r + 1)
        img.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    samples_per_sec = width * height * spp / dt
    result = {
        "metric": "cornell_pixel_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC_PER_CHIP, 4),
        "detail": {
            "width": width, "height": height, "spp": spp,
            "seconds_per_frame": round(dt, 4),
            "device": str(jax.devices()[0].platform),
            "mean_radiance": float(np.asarray(img).mean()),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

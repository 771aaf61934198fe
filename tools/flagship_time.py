"""Quick flagship timing: cornell 512x512 x 8 spp regen, tunnel-amortized.

Usage: python tools/flagship_time.py [width] [spp] [method]
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from photorealistic_rendering_using_opencl_tpu.models import pathtracer
    from photorealistic_rendering_using_opencl_tpu.ops.camera_rays import default_camera
    from photorealistic_rendering_using_opencl_tpu.scene.loader import load_scene

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    method = sys.argv[3] if len(sys.argv) > 3 else "regen"
    print("device", jax.devices()[0], "width", width, "spp", spp,
          "method", method)
    cfg, scene = load_scene("scenes/cornell.json")
    cam = default_camera(width, width).pytree()

    @functools.partial(jax.jit, static_argnames=("reps",))
    def multi(scene, cam, reps):
        def body(acc, seed):
            img, _ = pathtracer.render.__wrapped__(
                cfg, scene, cam, width, width, spp, seed=seed, method=method)
            return acc + img, None
        acc, _ = jax.lax.scan(body, jnp.zeros((width, width, 3), jnp.float32),
                              jnp.arange(1, reps + 1, dtype=jnp.uint32))
        return acc

    def timed(reps):
        best = float("inf")
        mean = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            mean = float(np.asarray(multi(scene, cam, reps)).mean()) / reps
            best = min(best, time.perf_counter() - t0)
        return best, mean

    t0 = time.perf_counter()
    t1, mean = timed(1)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s  1-rep best {t1:.3f}s  mean {mean:.5f}")
    t2, _ = timed(2)
    per = max(t2 - t1, 1e-9)
    rate = width * width * spp / per
    print(f"2-rep best {t2:.3f}s -> per-frame {per:.3f}s  ({rate/1e6:.3f} M samples/s)")


if __name__ == "__main__":
    main()

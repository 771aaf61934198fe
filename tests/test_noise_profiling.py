"""Value noise / FBM ops and the metrics utility."""
import jax
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.ops.noise import value_fbm, value_noise
from photorealistic_rendering_using_opencl_tpu.utils.profiling import Metrics


def test_value_noise_range_and_determinism():
    p = jnp.asarray(np.random.default_rng(0).uniform(-10, 10, (256, 3)),
                    jnp.float32)
    n1 = value_noise(p)
    n2 = value_noise(p)
    assert n1.shape == (256,)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    assert float(n1.min()) >= 0.0 and float(n1.max()) <= 1.0
    # non-constant
    assert float(n1.std()) > 0.05


def test_value_noise_continuity():
    """Quintic-faded lattice interpolation: tiny step -> tiny change."""
    p = jnp.asarray([[0.4, 1.7, -2.3]], jnp.float32)
    a = value_noise(p)
    b = value_noise(p + 1e-4)
    assert abs(float(a[0] - b[0])) < 1e-2


def test_fbm_jit_and_range():
    p = jnp.asarray(np.random.default_rng(1).uniform(-5, 5, (64, 3)),
                    jnp.float32)
    f = jax.jit(value_fbm)(p)
    assert f.shape == (64,)
    assert float(f.min()) >= 0.0 and float(f.max()) <= 1.0


def test_metrics_spans_and_rates():
    m = Metrics()
    with m.span("render"):
        pass
    m.count("samples", 1000)
    assert "render" in m.report()
    assert m.rate("samples", "render") > 0

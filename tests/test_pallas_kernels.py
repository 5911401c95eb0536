"""Pallas kernel correctness tests (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def octav_numpy(x, dynamic_sym=False):
    abs_x = np.abs(x).ravel()
    data_min, data_max = x.min(), x.max()
    unsigned = 4 if (dynamic_sym and abs(data_min) < 1e-6) else 1
    s_n = abs_x.sum() / max((abs_x > 0).sum(), 1)
    for _ in range(20):
        gt = abs_x > s_n
        s_next = abs_x[gt].sum() / (1 / 4**8 / 3 / unsigned * (~gt).sum() + gt.sum())
        if abs(s_next - s_n) < 1e-6:
            break
        s_n = s_next
    return s_n, data_min, data_max


@pytest.mark.parametrize("n", [100, 1024, 5000])
def test_octav_pallas_interpret(n):
    from dipoorlet_tpu.calib.kernels import octav_pallas
    rng = np.random.RandomState(n)
    x = (rng.randn(n) * 2).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        s, mn, mx = octav_pallas(jnp.asarray(x))
    s_ref, mn_ref, mx_ref = octav_numpy(x)
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-4)
    np.testing.assert_allclose(float(mn), mn_ref, rtol=1e-6)
    np.testing.assert_allclose(float(mx), mx_ref, rtol=1e-6)


def test_octav_pallas_relu_range():
    from dipoorlet_tpu.calib.kernels import octav_pallas
    rng = np.random.RandomState(0)
    x = np.abs(rng.randn(2000)).astype(np.float32)
    x[0] = 0.0
    with pltpu.force_tpu_interpret_mode():
        s, mn, mx = octav_pallas(jnp.asarray(x), dynamic_sym=True)
    s_ref, mn_ref, mx_ref = octav_numpy(x, dynamic_sym=True)
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-4)

"""Pure-functional fake quantization for JAX programs.

Used by the reconstruction passes (AdaRound/BRECQ/QDrop/sparse) in place
of the reference's torch-side quant_weight/quant_acti
(/root/reference/dipoorlet/weight_transform/ada_quant_layer.py:28-50).

Gradient semantics mirror torch:
  * `fake_quant` (round) has zero gradient through the rounding path —
    QDrop relies on the fp-mix path for gradient flow;
  * `fake_quant_ste` uses a straight-through estimator (custom_vjp), the
    analogue of sparse_quant_layer.py:9-17.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _reshape_qp(scale, x_ndim, channel_axis):
    scale = jnp.asarray(scale)
    if scale.ndim == 0 or scale.size == 1:
        return scale.reshape(())
    shape = [1] * x_ndim
    shape[channel_axis] = -1
    return scale.reshape(shape)


def fake_quant(x, scale, zero_point, q_min, q_max, channel_axis=0):
    """round(x/s) + zp, clamp, dequant. Zero gradient through round."""
    s = _reshape_qp(scale, x.ndim, channel_axis)
    zp = _reshape_qp(zero_point, x.ndim, channel_axis).astype(x.dtype)
    lo = _reshape_qp(q_min, x.ndim, channel_axis).astype(x.dtype)
    hi = _reshape_qp(q_max, x.ndim, channel_axis).astype(x.dtype)
    q = jnp.round(x / s) + zp
    q = jnp.clip(q, lo + zp, hi + zp)
    return (q - zp) * s


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


_ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def ste_round(x):
    return _ste_round(x)


def fake_quant_ste(x, scale, zero_point, q_min, q_max, channel_axis=0):
    """Straight-through fake quant: gradient passes through rounding."""
    s = _reshape_qp(scale, x.ndim, channel_axis)
    zp = _reshape_qp(zero_point, x.ndim, channel_axis).astype(x.dtype)
    lo = _reshape_qp(q_min, x.ndim, channel_axis).astype(x.dtype)
    hi = _reshape_qp(q_max, x.ndim, channel_axis).astype(x.dtype)
    q = _ste_round(x / s) + zp
    q = jnp.clip(q, lo + zp, hi + zp)
    return (q - zp) * s


def quant_acti(x, scale, q_min, q_max, prob, key=None):
    """Activation fake-quant with QDrop element mix
    (ada_quant_layer.py:28-36): with probability `prob` use quantized,
    else original. prob=1.0 -> always quantized."""
    s = jnp.asarray(scale)
    xq = jnp.round(x / s)
    xq = jnp.maximum(xq, jnp.asarray(q_min, x.dtype))
    xq = jnp.minimum(xq, jnp.asarray(q_max, x.dtype))
    xq = xq * s
    if prob < 1.0:
        assert key is not None, "quant_acti with prob<1 needs a PRNG key"
        mask = jax.random.uniform(key, x.shape) < prob
        xq = jnp.where(mask, xq, x)
    return xq

"""AdaRound soft-rounding math (JAX).

Behavioral port of /root/reference/dipoorlet/weight_transform/
ada_quant_layer.py:39-130: rectified sigmoid, beta-annealed rounding
regularizer with cosine TempDecay (20 -> 2, starting at 20% of total
iterations), soft/hard weight quantization, and the L2 reconstruction
loss."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

ZETA = 1.1
GAMMA = -0.1
ALPHA = 0.01


def rectified_sigmoid(mask):
    return jnp.clip((ZETA - GAMMA) * jax_sigmoid(mask) + GAMMA, 0.0, 1.0)


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def init_round_mask(rest):
    """Invert the rectified sigmoid at the fractional part
    (ada_quant_layer.py:156-158)."""
    rest = jnp.clip(rest, 1e-6, 1.0 - 1e-6)  # guard logits at exact 0/1
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def temp_decay_beta(t, t_max, rel_start_decay=0.2, start_b=20.0, end_b=2.0):
    """Cosine beta annealing (ada_quant_layer.py:117-130). Returns 0.0
    before the decay starts (which zeroes the regularizer: x^0 == 1)."""
    start = rel_start_decay * t_max
    rel_t = (t - start) / (t_max - start)
    beta = end_b + 0.5 * (start_b - end_b) * (1.0 + jnp.cos(rel_t * np.pi))
    return jnp.where(t < start, 0.0, beta)


def adaround_reg(mask, t, t_max):
    """alpha * sum(1 - |2(h(mask) - 0.5)|^beta); 0 before decay starts
    (reference zeroes round_loss pre-decay, ada_quant_layer.py:104-106).

    The pre-decay zero must NOT be expressed as x^0 == 1: at h == 0.5
    (x == 0, e.g. a weight whose fractional part is exactly 0.5) the
    gradient of x^0 is 0 * x^-1 == NaN, which Adam propagates into the
    mask permanently.  Clamp beta to its post-decay floor of 2 inside the
    power (grad at x=0 is then 0) and select the branch with where()."""
    beta = temp_decay_beta(t, t_max)
    h = rectified_sigmoid(mask)
    reg = ALPHA * jnp.sum(1.0 - jnp.power(jnp.abs(h - 0.5) * 2.0,
                                          jnp.maximum(beta, 2.0)))
    return jnp.where(beta > 0.0, reg, 0.0)


def _qp_broadcast(v, ndim):
    v = jnp.asarray(v, dtype=jnp.float32)
    if v.ndim == 0 or v.size == 1:
        return v.reshape(())
    return v.reshape((-1,) + (1,) * (ndim - 1))


def soft_quant_weight(weight, mask, scale, q_min, q_max, per_channel):
    """floor(w/s) + h(mask), clamp, rescale (ada_quant_layer.py:39-50)."""
    s = _qp_broadcast(scale, weight.ndim)
    lo = _qp_broadcast(q_min, weight.ndim)
    hi = _qp_broadcast(q_max, weight.ndim)
    w = jnp.floor(weight / s) + rectified_sigmoid(mask)
    w = jnp.maximum(w, lo)
    w = jnp.minimum(w, hi)
    return w * s


def hard_quant_weight(weight, mask, scale, q_min, q_max, per_channel):
    s = _qp_broadcast(scale, weight.ndim)
    lo = _qp_broadcast(q_min, weight.ndim)
    hi = _qp_broadcast(q_max, weight.ndim)
    w = jnp.floor(weight / s) + (mask >= 0).astype(weight.dtype)
    w = jnp.maximum(w, lo)
    w = jnp.minimum(w, hi)
    return w * s


def weight_rest(weight, scale):
    """Fractional part of w/s — the soft-round initialization target."""
    s = _qp_broadcast(scale, weight.ndim)
    t = weight / s
    return t - jnp.floor(t)

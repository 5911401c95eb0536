"""QuantizeLinear / DequantizeLinear execution (for running QDQ graphs).

Semantics follow onnxruntime: round-half-to-even, saturating cast.
These execute the fake-quant graphs produced by dipoorlet_tpu.quant
(analogous to the reference running QDQ models through ORT,
/root/reference/dipoorlet/quantize.py:197-239)."""
from __future__ import annotations

import jax.numpy as jnp

from .registry import register


def _axis_shape(scale, x_ndim, axis):
    if scale.ndim == 0 or scale.size == 1:
        return scale.reshape(())
    shape = [1] * x_ndim
    shape[axis] = -1
    return scale.reshape(shape)


@register("QuantizeLinear")
def quantize_linear(ctx, x, scale, zero_point=None):
    axis = ctx.attrs.get("axis", 1)
    if axis < 0:
        axis += x.ndim
    s = _axis_shape(scale, x.ndim, axis)
    if zero_point is not None:
        zp = _axis_shape(zero_point, x.ndim, axis).astype(jnp.float32)
        qmin, qmax = ((-128.0, 127.0) if zero_point.dtype == jnp.int8 else (0.0, 255.0))
        out_dtype = zero_point.dtype
    else:
        zp = 0.0
        qmin, qmax = 0.0, 255.0
        out_dtype = jnp.uint8
    q = jnp.round(x / s) + zp
    return jnp.clip(q, qmin, qmax).astype(out_dtype)


@register("DequantizeLinear")
def dequantize_linear(ctx, x, scale, zero_point=None):
    axis = ctx.attrs.get("axis", 1)
    if axis < 0:
        axis += x.ndim
    s = _axis_shape(scale, x.ndim, axis)
    xf = x.astype(jnp.float32)
    if zero_point is not None:
        xf = xf - _axis_shape(zero_point, x.ndim, axis).astype(jnp.float32)
    return xf * s

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


@register("QLinearConv")
def qlinear_conv(ctx, x, x_scale, x_zp, w, w_scale, w_zp, y_scale, y_zp, b=None):
    """Integer conv with float emulation: dequantize, conv, requantize.
    Numerics match ORT's reference within rounding."""
    from .nn import conv
    xf = dequantize_linear(ctx, x, x_scale, x_zp)
    wctx_axis = 0
    w_axis_ctx = OpContextWithAxis(ctx, wctx_axis)
    wf = dequantize_linear(w_axis_ctx, w, w_scale, w_zp)
    bf = None
    if b is not None:
        bias_scale = (jnp.asarray(x_scale, jnp.float32).reshape(()) *
                      jnp.asarray(w_scale, jnp.float32).reshape(-1))
        bf = b.astype(jnp.float32) * bias_scale
    y = conv(ctx, xf, wf, bf)
    return quantize_linear(ctx, y, y_scale, y_zp)


@register("QLinearMatMul")
def qlinear_matmul(ctx, a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp):
    af = dequantize_linear(ctx, a, a_scale, a_zp)
    bf = dequantize_linear(ctx, b, b_scale, b_zp)
    y = jnp.matmul(af, bf, preferred_element_type=jnp.float32)
    return quantize_linear(ctx, y, y_scale, y_zp)


class OpContextWithAxis:
    """Context proxy overriding the per-channel axis (weights use axis 0)."""

    def __init__(self, ctx, axis):
        self.attrs = dict(ctx.attrs)
        self.attrs["axis"] = axis
        self.node = ctx.node
        self.statics = ctx.statics
        self.opset = ctx.opset

"""QuantizeLinear / DequantizeLinear execution (for running QDQ graphs).

Semantics follow onnxruntime: round-half-to-even, saturating cast.
These execute the fake-quant graphs produced by dipoorlet_tpu.quant
(analogous to the reference running QDQ models through ORT,
/root/reference/dipoorlet/quantize.py:197-239)."""
from __future__ import annotations

import jax
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


def _dq(ctx, x, s, zp):
    return dequantize_linear(ctx, x, s, zp)


@register("QLinearAdd")
def qlinear_add(ctx, a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp):
    """com.microsoft QLinearAdd: float-emulated (dequant, add, requant) —
    matches ORT within rounding."""
    return quantize_linear(ctx, _dq(ctx, a, a_s, a_zp) + _dq(ctx, b, b_s, b_zp),
                           y_s, y_zp)


@register("QLinearMul")
def qlinear_mul(ctx, a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp):
    return quantize_linear(ctx, _dq(ctx, a, a_s, a_zp) * _dq(ctx, b, b_s, b_zp),
                           y_s, y_zp)


@register("QLinearAveragePool")
def qlinear_average_pool(ctx, x, x_s, x_zp, y_s, y_zp):
    from .nn import average_pool
    return quantize_linear(ctx, average_pool(ctx, _dq(ctx, x, x_s, x_zp)),
                           y_s, y_zp)


@register("QLinearGlobalAveragePool")
def qlinear_global_average_pool(ctx, x, x_s, x_zp, y_s, y_zp):
    from .nn import global_average_pool
    return quantize_linear(ctx, global_average_pool(ctx, _dq(ctx, x, x_s, x_zp)),
                           y_s, y_zp)


@register("QLinearSigmoid")
def qlinear_sigmoid(ctx, x, x_s, x_zp, y_s, y_zp):
    return quantize_linear(ctx, jax.nn.sigmoid(_dq(ctx, x, x_s, x_zp)),
                           y_s, y_zp)


@register("QLinearLeakyRelu")
def qlinear_leaky_relu(ctx, x, x_s, x_zp, y_s, y_zp):
    alpha = ctx.attrs.get("alpha", 0.01)
    xf = _dq(ctx, x, x_s, x_zp)
    return quantize_linear(ctx, jnp.where(xf >= 0, xf, alpha * xf), y_s, y_zp)


@register("QLinearConcat")
def qlinear_concat(ctx, y_s, y_zp, *parts):
    """Inputs after (Y_scale, Y_zp) come in (tensor, scale, zp) triples."""
    axis = ctx.attrs.get("axis", 1)
    fps = [_dq(ctx, parts[i], parts[i + 1], parts[i + 2])
           for i in range(0, len(parts), 3)]
    return quantize_linear(ctx, jnp.concatenate(fps, axis=axis), y_s, y_zp)


@register("QGemm")
def qgemm(ctx, a, a_s, a_zp, b, b_s, b_zp, c=None, y_s=None, y_zp=None):
    """com.microsoft QGemm: y = alpha*op(A)op(B) + C with C int32 at scale
    alpha*a_scale*b_scale (beta pre-folded by the exporter).  With
    y_scale/y_zp present the output is requantized, else fp32."""
    alpha = float(ctx.attrs.get("alpha", 1.0))
    af = _dq(ctx, a, a_s, a_zp)
    bf = _dq(ctx, b, b_s, b_zp)
    if ctx.attrs.get("transA", 0):
        af = jnp.swapaxes(af, -1, -2)
    if ctx.attrs.get("transB", 0):
        bf = jnp.swapaxes(bf, -1, -2)
    y = alpha * jnp.matmul(af, bf, preferred_element_type=jnp.float32)
    if c is not None:
        c_scale = (alpha * jnp.asarray(a_s, jnp.float32).reshape(())
                   * jnp.asarray(b_s, jnp.float32).reshape(-1))
        y = y + c.astype(jnp.float32) * c_scale
    if y_s is None:
        return y
    return quantize_linear(ctx, y, y_s, y_zp)

"""Elementwise / binary / reduction ops (ONNX semantics, JAX impl)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .registry import register


def _unary(op_type, fn):
    @register(op_type)
    def _op(ctx, x, _fn=fn):
        return _fn(x)
    _op.__name__ = op_type.lower()
    return _op


_unary("Relu", lambda x: jnp.maximum(x, 0))
_unary("Sigmoid", lambda x: lax.logistic(x))
_unary("Tanh", jnp.tanh)
_unary("Abs", jnp.abs)
_unary("Neg", jnp.negative)
_unary("Exp", jnp.exp)
_unary("Log", jnp.log)
_unary("Sqrt", jnp.sqrt)
_unary("Reciprocal", lambda x: 1.0 / x)
_unary("Floor", jnp.floor)
_unary("Ceil", jnp.ceil)
_unary("Round", jnp.round)  # round-half-to-even, matches ORT
_unary("Erf", lax.erf)
_unary("Sign", jnp.sign)
_unary("Softplus", lambda x: jnp.logaddexp(x, 0.0))
_unary("Sin", jnp.sin)
_unary("Cos", jnp.cos)
_unary("Not", jnp.logical_not)
_unary("IsNaN", jnp.isnan)


@register("LeakyRelu")
def leaky_relu(ctx, x):
    alpha = ctx.attrs.get("alpha", 0.01)
    return jnp.where(x >= 0, x, alpha * x)


@register("PRelu")
def prelu(ctx, x, slope):
    if slope.ndim == 1 and slope.size > 1 and x.ndim > 2:
        # per-channel slope over NCHW layouts
        slope = slope.reshape((1, -1) + (1,) * (x.ndim - 2))
    return jnp.where(x >= 0, x, slope * x)


@register("Elu")
def elu(ctx, x):
    alpha = ctx.attrs.get("alpha", 1.0)
    return jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1.0))


@register("HardSigmoid")
def hard_sigmoid(ctx, x):
    alpha = ctx.attrs.get("alpha", 0.2)
    beta = ctx.attrs.get("beta", 0.5)
    return jnp.clip(alpha * x + beta, 0.0, 1.0)


@register("HardSwish")
def hard_swish(ctx, x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


@register("Gelu")
def gelu(ctx, x):
    approx = ctx.attrs.get("approximate", b"none")
    if isinstance(approx, bytes):
        approx = approx.decode()
    if approx == "tanh":
        return 0.5 * x * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))
    return 0.5 * x * (1.0 + lax.erf(x / np.sqrt(2.0)))


@register("Clip")
def clip(ctx, x, min_val=None, max_val=None):
    # opset >= 11: min/max are inputs; older: attributes
    if min_val is None:
        min_val = ctx.attrs.get("min")
    if max_val is None:
        max_val = ctx.attrs.get("max")
    if min_val is not None:
        x = jnp.maximum(x, min_val)
    if max_val is not None:
        x = jnp.minimum(x, max_val)
    return x


@register("Softmax")
def softmax(ctx, x):
    axis = ctx.attrs.get("axis", -1)
    if ctx.opset < 13 and "axis" not in ctx.attrs:
        axis = 1
    if ctx.opset < 13:
        # legacy semantics: flatten to 2D at axis
        shape = x.shape
        if axis < 0:
            axis += x.ndim
        flat = x.reshape((int(np.prod(shape[:axis])), -1))
        m = jnp.max(flat, axis=1, keepdims=True)
        e = jnp.exp(flat - m)
        return (e / jnp.sum(e, axis=1, keepdims=True)).reshape(shape)
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


@register("LogSoftmax")
def log_softmax(ctx, x):
    axis = ctx.attrs.get("axis", -1)
    m = jnp.max(x, axis=axis, keepdims=True)
    s = x - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=axis, keepdims=True))


def _binary(op_type, fn):
    @register(op_type)
    def _op(ctx, a, b, _fn=fn):
        return _fn(a, b)
    _op.__name__ = op_type.lower()
    return _op


_binary("Add", jnp.add)
_binary("Sub", jnp.subtract)
_binary("Mul", jnp.multiply)
_binary("Div", lambda a, b: jnp.divide(a, b) if jnp.issubdtype(a.dtype, jnp.floating)
        else jnp.sign(a) * jnp.sign(b) * (jnp.abs(a) // jnp.abs(b)))  # C-style int div
_binary("Pow", lambda a, b: jnp.power(a, b.astype(a.dtype)))
_binary("Equal", jnp.equal)
_binary("Greater", jnp.greater)
_binary("GreaterOrEqual", jnp.greater_equal)
_binary("Less", jnp.less)
_binary("LessOrEqual", jnp.less_equal)
_binary("And", jnp.logical_and)
_binary("Or", jnp.logical_or)
_binary("Xor", jnp.logical_xor)
_binary("Mod", lambda a, b: jnp.fmod(a, b))


@register("Min")
def minimum(ctx, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.minimum(out, x)
    return out


@register("Max")
def maximum(ctx, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.maximum(out, x)
    return out


@register("Sum")
def op_sum(ctx, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out


@register("Mean")
def op_mean(ctx, *xs):
    return op_sum(ctx, *xs) / float(len(xs))


@register("Where")
def where(ctx, cond, a, b):
    return jnp.where(cond, a, b)


# -- reductions -------------------------------------------------------------
def _reduce(op_type, fn, allow_axes_input=True):
    @register(op_type, static_inputs=(1,) if allow_axes_input else ())
    def _op(ctx, x, axes=None, _fn=fn):
        if axes is None:
            axes = ctx.attrs.get("axes")
        if axes is not None:
            axes = tuple(int(a) for a in np.asarray(axes).reshape(-1))
            if len(axes) == 0:
                axes = None
        keepdims = bool(ctx.attrs.get("keepdims", 1))
        if axes is None and ctx.attrs.get("noop_with_empty_axes", 0):
            return x
        return _fn(x, axis=axes, keepdims=keepdims)
    _op.__name__ = op_type.lower()
    return _op


_reduce("ReduceMean", jnp.mean)
_reduce("ReduceSum", jnp.sum)
_reduce("ReduceMax", jnp.max)
_reduce("ReduceMin", jnp.min)
_reduce("ReduceProd", jnp.prod)
_reduce("ReduceL2", lambda x, axis, keepdims: jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)))
_reduce("ReduceL1", lambda x, axis, keepdims: jnp.sum(jnp.abs(x), axis=axis, keepdims=keepdims))
_reduce("ReduceSumSquare", lambda x, axis, keepdims: jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims))
_reduce("ReduceLogSumExp", lambda x, axis, keepdims: jnp.log(jnp.sum(jnp.exp(x), axis=axis, keepdims=keepdims)))


@register("ArgMax")
def argmax(ctx, x):
    axis = ctx.attrs.get("axis", 0)
    keepdims = bool(ctx.attrs.get("keepdims", 1))
    out = jnp.argmax(x, axis=axis)
    if keepdims:
        out = jnp.expand_dims(out, axis)
    return out.astype(jnp.int64)


@register("ArgMin")
def argmin(ctx, x):
    axis = ctx.attrs.get("axis", 0)
    keepdims = bool(ctx.attrs.get("keepdims", 1))
    out = jnp.argmin(x, axis=axis)
    if keepdims:
        out = jnp.expand_dims(out, axis)
    return out.astype(jnp.int64)


# -- long-tail ONNX ops (ORT-breadth parity; reference runs them via
# onnxruntime, forward_net.py:195-201) ------------------------------------
_unary("Tan", jnp.tan)
_unary("Atan", jnp.arctan)
_unary("Asin", jnp.arcsin)
_unary("Acos", jnp.arccos)
_unary("Sinh", jnp.sinh)
_unary("Cosh", jnp.cosh)
_unary("Asinh", jnp.arcsinh)
_unary("Acosh", jnp.arccosh)
_unary("Atanh", jnp.arctanh)
_unary("Softsign", lambda x: x / (1.0 + jnp.abs(x)))
_unary("Mish", lambda x: x * jnp.tanh(jnp.logaddexp(x, 0.0)))
_unary("IsInf", jnp.isinf)

_reduce("ReduceLogSum",
        lambda x, axis, keepdims: jnp.log(jnp.sum(x, axis=axis, keepdims=keepdims)))


@register("Selu")
def selu(ctx, x):
    alpha = float(ctx.attrs.get("alpha", 1.67326319217681884765625))
    gamma = float(ctx.attrs.get("gamma", 1.05070102214813232421875))
    return gamma * jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


@register("Celu")
def celu(ctx, x):
    alpha = float(ctx.attrs.get("alpha", 1.0))
    return jnp.maximum(x, 0) + jnp.minimum(0.0, alpha * (jnp.exp(x / alpha) - 1.0))


@register("ThresholdedRelu")
def thresholded_relu(ctx, x):
    alpha = float(ctx.attrs.get("alpha", 1.0))
    return jnp.where(x > alpha, x, 0.0)


@register("Shrink")
def shrink(ctx, x):
    lambd = float(ctx.attrs.get("lambd", 0.5))
    bias = float(ctx.attrs.get("bias", 0.0))
    return jnp.where(x < -lambd, x + bias, jnp.where(x > lambd, x - bias, 0.0))


@register("BitShift")
def bit_shift(ctx, x, y):
    d = ctx.attrs.get("direction", "LEFT")
    if isinstance(d, bytes):
        d = d.decode()
    return jnp.left_shift(x, y) if d.upper() == "LEFT" else jnp.right_shift(x, y)


@register("CumSum", static_inputs=(1,))
def cumsum(ctx, x, axis):
    ax = int(np.asarray(axis).reshape(-1)[0])
    out = jnp.cumsum(jnp.flip(x, ax) if ctx.attrs.get("reverse", 0) else x, axis=ax)
    if ctx.attrs.get("reverse", 0):
        out = jnp.flip(out, ax)
    if ctx.attrs.get("exclusive", 0):
        # `out` is back in the original orientation at this point, so the
        # exclusive correction subtracts x as-is for BOTH directions:
        # reverse+exclusive([1,2,3]) = [6,5,3] - [1,2,3] = [5,3,0].
        out = out - x
    return out


@register("Hardmax")
def hardmax(ctx, x):
    axis = int(ctx.attrs.get("axis", -1))
    idx = jnp.argmax(x, axis=axis, keepdims=True)
    return (jnp.arange(x.shape[axis]).reshape(
        [-1 if i == axis % x.ndim else 1 for i in range(x.ndim)]) == idx
    ).astype(x.dtype)


@register("MeanVarianceNormalization")
def mean_variance_normalization(ctx, x):
    axes = tuple(int(a) for a in ctx.attrs.get("axes", [0, 2, 3]))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.sqrt(jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True))
    return (x - mean) / (std + 1e-9)


@register("LpNormalization")
def lp_normalization(ctx, x):
    axis = int(ctx.attrs.get("axis", -1))
    p = int(ctx.attrs.get("p", 2))
    if p == 1:
        n = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    else:
        n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, 1e-12)


@register("Einsum")
def einsum(ctx, *inputs):
    eq = ctx.attrs.get("equation")
    if isinstance(eq, bytes):
        eq = eq.decode()
    return jnp.einsum(eq, *inputs)

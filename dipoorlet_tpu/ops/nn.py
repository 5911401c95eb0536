"""Conv / pooling / normalization / matmul ops (ONNX semantics, JAX impl).

Behavioral reference: onnxruntime's op semantics as exercised by the
reference's forward passes (/root/reference/dipoorlet/forward_net.py).
All kernels map onto the MXU via lax.conv_general_dilated / dot_general
with preferred_element_type=float32.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .registry import register


def _resolve_auto_pad(auto_pad, in_spatial, kernel, strides, dilations):
    """Return [(lo, hi), ...] per spatial dim for SAME_UPPER/SAME_LOWER."""
    pads = []
    for i, (s, k, st, d) in enumerate(zip(in_spatial, kernel, strides, dilations)):
        eff_k = (k - 1) * d + 1
        out = -(-s // st)  # ceil
        total = max(0, (out - 1) * st + eff_k - s)
        if auto_pad == "SAME_UPPER":
            pads.append((total // 2, total - total // 2))
        else:
            pads.append((total - total // 2, total // 2))
    return pads


def _conv_pads(ctx, n_spatial, in_spatial, kernel, strides, dilations):
    auto_pad = ctx.attrs.get("auto_pad", b"NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad in ("NOTSET", ""):
        pads = ctx.attrs.get("pads", [0] * (2 * n_spatial))
        return [(pads[i], pads[i + n_spatial]) for i in range(n_spatial)]
    if auto_pad == "VALID":
        return [(0, 0)] * n_spatial
    return _resolve_auto_pad(auto_pad, in_spatial, kernel, strides, dilations)


@register("Conv")
def conv(ctx, x, w, b=None):
    n_spatial = x.ndim - 2
    kernel = ctx.attrs.get("kernel_shape", list(w.shape[2:]))
    strides = ctx.attrs.get("strides", [1] * n_spatial)
    dilations = ctx.attrs.get("dilations", [1] * n_spatial)
    group = ctx.attrs.get("group", 1)
    pads = _conv_pads(ctx, n_spatial, x.shape[2:], kernel, strides, dilations)
    spatial = "DHW"[3 - n_spatial:]
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    (f"NC{spatial}", f"OI{spatial}", f"NC{spatial}"))
    out = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads,
        rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=group,
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * n_spatial)
    return out.astype(x.dtype)


@register("ConvTranspose")
def conv_transpose(ctx, x, w, b=None):
    # ONNX ConvTranspose: w layout (C_in, C_out/group, *kernel)
    n_spatial = x.ndim - 2
    kernel = ctx.attrs.get("kernel_shape", list(w.shape[2:]))
    strides = ctx.attrs.get("strides", [1] * n_spatial)
    dilations = ctx.attrs.get("dilations", [1] * n_spatial)
    group = ctx.attrs.get("group", 1)
    output_padding = ctx.attrs.get("output_padding", [0] * n_spatial)
    auto_pad = ctx.attrs.get("auto_pad", b"NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if "output_shape" in ctx.attrs:
        out_shape = ctx.attrs["output_shape"]
        total_pads = []
        for i in range(n_spatial):
            total = strides[i] * (x.shape[2 + i] - 1) + output_padding[i] + \
                ((kernel[i] - 1) * dilations[i] + 1) - out_shape[i]
            total_pads.append(max(total, 0))
        pads = [(t // 2, t - t // 2) for t in total_pads]
    elif auto_pad in ("NOTSET", ""):
        p = ctx.attrs.get("pads", [0] * (2 * n_spatial))
        pads = [(p[i], p[i + n_spatial]) for i in range(n_spatial)]
    else:
        total_pads = []
        for i in range(n_spatial):
            total = strides[i] * (x.shape[2 + i] - 1) + output_padding[i] + \
                ((kernel[i] - 1) * dilations[i] + 1) - strides[i] * x.shape[2 + i]
            total_pads.append(max(total, 0))
        if auto_pad == "SAME_UPPER":
            pads = [(t // 2, t - t // 2) for t in total_pads]
        else:
            pads = [(t - t // 2, t // 2) for t in total_pads]

    # Transposed conv == lhs-dilated conv with flipped, transposed kernel.
    # Padding per dim: (eff_k - 1 - pad_lo, eff_k - 1 - pad_hi + output_padding).
    if group > 1:
        cin = w.shape[0]
        w = w.reshape((group, cin // group) + w.shape[1:])  # (g, cin/g, cout/g, *k)
        w = jnp.swapaxes(w, 1, 2)                            # (g, cout/g, cin/g, *k)
        w = w.reshape((-1,) + w.shape[2:])                   # (cout, cin/g, *k)
    else:
        w = jnp.swapaxes(w, 0, 1)
    w = jnp.flip(w, axis=tuple(range(2, 2 + n_spatial)))
    conv_pads = []
    for i in range(n_spatial):
        eff_k = (kernel[i] - 1) * dilations[i] + 1
        conv_pads.append((eff_k - 1 - pads[i][0],
                          eff_k - 1 - pads[i][1] + output_padding[i]))
    spatial = "DHW"[3 - n_spatial:]
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    (f"NC{spatial}", f"OI{spatial}", f"NC{spatial}"))
    out = lax.conv_general_dilated(
        x, w, window_strides=[1] * n_spatial, padding=conv_pads,
        lhs_dilation=strides, rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=group,
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * n_spatial)
    return out.astype(x.dtype)


@register("Gemm")
def gemm(ctx, a, b, c=None):
    alpha = ctx.attrs.get("alpha", 1.0)
    beta = ctx.attrs.get("beta", 1.0)
    if ctx.attrs.get("transA", 0):
        a = a.T
    if ctx.attrs.get("transB", 0):
        b = b.T
    y = alpha * jnp.dot(a, b, preferred_element_type=jnp.float32)
    if c is not None:
        y = y + beta * c
    return y.astype(a.dtype)


@register("MatMul")
def matmul(ctx, a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


@register("BatchNormalization")
def batch_norm(ctx, x, scale, bias, mean, var):
    eps = ctx.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    return ((x - mean.reshape(shape)) * (scale * inv).reshape(shape)
            + bias.reshape(shape)).astype(x.dtype)


@register("InstanceNormalization")
def instance_norm(ctx, x, scale, bias):
    eps = ctx.attrs.get("epsilon", 1e-5)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean) * lax.rsqrt(var + eps) * scale.reshape(shape) + bias.reshape(shape)).astype(x.dtype)


@register("LayerNormalization")
def layer_norm(ctx, x, scale, bias=None):
    eps = ctx.attrs.get("epsilon", 1e-5)
    axis = ctx.attrs.get("axis", -1)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps) * scale
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def _pool_out_and_pads(ctx, in_spatial, kernel, strides, dilations):
    """Resolve padding incl. ceil_mode (extra high-side padding)."""
    n_spatial = len(kernel)
    pads = _conv_pads(ctx, n_spatial, in_spatial, kernel, strides, dilations)
    if ctx.attrs.get("ceil_mode", 0):
        new_pads = []
        for i in range(n_spatial):
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            padded = in_spatial[i] + pads[i][0] + pads[i][1]
            out_ceil = -(-(padded - eff_k) // strides[i]) + 1
            # ORT clamps so the last window starts inside the padded input
            if (out_ceil - 1) * strides[i] >= in_spatial[i] + pads[i][0]:
                out_ceil -= 1
            needed = (out_ceil - 1) * strides[i] + eff_k - padded
            new_pads.append((pads[i][0], pads[i][1] + max(0, needed)))
        pads = new_pads
    return pads


@register("MaxPool")
def max_pool(ctx, x):
    n_spatial = x.ndim - 2
    kernel = ctx.attrs["kernel_shape"]
    strides = ctx.attrs.get("strides", [1] * n_spatial)
    dilations = ctx.attrs.get("dilations", [1] * n_spatial)
    pads = _pool_out_and_pads(ctx, x.shape[2:], kernel, strides, dilations)
    # identity for max: -inf for floats, dtype-min for ints (the int8/uint8
    # passthrough MaxPool the QOperator exporter emits runs here directly)
    if jnp.issubdtype(x.dtype, jnp.integer):
        ident = jnp.array(jnp.iinfo(x.dtype).min, dtype=x.dtype)
    else:
        ident = jnp.array(-jnp.inf, dtype=x.dtype)
    out = lax.reduce_window(
        x, ident, lax.max,
        window_dimensions=(1, 1) + tuple(kernel),
        window_strides=(1, 1) + tuple(strides),
        padding=((0, 0), (0, 0)) + tuple(pads),
        window_dilation=(1, 1) + tuple(dilations))
    return out


@register("AveragePool")
def average_pool(ctx, x):
    n_spatial = x.ndim - 2
    kernel = ctx.attrs["kernel_shape"]
    strides = ctx.attrs.get("strides", [1] * n_spatial)
    dilations = ctx.attrs.get("dilations", [1] * n_spatial)
    count_include_pad = ctx.attrs.get("count_include_pad", 0)
    pads = _pool_out_and_pads(ctx, x.shape[2:], kernel, strides, dilations)
    window = (1, 1) + tuple(kernel)
    stride = (1, 1) + tuple(strides)
    padding = ((0, 0), (0, 0)) + tuple(pads)
    dil = (1, 1) + tuple(dilations)
    summed = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add, window, stride, padding,
                               window_dilation=dil)
    if count_include_pad:
        divisor = float(np.prod(kernel))
        out = summed / divisor
    else:
        ones = jnp.ones(x.shape[2:], dtype=jnp.float32)[None, None]
        counts = lax.reduce_window(ones, 0.0, lax.add, window, stride, padding,
                                   window_dilation=dil)
        out = summed / counts
    return out.astype(x.dtype)


@register("GlobalAveragePool")
def global_average_pool(ctx, x):
    return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)


@register("GlobalMaxPool")
def global_max_pool(ctx, x):
    return jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)


@register("LRN")
def lrn(ctx, x):
    size = ctx.attrs["size"]
    alpha = ctx.attrs.get("alpha", 1e-4)
    beta = ctx.attrs.get("beta", 0.75)
    bias = ctx.attrs.get("bias", 1.0)
    sq = jnp.square(x)
    lo = (size - 1) // 2
    hi = size - 1 - lo
    sq_t = jnp.moveaxis(sq, 1, -1)
    window = lax.reduce_window(sq_t, 0.0, lax.add,
                               (1,) * (x.ndim - 1) + (size,),
                               (1,) * x.ndim,
                               ((0, 0),) * (x.ndim - 1) + ((lo, hi),))
    window = jnp.moveaxis(window, -1, 1)
    return x / jnp.power(bias + alpha / size * window, beta)


@register("GroupNormalization")
def group_norm(ctx, x, scale, bias):
    eps = ctx.attrs.get("epsilon", 1e-5)
    groups = ctx.attrs["num_groups"]
    n, c = x.shape[0], x.shape[1]
    xg = x.reshape((n, groups, c // groups) + x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    y = ((xg - mean) * lax.rsqrt(var + eps)).reshape(x.shape)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (y * scale.reshape(shape) + bias.reshape(shape)).astype(x.dtype)


@register("Einsum")
def einsum(ctx, *xs):
    eq = ctx.attrs["equation"]
    if isinstance(eq, bytes):
        eq = eq.decode()
    return jnp.einsum(eq, *xs, preferred_element_type=jnp.float32).astype(xs[0].dtype)


@register("FusedAttention")
def fused_attention(ctx, q, k, v, mask=None):
    """Fused multi-head attention core emitted by
    graph/transformer_opt.py (the TPU-native analogue of ORT's attention
    fusion, reference __main__.py:85-89).

    q: (B,H,S,dh); k: (B,H,S,dh), or (B,H,dh,S) when k_transposed=1 (the
    original graph's key transpose was not absorbable); v: (B,H,T,dh);
    optional additive mask broadcastable to (B,H,S,T).  Returns the
    post-projection-layout (B,S,H*dh) tensor, absorbing the trailing
    Transpose(0,2,1,3) + Reshape.  Softmax runs in f32 for bf16-stats
    stability; XLA fuses the whole block natively on the MXU."""
    import jax
    scale = ctx.attrs.get("scale", 1.0)
    if ctx.attrs.get("k_transposed", 0):
        k = jnp.swapaxes(k, -1, -2)
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhst,bhtd->bhsd", probs, v)
    b, h, s, d = out.shape
    return jnp.swapaxes(out, 1, 2).reshape(b, s, h * d)

"""Shape/layout manipulation ops (ONNX semantics, JAX impl).

Data-dependent operands (Reshape target, Slice indices, Pad amounts, ...)
are declared static: the executor resolves them to host numpy values after
constant folding, keeping every traced program static-shaped for XLA."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..onnx_ir.helper import ONNX_TO_NP
from .registry import register


@register("Identity")
def identity(ctx, x):
    return x


@register("Dropout")
def dropout(ctx, x, ratio=None, training_mode=None):
    return x  # inference mode


@register("Reshape", static_inputs=(1,))
def reshape(ctx, x, shape):
    target = [int(s) for s in np.asarray(shape).reshape(-1)]
    allowzero = ctx.attrs.get("allowzero", 0)
    out = []
    for i, s in enumerate(target):
        if s == 0 and not allowzero:
            out.append(x.shape[i])
        else:
            out.append(s)
    return jnp.reshape(x, out)


@register("Flatten")
def flatten(ctx, x):
    axis = ctx.attrs.get("axis", 1)
    if axis < 0:
        axis += x.ndim
    lead = int(np.prod(x.shape[:axis])) if axis > 0 else 1
    return jnp.reshape(x, (lead, -1))


@register("Transpose")
def transpose(ctx, x):
    perm = ctx.attrs.get("perm")
    if perm is None:
        perm = list(range(x.ndim))[::-1]
    return jnp.transpose(x, perm)


@register("Squeeze", static_inputs=(1,))
def squeeze(ctx, x, axes=None):
    if axes is None:
        axes = ctx.attrs.get("axes")
    if axes is None:
        return jnp.squeeze(x)
    axes = tuple(int(a) % max(x.ndim, 1) if int(a) >= 0 else int(a) + x.ndim
                 for a in np.asarray(axes).reshape(-1))
    return jnp.squeeze(x, axis=axes)


@register("Unsqueeze", static_inputs=(1,))
def unsqueeze(ctx, x, axes=None):
    if axes is None:
        axes = ctx.attrs.get("axes")
    axes = [int(a) for a in np.asarray(axes).reshape(-1)]
    out_ndim = x.ndim + len(axes)
    axes = sorted(a if a >= 0 else a + out_ndim for a in axes)
    for a in axes:
        x = jnp.expand_dims(x, a)
    return x


@register("Concat")
def concat(ctx, *xs):
    axis = ctx.attrs["axis"]
    return jnp.concatenate(xs, axis=axis)


@register("Split", static_inputs=(1,))
def split(ctx, x, split_sizes=None):
    axis = ctx.attrs.get("axis", 0)
    if axis < 0:
        axis += x.ndim
    if split_sizes is None:
        split_sizes = ctx.attrs.get("split")
    if split_sizes is None:
        num = ctx.attrs.get("num_outputs", len(ctx.node.output) if ctx.node else 2)
        size = -(-x.shape[axis] // num)
        split_sizes = [size] * (num - 1) + [x.shape[axis] - size * (num - 1)]
    else:
        split_sizes = [int(s) for s in np.asarray(split_sizes).reshape(-1)]
    indices = np.cumsum(split_sizes)[:-1].tolist()
    return tuple(jnp.split(x, indices, axis=axis))


@register("Gather", static_inputs=())
def gather(ctx, x, indices):
    axis = ctx.attrs.get("axis", 0)
    indices = jnp.asarray(indices)
    if jnp.issubdtype(indices.dtype, jnp.integer):
        indices = jnp.where(indices < 0, indices + x.shape[axis], indices)
    return jnp.take(x, indices, axis=axis)


@register("GatherElements")
def gather_elements(ctx, x, indices):
    axis = ctx.attrs.get("axis", 0)
    indices = jnp.where(indices < 0, indices + x.shape[axis], indices)
    return jnp.take_along_axis(x, indices, axis=axis)


@register("Slice", static_inputs=(1, 2, 3, 4))
def op_slice(ctx, x, starts=None, ends=None, axes=None, steps=None):
    if starts is None:  # opset < 10: attributes
        starts = ctx.attrs["starts"]
        ends = ctx.attrs["ends"]
        axes = ctx.attrs.get("axes")
    starts = [int(v) for v in np.asarray(starts).reshape(-1)]
    ends = [int(v) for v in np.asarray(ends).reshape(-1)]
    if axes is None:
        axes = list(range(len(starts)))
    else:
        axes = [int(v) for v in np.asarray(axes).reshape(-1)]
    if steps is None:
        steps = [1] * len(starts)
    else:
        steps = [int(v) for v in np.asarray(steps).reshape(-1)]
    slices = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        if ax < 0:
            ax += x.ndim
        dim = x.shape[ax]
        # clamp like numpy
        slices[ax] = slice(st if st > -(2**31) else None,
                           en if abs(en) < 2**31 else None,
                           sp)
    return x[tuple(slices)]


@register("Pad", static_inputs=(1, 3))
def pad(ctx, x, pads=None, constant_value=None, axes=None):
    mode = ctx.attrs.get("mode", b"constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if pads is None:
        pads = ctx.attrs["pads"]
    pads = [int(p) for p in np.asarray(pads).reshape(-1)]
    if axes is not None:
        axes = [int(a) % x.ndim for a in np.asarray(axes).reshape(-1)]
    else:
        axes = list(range(x.ndim))
    n = len(axes)
    pad_width = [(0, 0)] * x.ndim
    for i, ax in enumerate(axes):
        pad_width[ax] = (pads[i], pads[i + n])
    if mode == "constant":
        cv = 0.0
        if constant_value is not None:
            cv = float(np.asarray(constant_value).reshape(-1)[0]) if hasattr(constant_value, 'reshape') else float(constant_value)
        return jnp.pad(x, pad_width, mode="constant", constant_values=cv)
    if mode == "reflect":
        return jnp.pad(x, pad_width, mode="reflect")
    if mode == "edge":
        return jnp.pad(x, pad_width, mode="edge")
    raise NotImplementedError(f"Pad mode {mode}")


@register("Expand", static_inputs=(1,))
def expand(ctx, x, shape):
    target = [int(s) for s in np.asarray(shape).reshape(-1)]
    # ONNX Expand uses bidirectional broadcast
    out_shape = list(np.broadcast_shapes(tuple(x.shape), tuple(target)))
    return jnp.broadcast_to(x, out_shape)


@register("Tile", static_inputs=(1,))
def tile(ctx, x, repeats):
    reps = [int(r) for r in np.asarray(repeats).reshape(-1)]
    return jnp.tile(x, reps)


@register("Shape")
def shape_op(ctx, x):
    start = ctx.attrs.get("start", 0)
    end = ctx.attrs.get("end", None)
    s = list(x.shape)[start:end]
    return jnp.asarray(s, dtype=jnp.int64)


@register("Size")
def size_op(ctx, x):
    return jnp.asarray(int(np.prod(x.shape)), dtype=jnp.int64)


@register("Cast")
def cast(ctx, x):
    to = ctx.attrs["to"]
    np_dtype = ONNX_TO_NP.get(to)
    if np_dtype is None:
        raise NotImplementedError(f"Cast to onnx dtype {to}")
    return x.astype(np_dtype)


@register("CastLike")
def cast_like(ctx, x, like):
    return x.astype(like.dtype)


@register("ConstantOfShape", static_inputs=(0,))
def constant_of_shape(ctx, shape):
    target = [int(s) for s in np.asarray(shape).reshape(-1)]
    value = ctx.attrs.get("value")
    if value is not None:
        from ..onnx_ir.helper import tensor_to_array
        arr = tensor_to_array(value)
        return jnp.full(target, arr.reshape(-1)[0], dtype=arr.dtype)
    return jnp.zeros(target, dtype=jnp.float32)


@register("Range", static_inputs=(0, 1, 2))
def op_range(ctx, start, limit, delta):
    s, l, d = (np.asarray(v).reshape(-1)[0] for v in (start, limit, delta))
    return jnp.arange(s, l, d)


@register("Resize", static_inputs=(1, 2, 3))
def resize(ctx, x, roi=None, scales=None, sizes=None):
    mode = ctx.attrs.get("mode", b"nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    coord_mode = ctx.attrs.get("coordinate_transformation_mode", b"half_pixel")
    if isinstance(coord_mode, bytes):
        coord_mode = coord_mode.decode()
    nearest_mode = ctx.attrs.get("nearest_mode", b"round_prefer_floor")
    if isinstance(nearest_mode, bytes):
        nearest_mode = nearest_mode.decode()

    in_shape = x.shape
    if sizes is not None and np.asarray(sizes).size:
        out_shape = [int(s) for s in np.asarray(sizes).reshape(-1)]
    else:
        sc = np.asarray(scales, dtype=np.float64).reshape(-1)
        out_shape = [int(np.floor(in_shape[i] * sc[i])) for i in range(x.ndim)]

    out = x
    for ax in range(x.ndim):
        if out_shape[ax] == out.shape[ax]:
            continue
        out = _resize_axis(out, ax, out_shape[ax], mode, coord_mode, nearest_mode)
    return out


def _resize_axis(x, axis, out_size, mode, coord_mode, nearest_mode):
    in_size = x.shape[axis]
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    scale = in_size / out_size
    if coord_mode == "half_pixel" or coord_mode == "pytorch_half_pixel":
        src = (out_idx + 0.5) * scale - 0.5
        if coord_mode == "pytorch_half_pixel" and out_size == 1:
            src = jnp.zeros_like(src)
    elif coord_mode == "align_corners":
        src = out_idx * ((in_size - 1) / max(out_size - 1, 1))
    elif coord_mode == "asymmetric":
        src = out_idx * scale
    else:
        src = (out_idx + 0.5) * scale - 0.5
    if mode == "nearest":
        if nearest_mode == "floor":
            idx = jnp.floor(src)
        elif nearest_mode == "ceil":
            idx = jnp.ceil(src)
        elif nearest_mode == "round_prefer_ceil":
            idx = jnp.floor(src + 0.5)
        else:  # round_prefer_floor
            idx = jnp.ceil(src - 0.5)
        idx = jnp.clip(idx, 0, in_size - 1).astype(jnp.int32)
        return jnp.take(x, idx, axis=axis)
    # linear
    lo = jnp.clip(jnp.floor(src), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = jnp.clip(src - lo.astype(jnp.float32), 0.0, 1.0)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return jnp.take(x, lo, axis=axis) * (1 - w) + jnp.take(x, hi, axis=axis) * w


@register("Upsample", static_inputs=(1,))
def upsample(ctx, x, scales=None):
    if scales is None:
        scales = ctx.attrs.get("scales")
    mode = ctx.attrs.get("mode", b"nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    sc = np.asarray(scales, dtype=np.float64).reshape(-1)
    out_shape = [int(np.floor(x.shape[i] * sc[i])) for i in range(x.ndim)]
    out = x
    for ax in range(x.ndim):
        if out_shape[ax] != out.shape[ax]:
            out = _resize_axis(out, ax, out_shape[ax], mode, "asymmetric", "floor")
    return out


@register("DepthToSpace")
def depth_to_space(ctx, x):
    b = ctx.attrs["blocksize"]
    mode = ctx.attrs.get("mode", b"DCR")
    if isinstance(mode, bytes):
        mode = mode.decode()
    n, c, h, w = x.shape
    if mode == "DCR":
        t = x.reshape(n, b, b, c // (b * b), h, w)
        t = jnp.transpose(t, (0, 3, 4, 1, 5, 2))
    else:  # CRD
        t = x.reshape(n, c // (b * b), b, b, h, w)
        t = jnp.transpose(t, (0, 1, 4, 2, 5, 3))
    return t.reshape(n, c // (b * b), h * b, w * b)


@register("SpaceToDepth")
def space_to_depth(ctx, x):
    b = ctx.attrs["blocksize"]
    n, c, h, w = x.shape
    t = x.reshape(n, c, h // b, b, w // b, b)
    t = jnp.transpose(t, (0, 3, 5, 1, 2, 4))
    return t.reshape(n, c * b * b, h // b, w // b)


@register("ScatterND")
def scatter_nd(ctx, data, indices, updates):
    # jnp.asarray: the constant folder evaluates ops on host numpy values,
    # which have no .at[] (T5 exports fold a constant ScatterND)
    data = jnp.asarray(data)
    idx = tuple(jnp.moveaxis(jnp.asarray(indices), -1, 0))
    return data.at[idx].set(updates)


@register("TopK", static_inputs=(1,))
def topk(ctx, x, k):
    axis = ctx.attrs.get("axis", -1)
    largest = ctx.attrs.get("largest", 1)
    kk = int(np.asarray(k).reshape(-1)[0])
    if axis != -1 and axis != x.ndim - 1:
        xm = jnp.moveaxis(x, axis, -1)
    else:
        xm = x
    if largest:
        vals, idxs = lax.top_k(xm, kk)
    else:
        vals, idxs = lax.top_k(-xm, kk)
        vals = -vals
    if axis != -1 and axis != x.ndim - 1:
        vals = jnp.moveaxis(vals, -1, axis)
        idxs = jnp.moveaxis(idxs, -1, axis)
    return vals, idxs.astype(jnp.int64)


@register("OneHot", static_inputs=(1,))
def one_hot(ctx, indices, depth, values):
    d = int(np.asarray(depth).reshape(-1)[0])
    axis = int(ctx.attrs.get("axis", -1))
    idx = indices.astype(jnp.int32)
    idx = jnp.where(idx < 0, idx + d, idx)  # ONNX wraps negatives
    import jax
    oh = jax.nn.one_hot(idx, d, axis=axis, dtype=values.dtype)
    off, on = values[0], values[1]
    return oh * (on - off) + off


@register("Trilu", static_inputs=(1,))
def trilu(ctx, x, k=None):
    kk = int(np.asarray(k).reshape(-1)[0]) if k is not None else 0
    if ctx.attrs.get("upper", 1):
        return jnp.triu(x, kk)
    return jnp.tril(x, kk)


@register("EyeLike")
def eye_like(ctx, x):
    k = int(ctx.attrs.get("k", 0))
    from ..onnx_ir.helper import ONNX_TO_NP
    dt = ONNX_TO_NP.get(ctx.attrs.get("dtype"), x.dtype)
    return jnp.eye(x.shape[0], x.shape[1], k=k, dtype=dt)

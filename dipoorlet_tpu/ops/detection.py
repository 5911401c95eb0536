"""Detection-family ops: GatherND, RoiAlign, NonMaxSuppression.

The reference executes detection graphs through onnxruntime
(/root/reference/dipoorlet/forward_net.py:195-201) and gets these ops for
free; here they are implemented TPU-style with STATIC shapes:

  * GatherND / RoiAlign are exact static-shape ops (RoiAlign uses the
    node's sampling_ratio, defaulting to 2 when the attr is 0 — ORT's
    adaptive per-roi sample count is data-dependent and untraceable);
  * NonMaxSuppression greedily selects up to
    max_output_boxes_per_class boxes per (batch, class) inside a
    lax.fori_loop and returns the FIXED-shape
    (batch * classes * max_out, 3) index tensor with unused rows set to
    -1 — ONNX/ORT instead return a dynamically sized tensor.  Graphs
    whose postprocess consumes NMS output should be cut with
    graph.passes.truncate_for_static_execution (the CLI does this
    automatically) so calibration/profiling sees only the
    statically-meaningful backbone+head.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .registry import register


@register("GatherND")
def gather_nd(ctx, data, indices):
    b = int(ctx.attrs.get("batch_dims", 0))

    def gather(d, i):
        idx = tuple(jnp.moveaxis(i, -1, 0).astype(jnp.int32))
        return d[idx]

    fn = gather
    for _ in range(b):
        fn = jax.vmap(fn)
    return fn(data, indices)


def _bilinear_sample(img, y, x):
    """img (C, H, W); y/x arbitrary equal shapes -> (C, *y.shape).
    Out-of-bounds samples contribute 0 (torchvision/ORT semantics)."""
    h, w = img.shape[1], img.shape[2]
    inside = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    v00 = img[:, y0, x0]
    v01 = img[:, y0, x1]
    v10 = img[:, y1, x0]
    v11 = img[:, y1, x1]
    val = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
           + v10 * ly * (1 - lx) + v11 * ly * lx)
    return val * inside.astype(val.dtype)


@register("RoiAlign")
def roi_align(ctx, x, rois, batch_indices):
    """x (N,C,H,W), rois (R,4) xyxy in input coords * spatial_scale."""
    out_h = int(ctx.attrs.get("output_height", 1))
    out_w = int(ctx.attrs.get("output_width", 1))
    ratio = int(ctx.attrs.get("sampling_ratio", 0)) or 2
    scale = float(ctx.attrs.get("spatial_scale", 1.0))
    mode = ctx.attrs.get("mode", "avg")
    if isinstance(mode, bytes):
        mode = mode.decode()
    # The attr only exists from opset 16, where its spec default is
    # 'half_pixel'; older exports (torchvision aligned=False) have NO
    # half-pixel offset in ORT, so a missing attr defaults by opset:
    # offset 0 (output_half_pixel) below 16, offset 0.5 at 16+.
    default_ctm = "half_pixel" if (ctx.opset or 13) >= 16 else "output_half_pixel"
    ctm = ctx.attrs.get("coordinate_transformation_mode", default_ctm)
    if isinstance(ctm, bytes):
        ctm = ctm.decode()
    offset = 0.5 if ctm == "half_pixel" else 0.0

    def one_roi(roi, img):
        x1, y1, x2, y2 = [roi[i] * scale - offset for i in range(4)]
        rh = jnp.maximum(y2 - y1, 1.0 if ctm != "half_pixel" else 1e-6)
        rw = jnp.maximum(x2 - x1, 1.0 if ctm != "half_pixel" else 1e-6)
        bin_h, bin_w = rh / out_h, rw / out_w
        # sample grid: (out_h*ratio, out_w*ratio) points
        gy = y1 + (jnp.arange(out_h * ratio) + 0.5) * bin_h / ratio
        gx = x1 + (jnp.arange(out_w * ratio) + 0.5) * bin_w / ratio
        yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
        samples = _bilinear_sample(img, yy, xx)            # (C, oh*r, ow*r)
        c = samples.shape[0]
        samples = samples.reshape(c, out_h, ratio, out_w, ratio)
        if mode == "max":
            return samples.max(axis=(2, 4))
        return samples.mean(axis=(2, 4))

    imgs = x[batch_indices.astype(jnp.int32)]              # (R, C, H, W)
    return jax.vmap(one_roi)(rois.astype(jnp.float32), imgs)


def _iou_matrix(boxes):
    """boxes (N, 4) corner format with unordered diagonal pairs."""
    y1 = jnp.minimum(boxes[:, 0], boxes[:, 2])
    x1 = jnp.minimum(boxes[:, 1], boxes[:, 3])
    y2 = jnp.maximum(boxes[:, 0], boxes[:, 2])
    x2 = jnp.maximum(boxes[:, 1], boxes[:, 3])
    area = (y2 - y1) * (x2 - x1)
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    inter = jnp.maximum(iy2 - iy1, 0) * jnp.maximum(ix2 - ix1, 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms_class(iou, scores, max_out, iou_th, score_th, idx_dtype):
    """Greedy NMS for one (batch, class): returns (max_out,) box ids, -1 pad."""
    suppressed = ~(scores > score_th)

    def body(i, carry):
        sel, suppressed = carry
        cand = jnp.where(suppressed, -jnp.inf, scores)
        j = jnp.argmax(cand)
        ok = cand[j] > -jnp.inf
        sel = sel.at[i].set(jnp.where(ok, j, -1))
        kill = (iou[j] > iou_th) | (jnp.arange(scores.shape[0]) == j)
        suppressed = suppressed | (kill & ok)
        return sel, suppressed

    sel0 = jnp.full((max_out,), -1, idx_dtype)
    sel, _ = lax.fori_loop(0, max_out, body, (sel0, suppressed))
    return sel


@register("NonMaxSuppression", static_inputs=(2, 3, 4))
def non_max_suppression(ctx, boxes, scores, max_output_boxes_per_class=None,
                        iou_threshold=None, score_threshold=None):
    """boxes (B,N,4), scores (B,C,N) -> (B*C*max_out, 3) [b, c, box] rows,
    padded with -1 (see module docstring for the static-shape contract)."""
    max_out = (int(np.asarray(max_output_boxes_per_class).reshape(-1)[0])
               if max_output_boxes_per_class is not None else 0)
    iou_th = (float(np.asarray(iou_threshold).reshape(-1)[0])
              if iou_threshold is not None else 0.0)
    score_th = (float(np.asarray(score_threshold).reshape(-1)[0])
                if score_threshold is not None else -np.inf)
    if int(ctx.attrs.get("center_point_box", 0)):
        xc, yc, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
        boxes = jnp.stack([yc - h / 2, xc - w / 2, yc + h / 2, xc + w / 2], axis=-1)
    b, c, n = scores.shape
    # Selected-index dtype: ONNX says int64; under the default
    # jax_enable_x64=False JAX silently computes in int32, which is fine
    # for any real box count — made explicit here rather than implied.
    idx_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    if max_out == 0:
        # ONNX: max_output_boxes_per_class=0 (or absent) means "output no
        # boxes" (ai.onnx NonMaxSuppression spec), not "all boxes".
        return jnp.zeros((0, 3), idx_dtype)
    max_out = min(max_out, n)

    iou = jax.vmap(_iou_matrix)(boxes)                       # (B, N, N)
    sel = jax.vmap(                                          # over batches
        lambda io, sc: jax.vmap(                             # over classes
            lambda s: _nms_class(io, s, max_out, iou_th, score_th, idx_dtype))(sc)
    )(iou, scores)                                           # (B, C, max_out)

    bi = jnp.tile(jnp.arange(b, dtype=idx_dtype)[:, None, None], (1, c, max_out))
    ci = jnp.tile(jnp.arange(c, dtype=idx_dtype)[None, :, None], (b, 1, max_out))
    invalid = sel < 0
    out = jnp.stack([jnp.where(invalid, -1, bi),
                     jnp.where(invalid, -1, ci),
                     sel], axis=-1)                          # (B, C, max_out, 3)
    return out.reshape(b * c * max_out, 3)

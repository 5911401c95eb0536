"""Detection-family support: GatherND/RoiAlign/NonMaxSuppression ops,
the dynamic-postprocess truncation pass, and an SSD-style CLI e2e run
(reference parity target: ORT-backed universality, forward_net.py:195-201)."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dipoorlet_tpu import onnx_ir as oir
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph, truncate_for_static_execution
from dipoorlet_tpu.ops import OP_REGISTRY, OpContext
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu.runtime.data import make_synthetic_dataset


# ---------------------------------------------------------------------------
# op oracles
# ---------------------------------------------------------------------------
def _nms_oracle(boxes, scores, max_out, iou_th, score_th):
    y1 = np.minimum(boxes[:, 0], boxes[:, 2]); x1 = np.minimum(boxes[:, 1], boxes[:, 3])
    y2 = np.maximum(boxes[:, 0], boxes[:, 2]); x2 = np.maximum(boxes[:, 1], boxes[:, 3])
    area = (y2 - y1) * (x2 - x1)
    alive = scores > score_th
    sel = []
    while len(sel) < max_out:
        cand = np.where(alive, scores, -np.inf)
        j = int(cand.argmax())
        if cand[j] == -np.inf:
            break
        sel.append(j)
        alive[j] = False
        iy1 = np.maximum(y1, y1[j]); ix1 = np.maximum(x1, x1[j])
        iy2 = np.minimum(y2, y2[j]); ix2 = np.minimum(x2, x2[j])
        inter = np.maximum(iy2 - iy1, 0) * np.maximum(ix2 - ix1, 0)
        union = area + area[j] - inter
        iou = np.where(union > 0, inter / union, 0)
        alive &= ~(iou > iou_th)
    return sel


def test_nms_matches_greedy_oracle():
    rng = np.random.RandomState(3)
    boxes = rng.rand(2, 30, 4).astype(np.float32) * 12
    scores = rng.rand(2, 3, 30).astype(np.float32)
    fn = OP_REGISTRY["NonMaxSuppression"]
    out = np.asarray(jax.jit(
        lambda b, s: fn(OpContext({}), b, s, np.int64([6]), np.float32([0.4]),
                        np.float32([0.15])))(jnp.asarray(boxes), jnp.asarray(scores)))
    assert out.shape == (2 * 3 * 6, 3)  # static padded contract
    for b in range(2):
        for c in range(3):
            want = _nms_oracle(boxes[b], scores[b, c], 6, 0.4, 0.15)
            got = [int(r[2]) for r in out if r[0] == b and r[1] == c and r[2] >= 0]
            assert got == want, (b, c, got, want)


def test_nms_center_point_box_and_caps():
    # center-format boxes: two perfectly overlapping, one disjoint
    boxes = np.array([[[5, 5, 4, 4], [5, 5, 4, 4], [20, 20, 2, 2]]], np.float32)
    scores = np.array([[[0.9, 0.8, 0.7]]], np.float32)
    fn = OP_REGISTRY["NonMaxSuppression"]
    out = np.asarray(fn(OpContext({"center_point_box": 1}), jnp.asarray(boxes),
                        jnp.asarray(scores), np.int64([3]), np.float32([0.5]),
                        np.float32([0.0])))
    kept = [int(r[2]) for r in out if r[2] >= 0]
    assert kept == [0, 2]  # box 1 suppressed by box 0


def test_gather_nd_batch_dims():
    rng = np.random.RandomState(0)
    d = rng.randn(2, 3, 4).astype(np.float32)
    fn = OP_REGISTRY["GatherND"]
    out = np.asarray(fn(OpContext({}), jnp.asarray(d),
                        jnp.asarray(np.array([[0, 1], [1, 2]], np.int64))))
    np.testing.assert_allclose(out, d[[0, 1], [1, 2]])
    idx = np.array([[[1], [0]], [[2], [1]]], np.int64)
    out = np.asarray(fn(OpContext({"batch_dims": 1}), jnp.asarray(d), jnp.asarray(idx)))
    oracle = np.stack([np.stack([d[0, 1], d[0, 0]]), np.stack([d[1, 2], d[1, 1]])])
    np.testing.assert_allclose(out, oracle)


def _roi_align_oracle(x, rois, batch_idx, out_h, out_w, ratio, scale):
    """Straightforward per-point numpy RoiAlign (half_pixel)."""
    res = np.zeros((len(rois), x.shape[1], out_h, out_w), np.float32)
    h, w = x.shape[2], x.shape[3]

    def sample(img, y, xx):
        if y <= -1.0 or y >= h or xx <= -1.0 or xx >= w:
            return np.zeros(img.shape[0], np.float32)
        y = min(max(y, 0.0), h - 1); xx = min(max(xx, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, xx - x0
        return (img[:, y0, x0] * (1 - ly) * (1 - lx) + img[:, y0, x1] * (1 - ly) * lx
                + img[:, y1, x0] * ly * (1 - lx) + img[:, y1, x1] * ly * lx)

    for r, (roi, bi) in enumerate(zip(rois, batch_idx)):
        px1, py1, px2, py2 = [v * scale - 0.5 for v in roi]
        bin_h = max(py2 - py1, 1e-6) / out_h
        bin_w = max(px2 - px1, 1e-6) / out_w
        for oy in range(out_h):
            for ox in range(out_w):
                acc = np.zeros(x.shape[1], np.float32)
                for sy in range(ratio):
                    for sx in range(ratio):
                        y = py1 + (oy * ratio + sy + 0.5) * bin_h / ratio
                        xx = px1 + (ox * ratio + sx + 0.5) * bin_w / ratio
                        acc += sample(x[bi], y, xx)
                res[r, :, oy, ox] = acc / (ratio * ratio)
    return res


def test_roi_align_matches_oracle():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, 10, 10).astype(np.float32)
    rois = np.array([[1.0, 1.0, 7.0, 8.0], [0.0, 0.0, 10.0, 10.0],
                     [2.5, 3.5, 5.0, 6.0]], np.float32)
    bi = np.array([0, 1, 0], np.int64)
    ctx = OpContext({"output_height": 3, "output_width": 2, "sampling_ratio": 2,
                     "spatial_scale": 0.5, "mode": "avg",
                     "coordinate_transformation_mode": "half_pixel"})
    out = np.asarray(OP_REGISTRY["RoiAlign"](ctx, jnp.asarray(x), jnp.asarray(rois),
                                             jnp.asarray(bi)))
    want = _roi_align_oracle(x, rois, bi, 3, 2, 2, 0.5)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_roi_align_opset10_default_has_no_offset():
    """A model without coordinate_transformation_mode (opset<16 export)
    must sample WITHOUT the -0.5 shift (ORT aligned=False semantics):
    a whole-image roi then reproduces the feature map at identity scale."""
    rng = np.random.RandomState(7)
    x = rng.randn(1, 2, 4, 4).astype(np.float32)
    rois = np.array([[0.0, 0.0, 4.0, 4.0]], np.float32)
    bi = np.array([0], np.int64)
    ctx = OpContext({"output_height": 4, "output_width": 4, "sampling_ratio": 1,
                     "spatial_scale": 1.0})
    out = np.asarray(OP_REGISTRY["RoiAlign"](ctx, jnp.asarray(x), jnp.asarray(rois),
                                             jnp.asarray(bi)))
    # grid points land at pixel centers 0.5,1.5,2.5,3.5 -> bilinear between
    # neighbours; at sampling_ratio=1 each output bin samples its centre.
    gy = np.arange(4) + 0.5 - 0.0  # no -0.5 offset
    vals = np.zeros_like(out)
    for oy in range(4):
        for ox in range(4):
            y = min(gy[oy], 3.0); xx = min(gy[ox], 3.0)
            y0, x0 = int(y), int(xx)
            y1, x1 = min(y0 + 1, 3), min(x0 + 1, 3)
            ly, lx = y - y0, xx - x0
            vals[0, :, oy, ox] = (x[0, :, y0, x0] * (1 - ly) * (1 - lx)
                                  + x[0, :, y0, x1] * (1 - ly) * lx
                                  + x[0, :, y1, x0] * ly * (1 - lx)
                                  + x[0, :, y1, x1] * ly * lx)
    np.testing.assert_allclose(out, vals, rtol=1e-4, atol=1e-5)


def test_nms_zero_max_output_means_no_boxes():
    """ONNX: max_output_boxes_per_class=0 (the default) selects NOTHING."""
    boxes = np.random.RandomState(0).rand(1, 5, 4).astype(np.float32)
    scores = np.random.RandomState(1).rand(1, 2, 5).astype(np.float32)
    fn = OP_REGISTRY["NonMaxSuppression"]
    out = np.asarray(fn(OpContext({}), jnp.asarray(boxes), jnp.asarray(scores),
                        np.int64([0]), np.float32([0.5]), np.float32([0.0])))
    assert out.shape == (0, 3)
    out = np.asarray(fn(OpContext({}), jnp.asarray(boxes), jnp.asarray(scores)))
    assert out.shape == (0, 3)


# ---------------------------------------------------------------------------
# SSD-style model: backbone + heads + decode + NMS postprocess
# ---------------------------------------------------------------------------
def _ssd_style_model(num_classes=2, anchors_per_cell=2):
    rng = np.random.RandomState(11)
    a = anchors_per_cell
    n1, n2 = 16 * 16 * a, 8 * 8 * a
    n = n1 + n2
    inits = [
        oir.array_to_tensor(rng.randn(8, 3, 3, 3).astype(np.float32) * 0.3, "w_b1"),
        oir.array_to_tensor(rng.randn(16, 8, 3, 3).astype(np.float32) * 0.3, "w_b2"),
        oir.array_to_tensor(rng.randn(a * num_classes, 8, 3, 3).astype(np.float32) * 0.2, "w_c1"),
        oir.array_to_tensor(rng.randn(a * 4, 8, 3, 3).astype(np.float32) * 0.2, "w_r1"),
        oir.array_to_tensor(rng.randn(a * num_classes, 16, 3, 3).astype(np.float32) * 0.2, "w_c2"),
        oir.array_to_tensor(rng.randn(a * 4, 16, 3, 3).astype(np.float32) * 0.2, "w_r2"),
        oir.array_to_tensor(np.asarray([1, -1, num_classes], np.int64), "shape_cls"),
        oir.array_to_tensor(np.asarray([1, -1, 4], np.int64), "shape_box"),
        oir.array_to_tensor((rng.rand(1, n, 4).astype(np.float32) * 24), "anchors"),
        oir.array_to_tensor(np.asarray([0.1], np.float32), "delta_scale"),
        oir.array_to_tensor(np.asarray([10], np.int64), "nms_max"),
        oir.array_to_tensor(np.asarray([0.45], np.float32), "nms_iou"),
        oir.array_to_tensor(np.asarray([0.05], np.float32), "nms_score"),
        oir.array_to_tensor(np.asarray([2], np.int64), "sel_col"),
    ]
    conv = dict(kernel_shape=[3, 3], pads=[1, 1, 1, 1], dilations=[1, 1], group=1)
    nodes = [
        oir.make_node("Conv", ["x", "w_b1"], ["f1"], name="backbone1",
                      strides=[2, 2], **conv),
        oir.make_node("Relu", ["f1"], ["f1r"], name="relu_b1"),
        oir.make_node("Conv", ["f1r", "w_b2"], ["f2"], name="backbone2",
                      strides=[2, 2], **conv),
        oir.make_node("Relu", ["f2"], ["f2r"], name="relu_b2"),
    ]
    for i, feat in ((1, "f1r"), (2, "f2r")):
        nodes += [
            oir.make_node("Conv", [feat, f"w_c{i}"], [f"cls{i}"], name=f"head_cls{i}",
                          strides=[1, 1], **conv),
            oir.make_node("Transpose", [f"cls{i}"], [f"cls{i}t"], name=f"tr_cls{i}",
                          perm=[0, 2, 3, 1]),
            oir.make_node("Reshape", [f"cls{i}t", "shape_cls"], [f"cls{i}f"],
                          name=f"rs_cls{i}"),
            oir.make_node("Conv", [feat, f"w_r{i}"], [f"box{i}"], name=f"head_box{i}",
                          strides=[1, 1], **conv),
            oir.make_node("Transpose", [f"box{i}"], [f"box{i}t"], name=f"tr_box{i}",
                          perm=[0, 2, 3, 1]),
            oir.make_node("Reshape", [f"box{i}t", "shape_box"], [f"box{i}f"],
                          name=f"rs_box{i}"),
        ]
    nodes += [
        oir.make_node("Concat", ["cls1f", "cls2f"], ["logits"], name="cat_cls", axis=1),
        oir.make_node("Sigmoid", ["logits"], ["probs"], name="sigmoid"),
        oir.make_node("Transpose", ["probs"], ["scores"], name="tr_scores",
                      perm=[0, 2, 1]),
        oir.make_node("Concat", ["box1f", "box2f"], ["deltas"], name="cat_box", axis=1),
        oir.make_node("Mul", ["deltas", "delta_scale"], ["deltas_s"], name="scale_box"),
        oir.make_node("Add", ["deltas_s", "anchors"], ["boxes"], name="decode"),
        # -- dynamic postprocess (everything below is cut for calibration) --
        oir.make_node("NonMaxSuppression",
                      ["boxes", "scores", "nms_max", "nms_iou", "nms_score"],
                      ["sel"], name="nms"),
        oir.make_node("Gather", ["sel", "sel_col"], ["sel_box"], name="pick_col",
                      axis=1),
        oir.make_node("Squeeze", ["boxes"], ["boxes_sq"], name="sq_boxes", axes=[0]),
        oir.make_node("Gather", ["boxes_sq", "sel_box"], ["detections"],
                      name="pick_boxes", axis=0),
    ]
    graph = oir.make_graph(
        nodes, "ssd_style",
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 32, 32])],
        [oir.make_tensor_value_info("detections", oir.DataType.FLOAT, None)],
        initializer=inits)
    g = GraphIR(oir.make_model(graph))
    simplify_graph(g)
    return g


def test_detection_graph_executes_end_to_end():
    """The FULL graph (NMS included) runs through the executor with the
    documented static padded output."""
    g = _ssd_style_model()
    ex = Executor(g)
    x = np.random.RandomState(1).randn(1, 3, 32, 32).astype(np.float32)
    out, _ = ex.forward(ex.init_params(), {"x": x})
    det = np.asarray(out["detections"])
    # num_classes * nms_max rows; the (1,) gather index keeps its dim
    assert det.shape == (2 * 10, 1, 4)


def test_truncation_pass_cuts_postprocess():
    g = _ssd_style_model()
    removed = truncate_for_static_execution(g)
    assert set(removed) == {"nms", "pick_col", "pick_boxes"}
    assert all(n.op_type != "NonMaxSuppression" for n in g.graph.node)
    # the cut tensors became outputs; sq_boxes only fed the removed Gather
    # but stays (its output is promoted)
    assert "boxes" in g.network_outputs and "scores" in g.network_outputs
    assert "detections" not in g.network_outputs
    ex = Executor(g)
    x = np.random.RandomState(1).randn(1, 3, 32, 32).astype(np.float32)
    out, _ = ex.forward(ex.init_params(), {"x": x})
    assert out["boxes"].shape == (1, 640, 4)
    assert out["scores"].shape == (1, 2, 640)


def test_detection_cli_e2e(tmp_path):
    """An SSD-style export calibrates end-to-end through the production CLI
    (auto-truncation), emitting TRT ranges for every backbone/head conv."""
    from dipoorlet_tpu.__main__ import main
    g = _ssd_style_model()
    g.update_model()
    g.output_dir = str(tmp_path)
    model_path = g.save_onnx_model("ssd")
    make_synthetic_dataset(str(tmp_path / "data"), {"x": [1, 3, 32, 32]}, 8, seed=4)
    out = str(tmp_path / "out")
    main(["-M", model_path, "-I", str(tmp_path / "data"), "-O", out, "-N", "8",
          "-A", "minmax", "-D", "trt", "--batch_size", "4", "--cpu"])
    blob = json.load(open(os.path.join(out, "trt_clip_val.json")))["blob_range"]
    for t in ("f1", "f2", "cls1", "cls2", "box1", "box2"):
        assert any(t in k for k in blob), (t, sorted(blob))
    cos = json.load(open(os.path.join(out, "model_res.json.rank0")))
    assert all(v[0] > 0.97 for v in cos.values()), cos
    assert os.path.exists(os.path.join(out, "quant_model.onnx"))


def test_roi_align_opset16_default_is_half_pixel():
    """Opset>=16 spec default for a MISSING coordinate_transformation_mode
    is 'half_pixel' (offset 0.5); below 16 the attr doesn't exist and ORT
    samples with no offset. The default must switch on ctx.opset
    (advisor round-4 finding)."""
    rng = np.random.RandomState(11)
    x = rng.randn(1, 2, 8, 8).astype(np.float32)
    rois = np.array([[1.0, 1.0, 6.0, 6.0]], np.float32)
    bi = np.array([0], np.int64)
    base = {"output_height": 2, "output_width": 2, "sampling_ratio": 2,
            "spatial_scale": 1.0, "mode": "avg"}
    run = lambda attrs, opset: np.asarray(
        OP_REGISTRY["RoiAlign"](OpContext(dict(attrs), opset=opset),
                                jnp.asarray(x), jnp.asarray(rois),
                                jnp.asarray(bi)))
    out16_default = run(base, 16)
    out16_explicit = run({**base,
                          "coordinate_transformation_mode": "half_pixel"}, 16)
    out13_default = run(base, 13)
    out13_explicit = run({**base,
                          "coordinate_transformation_mode": "output_half_pixel"}, 13)
    np.testing.assert_array_equal(out16_default, out16_explicit)
    np.testing.assert_array_equal(out13_default, out13_explicit)
    assert np.abs(out16_default - out13_default).max() > 1e-4

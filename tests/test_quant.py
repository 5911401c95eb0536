"""Quant math + QDQ graph rewrite tests (oracle: reference formulas in numpy)."""
import numpy as np
import pytest

from dipoorlet_tpu.quant import compute_qparams, platform_setting_table, quant_graph
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu import onnx_ir as oir


class Args:
    def __init__(self, **kw):
        self.skip_layers = []
        self.deploy = "trt"
        for k, v in kw.items():
            setattr(self, k, v)


def test_symmetric_per_tensor():
    qp = compute_qparams({"bit_width": 8, "type": "Linear", "symmetric": True}, -3.0, 5.0)
    assert qp.q_min == -127 and qp.q_max == 127
    np.testing.assert_allclose(qp.scale, 5.0 / 127, rtol=1e-6)
    assert qp.zero_point == 0


def test_symmetric_per_channel_zero_channel():
    rmin = np.array([-1.0, 0.0, -2.0])
    rmax = np.array([0.5, 0.0, 4.0])
    qp = compute_qparams({"bit_width": 8, "type": "Linear", "symmetric": True,
                          "per_channel": True}, rmin, rmax)
    np.testing.assert_allclose(qp.scale, [1 / 127, 1.0, 4 / 127], rtol=1e-6)


def test_asymmetric_per_tensor():
    qp = compute_qparams({"bit_width": 8, "type": "Linear", "symmetric": False}, -1.0, 3.0)
    scale = 4.0 / 255
    zp = round(1.0 / scale)
    np.testing.assert_allclose(qp.scale, scale, rtol=1e-6)
    assert qp.zero_point == zp
    assert qp.q_min == -zp and qp.q_max == 255 - zp


def test_asymmetric_range_includes_zero():
    # all-positive range must be widened to include 0 (quantize.py:148-149)
    qp = compute_qparams({"bit_width": 8, "type": "Linear", "symmetric": False}, 1.0, 3.0)
    np.testing.assert_allclose(qp.scale, 3.0 / 255, rtol=1e-6)
    assert qp.zero_point == 0


def test_dynamic_sym_switches_to_asymmetric():
    p = {"bit_width": 8, "type": "Linear", "symmetric": True, "dynamic_sym": True}
    qp = compute_qparams(p, 0.0, 6.0)
    assert not qp.symmetric  # relu-like range gains a bit
    qp2 = compute_qparams(p, -6.0, 6.0)
    assert qp2.symmetric


def test_log_scale():
    qp = compute_qparams({"bit_width": 8, "type": "Linear", "symmetric": True,
                          "log_scale": True}, -5.0, 5.0)
    assert np.log2(qp.scale) == round(np.log2(qp.scale))


def _conv_relu_add_model():
    rng = np.random.RandomState(0)
    w1 = oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.2, "w1")
    w2 = oir.array_to_tensor(rng.randn(4, 4, 3, 3).astype(np.float32) * 0.2, "w2")
    nodes = [
        oir.make_node("Conv", ["x", "w1"], ["c1"], name="conv1",
                      kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                      dilations=[1, 1], group=1),
        oir.make_node("Relu", ["c1"], ["r1"], name="relu1"),
        oir.make_node("Conv", ["r1", "w2"], ["c2"], name="conv2",
                      kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                      dilations=[1, 1], group=1),
        oir.make_node("Add", ["r1", "c2"], ["y"], name="add1"),
    ]
    graph = oir.make_graph(nodes, "g",
                           [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 8, 8])],
                           [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 4, 8, 8])],
                           initializer=[w1, w2])
    g = GraphIR(oir.make_model(graph))
    from dipoorlet_tpu.graph.passes import simplify_graph
    simplify_graph(g)
    return g


def _fake_ranges(g):
    clip = {}
    ex = Executor(g)
    names = ex.all_tensor_names()
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    _, taps = ex.forward(ex.init_params(), {"x": x}, taps=names)
    for name in names:
        arr = np.asarray(taps[name])
        clip[name] = [np.float64(arr.min()), np.float64(arr.max())]
    for name, arr in g.initializer.items():
        c = arr.shape[0]
        clip[name] = [arr.reshape(c, -1).min(-1), arr.reshape(c, -1).max(-1)]
    return clip


def test_quant_graph_structure_trt():
    g = _conv_relu_add_model()
    clip = _fake_ranges(g)
    gq, quant_nodes = quant_graph(g, clip, Args(deploy="trt"))
    ops = [n.op_type for n in gq.graph.node]
    assert "QuantizeLinear" in ops and "DequantizeLinear" in ops
    by_name = {n.name: n for n in gq.graph.node}
    # relu following conv is range-merged: its input stays unquantized
    assert by_name["relu1"].input[0] == "c1"
    # conv2 input is the quantized relu output
    assert by_name["conv2"].input[0] == "r1_dq"
    assert by_name["conv2"].input[1] == "w2_dq"
    # TRT Add merge: first Conv-fed input (c2) unquantized, r1 quantized
    assert by_name["add1"].input[0] == "r1_dq"
    assert by_name["add1"].input[1] == "c2"
    # weight per-channel axis 0
    q_w = by_name["w2_QuantizeLinear"]
    assert {a.name: oir.get_attribute_value(a) for a in q_w.attribute}.get("axis") == 0


def test_quant_graph_executes_and_is_close():
    g = _conv_relu_add_model()
    clip = _fake_ranges(g)
    gq, _ = quant_graph(g, clip, Args(deploy="trt"))
    ex_fp = Executor(g)
    ex_q = Executor(gq)
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    out_fp, _ = ex_fp.forward(ex_fp.init_params(), {"x": x})
    out_q, _ = ex_q.forward(ex_q.init_params(), {"x": x})
    a = np.asarray(out_fp["y"]).ravel()
    b = np.asarray(out_q["y"]).ravel()
    cos = np.dot(a, b) / np.linalg.norm(a) / np.linalg.norm(b)
    assert cos > 0.99


def test_quant_graph_network_output_rv():
    g = _conv_relu_add_model()
    clip = _fake_ranges(g)
    gq, _ = quant_graph(g, clip, Args(deploy="rv"))
    assert gq.network_outputs == ["y_dq"]
    ex_q = Executor(gq)
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    out_q, _ = ex_q.forward(ex_q.init_params(), {"x": x})
    assert "y_dq" in out_q


def test_quant_graph_skips_nonfinite_range():
    """A tensor whose calibrated range is non-finite (masked-attention
    interiors: -inf logits through an Add quant node) must be left
    UNQUANTIZED with a warning — an inf scale silently zeroes the tensor
    (observed: a trained GPT-2 LM collapsed 0.67 -> 0.04 next-top1
    before the guard)."""
    g = _conv_relu_add_model()
    clip = _fake_ranges(g)
    clip["r1"] = [-np.inf, float(clip["r1"][1])]
    gq, _ = quant_graph(g, clip, Args(deploy="trt"))
    by_name = {n.name: n for n in gq.graph.node}
    # r1 stays raw everywhere it is consumed
    assert by_name["conv2"].input[0] == "r1"
    assert by_name["add1"].input[0] == "r1"
    # finite tensors still quantize
    assert by_name["conv2"].input[1] == "w2_dq"
    # and the QDQ model still executes at parity on the rest
    ex_fp, ex_q = Executor(g), Executor(gq)
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    a = np.asarray(ex_fp.forward(ex_fp.init_params(), {"x": x})[0]["y"]).ravel()
    b = np.asarray(ex_q.forward(ex_q.init_params(), {"x": x})[0]["y"]).ravel()
    assert np.dot(a, b) / np.linalg.norm(a) / np.linalg.norm(b) > 0.99

"""QOperator export breadth (round-5): the platform's full quant_nodes
set lowers to QLinear ops the way the reference's ORT ONNXQuantizer does
(ref utils.py:415-435) — QLinearAdd/Mul/AveragePool/Sigmoid/LeakyRelu/
Concat, QGemm with transA/alpha/beta folding, int8 passthrough for
MaxPool/Split, range-merged Relu — with executor parity against the QDQ
model and no redundant Q/DQ pairs."""
import json
import os

import numpy as np
import pytest
import torch

from dipoorlet_tpu import onnx_ir as oir
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.onnx_ir import load_model
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu.runtime.data import make_synthetic_dataset
from torch_export import MODEL_ZOO, export


def _run_cli(ws, model, out_name, extra, n=8):
    from dipoorlet_tpu.__main__ import main
    out = str(ws / out_name)
    main(["-M", model, "-I", str(ws / "data"), "-O", out,
          "-N", str(n), "--batch_size", "4", "--cpu"] + extra)
    return out


def _cosine_vs(qop_path, fp_path, seed=3, shape=(1, 3, 32, 32), inp="input"):
    qop = GraphIR.load(qop_path, simplify=False)
    fp = GraphIR.load(fp_path)
    ex_q, ex_f = Executor(qop), Executor(fp)
    x = np.random.RandomState(seed).randn(*shape).astype(np.float32)
    oq, _ = ex_q.forward(ex_q.init_params(), {inp: x})
    of, _ = ex_f.forward(ex_f.init_params(), {inp: x})
    a = np.asarray(oq[qop.network_outputs[0]]).ravel()
    b = np.asarray(of[fp.network_outputs[0]]).ravel()
    return float(np.dot(a, b) / np.linalg.norm(a) / np.linalg.norm(b))


def _no_redundant_qdq(model):
    """No QuantizeLinear may directly consume a DequantizeLinear output
    (a true no-op pair), and no DequantizeLinear may directly consume a
    QuantizeLinear output."""
    prod = {n.output[0]: n for n in model.graph.node if n.output}
    for n in model.graph.node:
        if n.op_type == "QuantizeLinear":
            p = prod.get(n.input[0])
            assert p is None or p.op_type != "DequantizeLinear", \
                f"redundant DQ->Q at {n.name}"
        if n.op_type == "DequantizeLinear":
            p = prod.get(n.input[0])
            assert p is None or p.op_type != "QuantizeLinear", \
                f"redundant Q->DQ at {n.name}"


@pytest.fixture(scope="module")
def zoo_ws(tmp_path_factory):
    ws = tmp_path_factory.mktemp("qop")
    torch.manual_seed(0)
    for name in ("resnet18", "mobilenet_v2"):
        m = MODEL_ZOO[name](num_classes=8)
        # adapt BN running stats to real activation statistics: with the
        # init-state stats folded in at export, an untrained deep net's
        # activations collapse toward 0 by the tail (mobilenet hits ~1e-8),
        # which makes every int8 range degenerate — not a quantizer-
        # representable regime
        m.train()
        with torch.no_grad():
            for _ in range(20):
                m(torch.randn(16, 3, 32, 32))
        m.eval()
        export(m, torch.randn(1, 3, 32, 32), str(ws / f"{name}.onnx"))
    make_synthetic_dataset(str(ws / "data"), {"input": [1, 3, 32, 32]}, 8,
                           seed=1)
    return ws


def test_qop_resnet18_full_breadth_trt(zoo_ws):
    out = _run_cli(zoo_ws, str(zoo_ws / "resnet18.onnx"), "r18_trt",
                   ["-A", "minmax", "-D", "trt", "--quant_format", "QOP"])
    m = load_model(os.path.join(out, "qop_model.onnx"))
    ops = {}
    for n in m.graph.node:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    # trt quant_nodes: Relu/MaxPool/Conv/Gemm/ConvTranspose/PRelu/
    # AveragePool/Add/Sigmoid -> every residual Add must be QLinearAdd,
    # no fp32 Add/Conv/Gemm left
    assert ops.get("QLinearConv", 0) >= 20
    assert ops.get("QLinearAdd", 0) == 8
    assert "Add" not in ops and "Conv" not in ops and "Gemm" not in ops
    assert ops.get("QGemm", 0) == 1
    # MaxPool rides the int8 domain; symmetric platform keeps exact
    # int8 Relu nodes (max(q,0)); nothing needs a Q/DQ pair for them
    assert ops.get("MaxPool", 0) == 1
    mp = [n for n in m.graph.node if n.op_type == "MaxPool"][0]
    assert mp.input[0].endswith("_quantized")
    _no_redundant_qdq(m)
    # exactly TWO domain entries: the network input, and re-entry before
    # QGemm (GlobalAveragePool/Flatten are NOT in trt quant_nodes, so the
    # domain exits once mid-net — matching ORT's strict op_types set);
    # and two exits: before GlobalAveragePool and at the network output
    assert ops.get("QuantizeLinear", 0) == 2
    assert ops.get("DequantizeLinear", 0) == 2
    # com.microsoft opset is declared for QLinearAdd/QGemm
    assert any(o.domain == "com.microsoft" for o in m.opset_import)


def test_qop_resnet18_executes_close_to_qdq(zoo_ws):
    out = str(zoo_ws / "r18_trt")
    qop_cos = _cosine_vs(os.path.join(out, "qop_model.onnx"),
                         str(zoo_ws / "resnet18.onnx"))
    qdq_cos = _cosine_vs(os.path.join(out, "quant_model.onnx"),
                         str(zoo_ws / "resnet18.onnx"))
    assert qop_cos > 0.98, qop_cos
    # full-int8-domain QOP must track the QDQ fake-quant model closely
    assert abs(qop_cos - qdq_cos) < 0.02, (qop_cos, qdq_cos)


def test_qop_mobilenet_v2_snpe_asymmetric(zoo_ws):
    """snpe: asymmetric activations -> sole-consumer Relu is ELIDED (the
    uint8 clamp at zp==0 is the relu); mobilenet's Clip (ReLU6) has no
    QLinear form and stays fp32 with a logged count."""
    out = _run_cli(zoo_ws, str(zoo_ws / "mobilenet_v2.onnx"), "mbv2_snpe",
                   ["-A", "minmax", "-D", "snpe", "--quant_format", "QOP"])
    m = load_model(os.path.join(out, "qop_model.onnx"))
    ops = {}
    for n in m.graph.node:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    assert "Conv" not in ops and ops.get("QLinearConv", 0) >= 30
    assert ops.get("QLinearAdd", 0) >= 5 and "Add" not in ops
    _no_redundant_qdq(m)
    cos = _cosine_vs(os.path.join(out, "qop_model.onnx"),
                     str(zoo_ws / "mobilenet_v2.onnx"))
    assert cos > 0.97, cos


def _eltwise_model(ws):
    """Synthetic net covering Sigmoid/Mul/AveragePool/Concat/Split on the
    snpe quant set, plus a non-canonical Gemm (transA/alpha/beta)."""
    rng = np.random.RandomState(0)
    F = oir.DataType.FLOAT
    vi = lambda n, s: oir.make_tensor_value_info(n, F, s)
    inits = [
        oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.3, "w"),
        oir.array_to_tensor(rng.randn(4).astype(np.float32) * 0.1, "b"),
        oir.array_to_tensor(rng.randn(8, 64).astype(np.float32) * 0.3, "gw"),
        oir.array_to_tensor(rng.randn(8).astype(np.float32) * 0.1, "gb"),
    ]
    nodes = [
        oir.make_node("Conv", ["x", "w", "b"], ["c"], name="conv",
                      kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                      dilations=[1, 1], group=1),
        oir.make_node("Sigmoid", ["c"], ["sg"], name="sig"),
        oir.make_node("Mul", ["c", "sg"], ["sw"], name="mul"),  # swish
        oir.make_node("AveragePool", ["sw"], ["ap"], name="apool",
                      kernel_shape=[2, 2], strides=[2, 2]),
        oir.make_node("Split", ["ap"], ["s1", "s2"], name="split", axis=1),
        oir.make_node("Concat", ["s2", "s1"], ["cc"], name="concat", axis=1),
        oir.make_node("Reshape", ["cc", "shape"], ["flat"], name="reshape"),
        oir.make_node("Gemm", ["flat", "gw", "gb"], ["y"], name="gemm",
                      alpha=0.5, beta=2.0, transB=1),
    ]
    inits.append(oir.array_to_tensor(np.asarray([1, -1], np.int64), "shape"))
    g = oir.make_graph(nodes, "elt", [vi("x", [1, 3, 8, 8])], [vi("y", [1, 8])],
                       initializer=inits)
    gi = GraphIR(oir.make_model(g))
    from dipoorlet_tpu.graph.passes import simplify_graph
    simplify_graph(gi)
    gi.output_dir = str(ws)
    return gi.save_onnx_model("eltwise")


def test_qop_eltwise_breadth_and_noncanonical_gemm(zoo_ws, tmp_path):
    path = _eltwise_model(tmp_path)
    make_synthetic_dataset(str(tmp_path / "data"), {"x": [1, 3, 8, 8]}, 8,
                           seed=5)
    from dipoorlet_tpu.__main__ import main
    out = str(tmp_path / "out")
    main(["-M", path, "-I", str(tmp_path / "data"), "-O", out, "-N", "8",
          "-A", "minmax", "-D", "snpe", "--batch_size", "4", "--cpu",
          "--quant_format", "QOP"])
    m = load_model(os.path.join(out, "qop_model.onnx"))
    ops = {n.op_type for n in m.graph.node}
    assert "QLinearSigmoid" in ops and "QLinearMul" in ops
    assert "QLinearAveragePool" in ops and "QLinearConcat" in ops
    # Split rides the int8 domain
    sp = [n for n in m.graph.node if n.op_type == "Split"][0]
    assert sp.input[0].endswith("_quantized")
    # the non-canonical Gemm (transB=1, alpha=0.5, beta=2) became QGemm
    # (beta folded into the int32 bias — no fp32 fallback)
    qg = [n for n in m.graph.node if n.op_type == "QGemm"]
    assert len(qg) == 1
    from dipoorlet_tpu.graph.graph import node_attrs
    a = node_attrs(qg[0])
    assert a["transB"] == 1 and abs(a["alpha"] - 0.5) < 1e-6
    _no_redundant_qdq(m)
    # executor parity vs the fp model
    cos = _cosine_vs(os.path.join(out, "qop_model.onnx"), path,
                     shape=(1, 3, 8, 8), inp="x")
    assert cos > 0.99, cos

"""Deploy emitter format tests: file names, key conventions and value
math checked against hand-computed expectations (byte-level parity with
reference deploy/*.py output conventions)."""
import json
import os

import numpy as np
import pytest

from dipoorlet_tpu import onnx_ir as oir
from dipoorlet_tpu.deploy import to_deploy
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph


class Args:
    def __init__(self, deploy, out):
        self.deploy = deploy
        self.output_dir = out
        self.skip_layers = []
        self.stpu_wg = False


@pytest.fixture(scope="module")
def graph():
    rng = np.random.RandomState(0)
    inits = [
        oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.5, "w"),
        oir.array_to_tensor(rng.randn(4).astype(np.float32) * 0.1, "b"),
    ]
    nodes = [
        oir.make_node("Conv", ["x", "w", "b"], ["c"], name="conv",
                      kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                      dilations=[1, 1], group=1),
        oir.make_node("Relu", ["c"], ["y"], name="relu"),
    ]
    g = oir.make_graph(nodes, "g",
                       [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 8, 8])],
                       [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 4, 8, 8])],
                       initializer=inits)
    gi = GraphIR(oir.make_model(g))
    simplify_graph(gi)
    return gi


@pytest.fixture(scope="module")
def clips(graph):
    act = {"x": [np.float64(-2.0), np.float64(2.0)],
           "c": [np.float64(-3.0), np.float64(5.0)],
           "y": [np.float64(0.0), np.float64(5.0)]}
    wt = {}
    for name in ("w", "b"):
        arr = graph.get_initializer(name)
        c = arr.shape[0]
        wt[name] = [arr.reshape(c, -1).min(-1), arr.reshape(c, -1).max(-1)]
    return act, wt


def _deploy(graph, clips, platform, tmp_path):
    act, wt = clips
    out = str(tmp_path)
    to_deploy(graph, {k: list(v) for k, v in act.items()},
              {k: list(v) for k, v in wt.items()}, Args(platform, out))
    return out


def test_trt_format(graph, clips, tmp_path):
    out = _deploy(graph, clips, "trt", tmp_path)
    blob = json.load(open(os.path.join(out, "trt_clip_val.json")))["blob_range"]
    assert blob["x"] == 2.0
    assert blob["c"] == 5.0  # max(-min, max)
    assert "w" not in blob   # trt deploy_weight=False


def test_atlas_format(graph, clips, tmp_path):
    out = _deploy(graph, clips, "atlas", tmp_path)
    res = json.load(open(os.path.join(out, "atlas_quant_param.json")))
    # only Conv/Gemm/AveragePool inputs; x feeds conv
    assert set(res) == {"x"}
    step = 4.0 / 255
    assert abs(res["x"]["scale"] - step) < 1e-9
    assert res["x"]["offset"] == round(2.0 / step) - 128


def test_imx_format(graph, clips, tmp_path):
    out = _deploy(graph, clips, "imx", tmp_path)
    res = json.load(open(os.path.join(out, "imx_scale.json")))["blob_range"]
    # power-of-two scale of amax/127
    v = res["c"] if isinstance(res["c"], float) else res["c"][0] if isinstance(res["c"], list) else res["c"]
    val = v if not isinstance(v, list) else v[0]
    expect = 2.0 ** np.round(np.log2(5.0 / 127))
    assert abs(np.asarray(res["c"]).reshape(-1)[0] - expect) < 1e-12
    # imx deploys weights too (per-channel list)
    assert len(np.asarray(res["w"]).reshape(-1)) == 4


def test_ti_format(graph, clips, tmp_path):
    out = _deploy(graph, clips, "ti", tmp_path)
    txt = open(os.path.join(out, "ti_blob_range.txt")).read().splitlines()
    assert any(line.startswith("x ") for line in txt)
    blob = json.load(open(os.path.join(out, "ti_blob_range.json")))["blob_range"]
    assert blob["c"] == [-3.0, 5.0]


def test_magicmind_format(graph, clips, tmp_path):
    out = _deploy(graph, clips, "magicmind", tmp_path)
    blob = json.load(open(os.path.join(out, "magicmind_quant_param.json")))["blob_range"]
    assert blob["c"] == {"min": -3.0, "max": 5.0}


def test_stpu_format(graph, clips, tmp_path):
    out = _deploy(graph, clips, "stpu", tmp_path)
    param = json.load(open(os.path.join(out, "stpu_minmax.json")))
    assert param["conv_weights"]["max"] == -param["conv_weights"]["min"]
    # relu merge: conv output range copied from relu output (emin added after)
    assert param["c"]["min"] == param["y"]["min"]
    assert param["c"]["max"] == param["y"]["max"]
    # conv emin present; bias alpha = w_alpha * in_alpha
    assert "emin" in param["c"]
    walpha = (param["conv_weights"]["max"] - param["conv_weights"]["min"]) / 254
    ialpha = (param["x"]["max"] - param["x"]["min"]) / 254
    assert abs(param["conv_bias"]["alpha"] - walpha * ialpha) < 1e-12


def test_snpe_format(graph, clips, tmp_path):
    out = _deploy(graph, clips, "snpe", tmp_path)
    enc = json.load(open(os.path.join(out, "snpe_encodings.json")))
    assert enc["param_encodings"] == {}
    assert enc["activation_encodings"]["x"][0]["bitwidth"] == 8


def test_rv_format(graph, clips, tmp_path):
    out = _deploy(graph, clips, "rv", tmp_path)
    res = json.load(open(os.path.join(out, "rv_quantized_param.json")))
    qp = res["quantize_parameters"]
    assert "@x:out0" in qp and "@conv:weight" in qp and "@conv:bias" in qp
    # relu merge: conv out0 inherits relu's range entry
    assert qp["@conv:out0"] == qp["@relu:out0"]
    # bias scale = w_scale * act_scale
    ws = qp["@conv:weight"]["scale"][0]
    xs = qp["@x:out0"]["scale"][0]
    assert abs(qp["@conv:bias"]["scale"][0] - ws * xs) < 1e-12
    assert os.path.exists(os.path.join(out, "rk_quantized_param.json"))


def test_rv_caffe_bn_scale_merge(tmp_path):
    """Caffe-converted graphs: the CaffeBatchNorm output takes the CaffeScale
    output's range and the Scale entry is dropped (ref deploy_rv.py:99-106,
    gen3568 :165-171)."""
    nodes = [
        oir.make_node("CaffeBatchNorm", ["x"], ["bn_out"], name="bn"),
        oir.make_node("CaffeScale", ["bn_out"], ["sc_out"], name="scale"),
    ]
    g = oir.make_graph(nodes, "g",
                       [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 4, 8, 8])],
                       [oir.make_tensor_value_info("sc_out", oir.DataType.FLOAT,
                                                   [1, 4, 8, 8])])
    gi = GraphIR(oir.make_model(g))
    act = {"x": [-2.0, 2.0], "bn_out": [-1.0, 1.0], "sc_out": [-3.0, 5.0]}
    to_deploy(gi, {k: list(v) for k, v in act.items()}, {},
              Args("rv", str(tmp_path)))

    qp = json.load(open(os.path.join(tmp_path, "rv_quantized_param.json")))[
        "quantize_parameters"]
    assert "@scale:out0" not in qp
    # bn out0 inherits the scale output's range (-3..5), not its own (-1..1)
    assert qp["@bn:out0"]["min_value"] == [-3.0]
    assert qp["@bn:out0"]["max_value"] == [5.0]

    rk = json.load(open(os.path.join(tmp_path, "rk_quantized_param.json")))[
        "quantize_parameters"]
    assert "sc_out" not in rk
    assert rk["bn_out"] == {"max": [5.0], "min": [-3.0]}

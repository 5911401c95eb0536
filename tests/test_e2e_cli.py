"""End-to-end CLI pipeline tests (calibrate -> transform -> profile -> deploy)."""
import json
import os

import numpy as np
import pytest
import torch

from dipoorlet_tpu.runtime.data import make_synthetic_dataset
from torch_export import MODEL_ZOO, export


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("e2e")
    torch.manual_seed(0)
    m = MODEL_ZOO["resnet18"](num_classes=8)
    m.eval()
    export(m, torch.randn(1, 3, 32, 32), str(ws / "model.onnx"))
    make_synthetic_dataset(str(ws / "data"), {"input": [1, 3, 32, 32]}, 8, seed=1)
    return ws


def run_cli(ws, out_name, extra):
    from dipoorlet_tpu.__main__ import main
    out = str(ws / out_name)
    main(["-M", str(ws / "model.onnx"), "-I", str(ws / "data"), "-O", out,
          "-N", "8", "--batch_size", "4", "--cpu"] + extra)
    return out


def test_minmax_trt(workspace):
    out = run_cli(workspace, "out_trt", ["-A", "minmax", "-D", "trt"])
    blob = json.load(open(os.path.join(out, "trt_clip_val.json")))["blob_range"]
    assert len(blob) > 20
    assert all(v >= 0 for v in blob.values())
    model_cos = json.load(open(os.path.join(out, "model_res.json.rank0")))
    assert model_cos["output"][0] > 0.99
    assert os.path.exists(os.path.join(out, "quant_model.onnx"))


def test_hist_snpe(workspace):
    out = run_cli(workspace, "out_snpe", ["-A", "hist", "-D", "snpe",
                                          "--bins", "256", "--threshold", "0.999"])
    enc = json.load(open(os.path.join(out, "snpe_encodings.json")))
    assert len(enc["activation_encodings"]) > 10
    for entries in enc["activation_encodings"].values():
        e = entries[0]
        assert e["max"] >= e["min"] and e["bitwidth"] == 8


def test_mse_atlas(workspace):
    out = run_cli(workspace, "out_atlas", ["-A", "mse", "-D", "atlas"])
    params = json.load(open(os.path.join(out, "atlas_quant_param.json")))
    assert len(params) > 5
    for v in params.values():
        assert -128 <= v["offset"] <= 127 and v["scale"] > 0


def test_qop_export(workspace):
    out = run_cli(workspace, "out_qop", ["-A", "minmax", "-D", "trt",
                                         "--quant_format", "QOP"])
    from dipoorlet_tpu.onnx_ir import load_model
    m = load_model(os.path.join(out, "qop_model.onnx"))
    ops = {n.op_type for n in m.graph.node}
    assert "QLinearConv" in ops


def test_adaround_cli(workspace):
    out = run_cli(workspace, "out_ada", ["-A", "minmax", "-D", "trt",
                                        "--adaround", "--ada_epoch", "5",
                                        "--ada_bs", "4"])
    assert os.path.exists(os.path.join(out, "adaround.onnx"))
    model_cos = json.load(open(os.path.join(out, "model_res.json.rank0")))
    assert model_cos["output"][0] > 0.98


def test_brecq_w4_cli(workspace):
    out = run_cli(workspace, "out_brecq", ["-A", "minmax", "-D", "trt",
                                           "--brecq", "--drop", "--ada_epoch", "3",
                                           "--ada_bs", "4", "--w_bit", "4"])
    assert os.path.exists(os.path.join(out, "brecq.onnx"))


def test_eval_agreement_tool(workspace):
    import subprocess, sys
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "tools",
                                      "eval_agreement.py"),
         "-M", str(workspace / "model.onnx"), "-I", str(workspace / "data"),
         "-N", "8", "-D", "trt", "-A", "minmax", "--batch_size", "4", "--cpu"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n"] == 8
    assert res["agreement"] >= 0.5  # INT8 should rarely flip predictions
    assert res["avg_cos"] > 0.99


def test_qop_model_executes(workspace):
    """The QOperator export must itself run and approximate the FP model."""
    import numpy as np
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime import Executor
    out = str(workspace / "out_qop")
    qop = GraphIR.load(os.path.join(out, "qop_model.onnx"), simplify=False)
    fp = GraphIR.load(str(workspace / "model.onnx"))
    ex_q = Executor(qop)
    ex_f = Executor(fp)
    x = np.random.RandomState(3).randn(1, 3, 32, 32).astype(np.float32)
    oq, _ = ex_q.forward(ex_q.init_params(), {"input": x})
    of, _ = ex_f.forward(ex_f.init_params(), {"input": x})
    a = np.asarray(oq[qop.network_outputs[0]]).ravel()
    b = np.asarray(of[fp.network_outputs[0]]).ravel()
    cos = float(np.dot(a, b) / np.linalg.norm(a) / np.linalg.norm(b))
    assert cos > 0.98, cos


def test_savefp_and_skip_flags(workspace):
    out = run_cli(workspace, "out_flags",
                  ["-A", "minmax", "-D", "trt", "--savefp", "--skip_prof_layer",
                   "--skip_layers", "/conv1/Conv"])
    # savefp dumps fp outputs per sample
    dump_dir = os.path.join(out, "output", "output")
    assert os.path.isdir(dump_dir) and len(os.listdir(dump_dir)) == 8
    # skip_prof_layer: no layer cosine file written
    assert not os.path.exists(os.path.join(out, "layer_res.json.rank0"))
    # skip_layers: first conv has no QDQ inserted around its weight
    from dipoorlet_tpu.onnx_ir import load_model
    m = load_model(os.path.join(out, "quant_model.onnx"))
    by_name = {n.name: n for n in m.graph.node}
    conv1 = [n for n in m.graph.node if n.op_type == "Conv"][0]
    assert not conv1.input[1].endswith("_dq")

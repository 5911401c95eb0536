"""SmoothQuant transform: FP-invariance, scale folding, and end-to-end
INT8 quality lift on a LayerNorm/attention model (extension beyond the
reference; see wtrans/smooth_quant.py)."""
import json
import os

import numpy as np
import pytest
import torch

from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu.runtime.data import save_sample
from dipoorlet_tpu.wtrans import smooth_quant
from torch_export import export

DIM = 32
SEQ = 8


class LNLinear(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.ln = torch.nn.LayerNorm(DIM)
        self.fc1 = torch.nn.Linear(DIM, DIM * 2)
        self.fc2 = torch.nn.Linear(DIM, DIM * 2)

    def forward(self, x):
        h = self.ln(x)
        return self.fc1(h) + self.fc2(h)


class _Args:
    batch_size = 4
    sq_alpha = 0.5
    smooth_quant = True


@pytest.fixture(scope="module")
def ln_graph(tmp_path_factory):
    torch.manual_seed(0)
    m = LNLinear()
    # inject an outlier channel so smoothing has something to migrate
    with torch.no_grad():
        m.ln.weight[3] = 30.0
    m.eval()
    ws = tmp_path_factory.mktemp("sq")
    path = str(ws / "ln_linear.onnx")
    export(m, torch.randn(1, SEQ, DIM), path)
    rng = np.random.RandomState(0)
    n = 8
    for i in range(n):
        save_sample(str(ws / "data"), "input",
                    i, rng.randn(1, SEQ, DIM).astype(np.float32))
    args = _Args()
    args.input_dir = str(ws / "data")
    args.data_num = n
    args.output_dir = str(ws)
    return m, path, args


def test_fp_invariance_and_folding(ln_graph, rng):
    m, path, args = ln_graph
    g = GraphIR.load(path, output_dir=args.output_dir)
    ex = Executor(g)
    x = rng.randn(1, SEQ, DIM).astype(np.float32)
    before, _ = ex.forward(ex.init_params(), {"input": x})

    g_sq = smooth_quant(g, args)
    ex2 = Executor(g_sq)
    after, _ = ex2.forward(ex2.init_params(), {"input": x})
    out = g_sq.network_outputs[0]
    np.testing.assert_allclose(np.asarray(after[out]), np.asarray(before[out]),
                               rtol=1e-4, atol=1e-5)

    # still matches torch
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(after[out]), ref, rtol=1e-3, atol=1e-4)
    # the 30x outlier LN gain must have been folded down (no (DIM,)
    # initializer keeps a ~30 entry at channel 3)
    assert not any(a.shape == (DIM,) and abs(float(a[3])) > 25.0
                   for a in g_sq.initializer.values())


def test_e2e_lnlinear_cosine_lift(tmp_path, rng):
    """On a model whose output IS the LN->Linear product, per-tensor INT8
    ranges inflated by an outlier LN gain directly hurt the output; SQ must
    recover measurably."""
    torch.manual_seed(3)
    m = LNLinear()
    with torch.no_grad():
        m.ln.weight[3] = 60.0
    m.eval()
    path = str(tmp_path / "ln.onnx")
    export(m, torch.randn(1, SEQ, DIM), path)
    data_dir = str(tmp_path / "data")
    n = 8
    for i in range(n):
        save_sample(data_dir, "input", i,
                    rng.randn(1, SEQ, DIM).astype(np.float32))

    from dipoorlet_tpu.__main__ import main

    def run(out_name, extra):
        out = str(tmp_path / out_name)
        main(["-M", path, "-I", data_dir, "-O", out, "-N", str(n),
              "--batch_size", "4", "--cpu", "-A", "minmax", "-D", "trt"] + extra)
        return json.load(open(os.path.join(out, "model_res.json.rank0")))

    base = run("out_base", [])
    sq = run("out_sq", ["--smooth_quant"])
    oname = list(base)[0]
    assert sq[oname][0] > base[oname][0], (base, sq)


def test_e2e_bert_integration(tmp_path, rng):
    pytest.importorskip("transformers")
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=500, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(1)
    model = BertModel(cfg)
    # inject activation-outlier structure typical of trained LLMs: a few
    # LN channels with large gains
    with torch.no_grad():
        for layer in model.encoder.layer:
            layer.attention.output.LayerNorm.weight[5] = 12.0
            layer.output.LayerNorm.weight[11] = 9.0
    model.eval()

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, ids):
            return self.m(input_ids=ids).last_hidden_state

    wrap = Wrap(model)
    path = str(tmp_path / "bert.onnx")
    export(wrap, torch.randint(0, 500, (1, 16)), path)
    data_dir = str(tmp_path / "data")
    n = 4
    # own RNG: the shared session `rng` stream shifts with test ordering,
    # and this test's non-degradation assertion is deliberately marginal
    local_rng = np.random.RandomState(123)
    for i in range(n):
        save_sample(data_dir, "input",
                    i, local_rng.randint(0, 500, size=(1, 16)).astype(np.float32))

    from dipoorlet_tpu.__main__ import main

    def run(out_name, extra):
        out = str(tmp_path / out_name)
        main(["-M", path, "-I", data_dir, "-O", out, "-N", str(n),
              "--batch_size", "2", "--cpu", "-A", "minmax", "-D", "trt"] + extra)
        return json.load(open(os.path.join(out, "model_res.json.rank0")))

    base = run("out_base", [])
    sq = run("out_sq", ["--smooth_quant"])
    oname = list(base)[0]
    # quantization snaps SQ's tiny per-element shifts to the same int8 codes
    # on this random-weight toy, so require non-degradation (the measurable
    # lift is asserted on the LN->Linear model above); integration value here
    # is that SQ ran through the full CLI on a transformer without breaking
    assert sq[oname][0] >= base[oname][0] - 1e-4, (base, sq)


def test_qop_export_after_smooth_quant_uses_recalibrated_ranges(tmp_path, rng):
    """SmoothQuant inserts per-channel Mul nodes whose outputs are NEW
    tensors; the QOP exporter must receive the post-WT re-calibrated
    ranges or every smoothed MatMul silently stays fp32 (round-5 bug:
    __main__ snapshotted pre-WT ranges)."""
    pytest.importorskip("transformers")
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=500, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, ids):
            return self.m(input_ids=ids).last_hidden_state

    path = str(tmp_path / "bert.onnx")
    export(Wrap(model), torch.randint(0, 500, (1, 16)), path)
    data_dir = str(tmp_path / "data")
    local_rng = np.random.RandomState(7)
    for i in range(4):
        save_sample(data_dir, "input", i,
                    local_rng.randint(0, 500, size=(1, 16)).astype(np.float32))
    from dipoorlet_tpu.__main__ import main
    out = str(tmp_path / "out")
    main(["-M", path, "-I", data_dir, "-O", out, "-N", "4",
          "--batch_size", "2", "--cpu", "-A", "minmax", "-D", "magicmind",
          "--optim_transformer", "--smooth_quant", "--quant_format", "QOP",
          "--skip_prof_layer"])
    from dipoorlet_tpu.onnx_ir import load_model
    m = load_model(os.path.join(out, "qop_model.onnx"))
    ops = {}
    for n in m.graph.node:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    # all 6 Linear matmuls per layer quantize despite the _sq_scaled inputs
    assert ops.get("QLinearMatMul", 0) == 12, ops

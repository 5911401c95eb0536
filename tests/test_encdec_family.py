"""T5 encoder-decoder family: HF export -> GraphIR -> executor parity ->
attention fusion -> full CLI quantization.

Completes the transformer matrix (BERT encoder, GPT-2 decoder, T5
encoder-decoder): exercises TWO integer inputs (encoder + decoder ids),
CROSS-attention (decoder queries over encoder keys/values), T5's
relative-position-bias additive mask (a computed, non-constant bias the
fusion walk must keep as a dynamic mask input), RMS-style norms, and a
constant ScatterND the folder must evaluate host-side."""
import json
import os
from collections import Counter

import numpy as np
import pytest
import torch

from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph
from dipoorlet_tpu.graph.transformer_opt import optimize_transformer
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu.runtime.data import save_sample
from torch_export import export

VOCAB = 128
ENC_SEQ = 12
DEC_SEQ = 10
N_LAYER = 2


@pytest.fixture(scope="module")
def t5(tmp_path_factory):
    pytest.importorskip("transformers")
    from transformers import T5Config, T5Model

    cfg = T5Config(vocab_size=VOCAB, d_model=32, d_kv=8, d_ff=64,
                   num_layers=N_LAYER, num_heads=4, is_encoder_decoder=True)
    torch.manual_seed(0)
    model = T5Model(cfg)
    model.eval()

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, enc_ids, dec_ids):
            return self.m(input_ids=enc_ids,
                          decoder_input_ids=dec_ids).last_hidden_state

    wrap = Wrap(model)
    ws = tmp_path_factory.mktemp("t5")
    path = str(ws / "t5_tiny.onnx")
    export(wrap, (torch.randint(0, VOCAB, (1, ENC_SEQ)),
                  torch.randint(0, VOCAB, (1, DEC_SEQ))), path, opset=14)
    return wrap, path, ws


def _ids(rng):
    return (rng.randint(0, VOCAB, size=(1, ENC_SEQ)),
            rng.randint(0, VOCAB, size=(1, DEC_SEQ)))


def _ref(wrap, e, d):
    with torch.no_grad():
        return wrap(torch.from_numpy(e), torch.from_numpy(d)).numpy()


def test_forward_parity(t5, rng):
    wrap, path, _ = t5
    g = GraphIR.load(path)
    simplify_graph(g)  # folds the constant ScatterND host-side
    ex = Executor(g)
    e, d = _ids(rng)
    out, _ = ex.forward(ex.init_params(),
                        {"input_0": e.astype(np.float32),
                         "input_1": d.astype(np.float32)})
    got = np.asarray(out[g.network_outputs[0]])
    np.testing.assert_allclose(got, _ref(wrap, e, d), rtol=1e-2, atol=1e-4)


def test_all_three_attention_kinds_fuse(t5, rng):
    """Encoder self-attention, decoder CAUSAL self-attention, and
    CROSS-attention must all fuse — 3 kinds x N_LAYER — with T5's
    relative-position bias carried as the additive mask input."""
    wrap, path, _ = t5
    g = GraphIR.load(path)
    simplify_graph(g)
    optimize_transformer(g)
    ops = Counter(n.op_type for n in g.graph.node)
    assert ops["FusedAttention"] == 3 * N_LAYER
    assert ops.get("Softmax", 0) == 0
    # every fused block keeps a mask input (position bias / causal+bias)
    attn = [n for n in g.graph.node if n.op_type == "FusedAttention"]
    assert all(len(n.input) == 4 for n in attn)
    ex = Executor(g)
    e, d = _ids(rng)
    out, _ = ex.forward(ex.init_params(),
                        {"input_0": e.astype(np.float32),
                         "input_1": d.astype(np.float32)})
    np.testing.assert_allclose(np.asarray(out[g.network_outputs[0]]),
                               _ref(wrap, e, d), rtol=1e-2, atol=1e-4)


def test_e2e_quantize_cli(t5, rng):
    """Production CLI over the two-input encoder-decoder with
    --optim_transformer and QOP export (magicmind quantizes the MatMul
    projections; attention-core matmuls are fused away)."""
    wrap, path, ws = t5
    data_dir = str(ws / "data")
    n = 4
    for i in range(n):
        e, d = _ids(rng)
        save_sample(data_dir, "input_0", i, e.astype(np.float32))
        save_sample(data_dir, "input_1", i, d.astype(np.float32))
    from dipoorlet_tpu.__main__ import main
    out = str(ws / "out")
    main(["-M", path, "-I", data_dir, "-O", out,
          "-N", str(n), "--batch_size", "2", "--cpu",
          "-A", "minmax", "-D", "magicmind", "--optim_transformer",
          "--quant_format", "QOP"])
    model_cos = json.load(open(os.path.join(out, "model_res.json.rank0")))
    for oname, (avg_cos, _mn) in model_cos.items():
        assert avg_cos > 0.9, (oname, avg_cos)
    qop = GraphIR.load(os.path.join(out, "qop_model.onnx"))
    ops = Counter(nn.op_type for nn in qop.graph.node)
    # projections per block: self-attn q/k/v/o + ff wi/wo (+ cross q/k/v/o)
    assert ops.get("QLinearMatMul", 0) + ops.get("QGemm", 0) >= 10, ops
    assert ops.get("MatMul", 0) + ops.get("Gemm", 0) == 0, ops


def test_smooth_quant_is_output_preserving_with_shared_gammas(t5, rng):
    """T5 initializes every RMS-norm gamma to ones and the exporter
    DEDUPLICATES identical constants into one shared initializer —
    folding 1/s into it corrupted every other norm (measured FP cos
    0.40, each fold dividing the same gamma).  Shared params must take
    the insert path; the transformed graph must match the original in
    FP exactly."""
    import importlib
    SQ = importlib.import_module('dipoorlet_tpu.wtrans.smooth_quant')
    wrap, path, ws = t5
    data_dir = str(ws / "data_sq")
    n = 4
    for i in range(n):
        e, d = _ids(rng)
        save_sample(data_dir, "input_0", i, e.astype(np.float32))
        save_sample(data_dir, "input_1", i, d.astype(np.float32))
    g = GraphIR.load(path)
    simplify_graph(g)
    optimize_transformer(g)
    g0 = g.clone()

    class A:
        input_dir = data_dir
        data_num = n
        batch_size = 2
        sq_alpha = 0.5
        deploy = "magicmind"
        skip_layers = []
        rank = 0
        world_size = 1

    SQ.smooth_quant(g, A())
    # the transform must have migrated SOMETHING (insert path)
    assert any(nn.op_type == "Mul" and nn.name.startswith("SQ_")
               for nn in g.graph.node)
    e, d = _ids(rng)
    feeds = {"input_0": e.astype(np.float32), "input_1": d.astype(np.float32)}
    outs = []
    for gg in (g0, g):
        ex = Executor(gg)
        out, _ = ex.forward(ex.init_params(), feeds)
        outs.append(np.asarray(out[gg.network_outputs[0]]))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-4, atol=1e-5)

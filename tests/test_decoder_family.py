"""GPT-2 decoder family: HF transformers export -> GraphIR -> executor
parity -> transformer optimization -> full CLI quantization + QOP export.

Exercises the CAUSAL-attention export shape the encoder families don't:
torch.where(tril, scores, finfo.min) causal masking, the probs Cast
round-trip, and the tanh-approximate GELU (`gelu_new`) — the decoder
counterparts of what the reference's ORT transformer optimizer fuses
(reference __main__.py:85-89, onnxruntime.transformers unidirectional
attention + FastGelu fusion)."""
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

SEQ = 16
VOCAB = 128
N_LAYER = 2


@pytest.fixture(scope="module")
def gpt2(tmp_path_factory):
    pytest.importorskip("transformers")
    from transformers import GPT2Config, GPT2Model

    cfg = GPT2Config(n_layer=N_LAYER, n_head=2, n_embd=32, n_positions=64,
                     vocab_size=VOCAB, attn_implementation="eager")
    torch.manual_seed(0)
    model = GPT2Model(cfg)
    model.eval()

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, ids):
            return self.m(input_ids=ids).last_hidden_state

    wrap = Wrap(model)
    ws = tmp_path_factory.mktemp("gpt2")
    path = str(ws / "gpt2_tiny.onnx")
    export(wrap, torch.randint(0, VOCAB, (1, SEQ)), path)
    return wrap, path, ws


def _ref(wrap, ids):
    with torch.no_grad():
        return wrap(torch.from_numpy(ids)).numpy()


def test_forward_parity(gpt2, rng):
    wrap, path, _ = gpt2
    graph = GraphIR.load(path)
    ex = Executor(graph)
    ids = rng.randint(0, VOCAB, size=(1, SEQ))
    out, _ = ex.forward(ex.init_params(), {"input": ids.astype(np.float32)})
    got = np.asarray(out[graph.network_outputs[0]])
    np.testing.assert_allclose(got, _ref(wrap, ids), rtol=1e-2, atol=1e-4)


def test_causal_attention_and_tanh_gelu_fuse(gpt2, rng):
    """The whole GPT-2 block interior must fuse: causal Where mask folds
    into FusedAttention's additive mask, the probs Cast is absorbed, and
    gelu_new becomes Gelu(approximate='tanh') — at parity with torch."""
    wrap, path, _ = gpt2
    g = GraphIR.load(path)
    simplify_graph(g)
    optimize_transformer(g)
    ops = Counter(n.op_type for n in g.graph.node)
    assert ops["FusedAttention"] == N_LAYER
    assert ops["Gelu"] == N_LAYER
    assert ops["LayerNormalization"] == 2 * N_LAYER + 1
    for gone in ("Softmax", "Tanh", "Where", "Erf", "Pow", "Div", "MatMul"):
        assert ops.get(gone, 0) == 0, f"{gone} survived fusion"
    attn = [n for n in g.graph.node if n.op_type == "FusedAttention"]
    # causal mask materialized as the 4th (additive mask) input
    assert all(len(n.input) == 4 for n in attn)
    for n in attn:
        m = g.get_initializer(n.input[3])
        assert m.shape[-2:] == (SEQ, SEQ)
        # upper triangle blocked, lower kept
        assert m[..., 0, -1] <= np.finfo(np.float32).min / 2
        assert np.all(m[..., -1, :] == 0.0)
    gelus = [n for n in g.graph.node if n.op_type == "Gelu"]
    from dipoorlet_tpu.graph.graph import node_attrs
    assert all(node_attrs(n).get("approximate") in ("tanh", b"tanh")
               for n in gelus)
    ex = Executor(g)
    ids = rng.randint(0, VOCAB, size=(1, SEQ))
    out, _ = ex.forward(ex.init_params(), {"input": ids.astype(np.float32)})
    np.testing.assert_allclose(np.asarray(out[g.network_outputs[0]]),
                               _ref(wrap, ids), rtol=1e-2, atol=1e-4)


def test_e2e_quantize_cli_qop(gpt2, rng):
    """Production CLI on the decoder with --optim_transformer and QOP
    export on magicmind (quant_nodes includes Gemm -> every projection
    quantizes)."""
    wrap, path, ws = gpt2
    data_dir = str(ws / "data")
    n = 4
    for i in range(n):
        ids = rng.randint(0, VOCAB, size=(1, SEQ)).astype(np.float32)
        save_sample(data_dir, "input", i, ids)
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
    # all 4 projections per layer (c_attn/c_proj/c_fc/c_proj) quantize
    assert ops.get("QLinearMatMul", 0) + ops.get("QGemm", 0) >= 4 * N_LAYER, ops
    assert ops.get("Gemm", 0) == 0, ops


def test_adaround_on_decoder_gemm_layers(gpt2, rng):
    """AdaRound must reconstruct the decoder's Gemm projections, whose
    per-sample activations are already 2-D ((S, D) reshaped from
    (B*S, D)) — the batch-squeeze is a no-op there and the layer apply
    broadcasts over the extra data axis (regression: reshape crash on
    (N, S, D) stacks)."""
    wrap, path, ws = gpt2
    data_dir = str(ws / "data_ada")
    n = 4
    for i in range(n):
        ids = rng.randint(0, VOCAB, size=(1, SEQ)).astype(np.float32)
        save_sample(data_dir, "input", i, ids)
    from dipoorlet_tpu.__main__ import main
    out = str(ws / "out_ada")
    main(["-M", path, "-I", data_dir, "-O", out,
          "-N", str(n), "--batch_size", "2", "--cpu",
          "-A", "minmax", "-D", "trt", "--optim_transformer",
          "--adaround", "--ada_epoch", "3", "--ada_bs", str(n)])
    assert os.path.exists(os.path.join(out, "adaround.onnx"))
    model_cos = json.load(open(os.path.join(out, "model_res.json.rank0")))
    for oname, (avg_cos, _mn) in model_cos.items():
        assert avg_cos > 0.9, (oname, avg_cos)


def test_smooth_quant_plus_brecq_trains_in_scaled_space(gpt2, rng):
    """SmoothQuant's insert mode renames the Gemm input to '<x>_sq' in
    the transformed graph; reconstruction must fetch q-side activations
    (and rescale QDrop's fp mix) in THAT space, not the original one —
    training the scaled weight against the unscaled activation corrupted
    every learned rounding by up to the per-channel s (measured collapse
    0.56 -> 0.09 next-top1 on the trained-LM protocol pre-fix)."""
    wrap, path, ws = gpt2
    data_dir = str(ws / "data_sqbrecq")
    n = 4
    for i in range(n):
        ids = rng.randint(0, VOCAB, size=(1, SEQ)).astype(np.float32)
        save_sample(data_dir, "input", i, ids)
    from dipoorlet_tpu.__main__ import main
    out = str(ws / "out_sqbrecq")
    main(["-M", path, "-I", data_dir, "-O", out,
          "-N", str(n), "--batch_size", "2", "--cpu",
          "-A", "minmax", "-D", "trt", "--optim_transformer",
          "--smooth_quant", "--brecq", "--drop",
          "--ada_epoch", "3", "--ada_bs", str(n)])
    model_cos = json.load(open(os.path.join(out, "model_res.json.rank0")))
    for oname, (avg_cos, _mn) in model_cos.items():
        assert avg_cos > 0.9, (oname, avg_cos)

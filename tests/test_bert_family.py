"""BERT-encoder family: HF transformers export -> GraphIR -> executor parity
-> full CLI quantization. Exercises integer-input models (token ids stored as
raw float32 calibration bins, cast to indices by the executor — the reference
feeds the same raw-f32 format to ORT, forward_net.py:459-464) and the
Gather/LayerNorm/Softmax/MatMul transformer path."""
import json
import os

import numpy as np
import pytest
import torch

from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu.runtime.data import save_sample
from torch_export import export

SEQ = 32
VOCAB = 1000


@pytest.fixture(scope="module")
def bert(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
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

    wrap = Wrap(model)
    ws = tmp_path_factory.mktemp("bert")
    path = str(ws / "bert_tiny.onnx")
    export(wrap, torch.randint(0, VOCAB, (1, SEQ)), path)
    return wrap, GraphIR.load(path), ws


def test_forward_parity(bert, rng):
    wrap, graph, _ = bert
    ex = Executor(graph)
    params = ex.init_params()
    ids = rng.randint(0, VOCAB, size=(1, SEQ))
    out, _ = ex.forward(params, {"input": ids.astype(np.float32)})
    with torch.no_grad():
        ref = wrap(torch.from_numpy(ids)).numpy()
    got = np.asarray(out[graph.network_outputs[0]])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-3)


def test_e2e_quantize_cli(bert, rng):
    wrap, graph, ws = bert
    data_dir = str(ws / "data")
    n = 4
    for i in range(n):
        ids = rng.randint(0, VOCAB, size=(1, SEQ)).astype(np.float32)
        save_sample(data_dir, "input", i, ids)
    from dipoorlet_tpu.__main__ import main
    out = str(ws / "out")
    main(["-M", str(ws / "bert_tiny.onnx"), "-I", data_dir, "-O", out,
          "-N", str(n), "--batch_size", "2", "--cpu",
          "-A", "minmax", "-D", "trt", "--optim_transformer"])
    blob = json.load(open(os.path.join(out, "trt_clip_val.json")))["blob_range"]
    assert len(blob) > 20
    model_cos = json.load(open(os.path.join(out, "model_res.json.rank0")))
    for oname, (avg_cos, _mn) in model_cos.items():
        assert avg_cos > 0.9, (oname, avg_cos)


def test_attention_fusion_on_bert_with_mask(bert, rng):
    """The REAL HF BertSelfAttention export (scores MatMul -> Div ->
    extended-attention-mask Add -> Softmax -> MatMul -> Transpose ->
    Reshape) must fuse to one FusedAttention per layer WITH the mask
    input captured, at parity with torch."""
    from dipoorlet_tpu.graph.transformer_opt import optimize_transformer
    wrap, graph, ws = bert
    g = GraphIR.load(os.path.join(str(ws), "bert_tiny.onnx"))
    optimize_transformer(g)
    attn = [n for n in g.graph.node if n.op_type == "FusedAttention"]
    assert len(attn) == 2  # one per hidden layer
    assert all(len(n.input) == 4 for n in attn), "mask input not captured"
    assert not any(n.op_type == "Softmax" for n in g.graph.node)
    ex = Executor(g)
    ids = rng.randint(0, VOCAB, size=(1, SEQ))
    out, _ = ex.forward(ex.init_params(), {"input": ids.astype(np.float32)})
    with torch.no_grad():
        ref = wrap(torch.from_numpy(ids)).numpy()
    np.testing.assert_allclose(np.asarray(out[g.network_outputs[0]]), ref,
                               rtol=1e-2, atol=1e-3)

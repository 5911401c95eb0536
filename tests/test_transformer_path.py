"""Transformer-model support: op coverage for attention blocks, external
data round-trip, and the --optim_transformer CLI path."""
import os

import numpy as np
import pytest
import torch
import torch.nn as nn

from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.runtime import Executor
from torch_export import export


class TinyTransformerBlock(nn.Module):
    def __init__(self, dim=32, heads=4):
        super().__init__()
        self.ln1 = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.ln2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(nn.Linear(dim, dim * 4), nn.GELU(), nn.Linear(dim * 4, dim))
        self.heads = heads
        self.dim = dim

    def forward(self, x):
        b, t, d = x.shape
        h = self.ln1(x)
        qkv = self.qkv(h).reshape(b, t, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(1, 2)
        k = k.transpose(1, 2)
        v = v.transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-2, -1) / (d // self.heads) ** 0.5, dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, t, d)
        x = x + self.proj(out)
        return x + self.mlp(self.ln2(x))


@pytest.fixture(scope="module")
def tfm(tmp_path_factory):
    torch.manual_seed(0)
    m = TinyTransformerBlock()
    m.eval()
    path = str(tmp_path_factory.mktemp("tfm") / "block.onnx")
    export(m, torch.randn(1, 8, 32), path, opset=14)
    return m, path


def test_attention_block_parity(tfm, rng):
    m, path = tfm
    g = GraphIR.load(path)
    ex = Executor(g)
    x = rng.randn(1, 8, 32).astype(np.float32)
    out, _ = ex.forward(ex.init_params(), {"input": x})
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    got = np.asarray(out[g.network_outputs[0]])
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_external_data_roundtrip(tfm, tmp_path, rng):
    m, path = tfm
    g = GraphIR.load(path)
    g.output_dir = str(tmp_path)
    g.model_type = "unet"  # triggers external-data save
    g.save_onnx_model("ext_model", size_threshold=64)
    assert os.path.exists(str(tmp_path / "ext_model.data"))
    g2 = GraphIR.load(str(tmp_path / "ext_model.onnx"))
    for name, arr in g.initializer.items():
        np.testing.assert_array_equal(g2.initializer[name], arr)
    ex = Executor(g2)
    x = rng.randn(1, 8, 32).astype(np.float32)
    out, _ = ex.forward(ex.init_params(), {"input": x})
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out[g2.network_outputs[0]]), ref,
                               rtol=1e-3, atol=1e-4)


def test_transformer_cli(tfm, tmp_path):
    import json
    from dipoorlet_tpu.runtime.data import make_synthetic_dataset
    from dipoorlet_tpu.__main__ import main
    _, path = tfm
    make_synthetic_dataset(str(tmp_path / "data"), {"input": [1, 8, 32]}, 6, seed=1)
    out = str(tmp_path / "out")
    main(["-M", path, "-I", str(tmp_path / "data"), "-O", out, "-N", "6",
          "-A", "minmax", "-D", "snpe", "--optim_transformer",
          "--batch_size", "2", "--cpu"])
    enc = json.load(open(os.path.join(out, "snpe_encodings.json")))
    assert len(enc["activation_encodings"]) > 5


def test_layernorm_gelu_fusion_parity(tfm, rng):
    """--optim_transformer fusion: decomposed LayerNorm/GELU chains become
    single ops (TPU stand-in for the reference's ORT transformer optimizer,
    reference __main__.py:85-89) with unchanged numerics."""
    from dipoorlet_tpu.graph.transformer_opt import optimize_transformer
    m, path = tfm
    g = GraphIR.load(path)
    n_before = len(g.graph.node)
    fused = optimize_transformer(g)
    ops = [n.op_type for n in g.graph.node]
    assert fused == 4  # ln1, ln2, gelu, attention core
    assert ops.count("LayerNormalization") == 2
    assert ops.count("Gelu") == 1
    assert ops.count("FusedAttention") == 1
    assert "Erf" not in ops and "Softmax" not in ops
    assert len(g.graph.node) < n_before - 10
    ex = Executor(g)
    x = rng.randn(1, 8, 32).astype(np.float32)
    out, _ = ex.forward(ex.init_params(), {"input": x})
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out[g.network_outputs[0]]), ref,
                               rtol=1e-3, atol=1e-5)


def test_fusion_skips_externally_consumed_interior(tfm):
    """A LN interior tensor that is also a network output must block fusion
    of that pattern (its range would otherwise be lost)."""
    from dipoorlet_tpu.graph.transformer_opt import optimize_transformer
    from dipoorlet_tpu import onnx_ir as oir
    _, path = tfm
    g = GraphIR.load(path)
    # promote one ln1 interior tensor to a network output
    interior = "/ln1/Sub_output_0"
    shp = g.tensor_name_shape_map[interior]
    g.add_network_output(oir.make_tensor_value_info(interior, oir.DataType.FLOAT, shp))
    fused = optimize_transformer(g)
    assert fused == 3  # ln2 + gelu + attention still fuse; ln1 blocked
    assert any(n.op_type == "Erf" for n in g.graph.node) is False
    assert any(n.op_type == "ReduceMean" for n in g.graph.node)  # ln1 intact


def test_chunked_stats_match_single_pass(tfm, rng, tmp_path):
    """tap_chunk bounds tensors-per-compiled-pass; results must be
    bit-identical to the single-pass runner and the dataset device cache
    must be shared across chunks (uploaded once)."""
    from dipoorlet_tpu.calib.stats import StatsRunner
    from dipoorlet_tpu.runtime.data import CalibDataset, make_synthetic_dataset
    _, path = tfm
    g = GraphIR.load(path)
    ex = Executor(g)
    params = ex.init_params()
    data_dir = str(tmp_path / "d")
    make_synthetic_dataset(data_dir, {"input": [1, 8, 32]}, 6, seed=2)
    ds = CalibDataset(data_dir, ex.input_shapes(), 6)

    full = StatsRunner(ex)
    chunked = StatsRunner(ex, tap_chunk=5)
    mm_full = full.run_minmax(params, ds, batch_size=2)
    mm_chunk = chunked.run_minmax(params, ds, batch_size=2)
    assert mm_full == mm_chunk
    assert len(chunked._sub_runners()) > 3
    # shared device cache: one dataset upload for all chunks
    assert len(chunked._data_cache) == 1
    s_full, h_full = full.run_minmax_hist(params, ds, 64, batch_size=2)
    s_chunk, h_chunk = chunked.run_minmax_hist(params, ds, 64, batch_size=2)
    assert s_full == s_chunk
    for k in h_full:
        np.testing.assert_array_equal(h_full[k], h_chunk[k])


class MaskInsideScaleBlock(nn.Module):
    """Attention variants where the mask sits BELOW the score scaling —
    value order (scores + mask)/c and where(cond, scores, min)/c — so
    the fusion's additive mask must be pre-multiplied by the outer
    scale (transformer_opt._match_attention scale adjustment)."""

    def __init__(self, dim=32, heads=4, seq=8):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        self.dim = dim
        add_mask = torch.zeros(1, 1, seq, seq)
        add_mask[..., : seq // 2] = -25.0
        self.register_buffer("add_mask", add_mask)
        self.register_buffer("tril", torch.ones(1, 1, seq, seq,
                                                dtype=torch.bool).tril())

    def _heads(self, x):
        b, t, d = x.shape
        qkv = self.qkv(x).reshape(b, t, 3, self.heads, d // self.heads)
        return (qkv[:, :, i].transpose(1, 2) for i in range(3))

    def forward(self, x):
        c = float((self.dim // self.heads) ** 0.5)
        q, k, v = self._heads(x)
        att = torch.softmax((q @ k.transpose(-2, -1) + self.add_mask) / c, -1)
        y = (att @ v).transpose(1, 2).reshape(x.shape)
        x = x + self.proj(y)
        q, k, v = self._heads(x)
        scores = torch.where(self.tril, q @ k.transpose(-2, -1),
                             torch.tensor(torch.finfo(torch.float32).min))
        att = torch.softmax(scores / c, -1)
        y = (att @ v).transpose(1, 2).reshape(x.shape)
        return x + self.proj(y)


def test_attention_fusion_mask_below_scale(tmp_path, rng):
    """Both mask-below-scale orderings must fuse (no Softmax left) and
    stay at parity: the additive mask is divided by the score scale."""
    from dipoorlet_tpu.graph.passes import simplify_graph
    from dipoorlet_tpu.graph.transformer_opt import optimize_transformer
    torch.manual_seed(3)
    m = MaskInsideScaleBlock()
    m.eval()
    path = str(tmp_path / "mask_scale.onnx")
    export(m, torch.randn(1, 8, 32), path, opset=14)
    g = GraphIR.load(path)
    simplify_graph(g)
    optimize_transformer(g)
    ops = [n.op_type for n in g.graph.node]
    assert ops.count("FusedAttention") == 2
    assert "Softmax" not in ops and "Where" not in ops
    ex = Executor(g)
    x = rng.randn(1, 8, 32).astype(np.float32)
    out, _ = ex.forward(ex.init_params(), {"input": x})
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out[g.network_outputs[0]]), ref,
                               rtol=1e-3, atol=1e-5)

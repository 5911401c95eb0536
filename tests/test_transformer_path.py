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

"""Decoder-at-scale evidence: GPT-2 (124M params, 12L/768H, causal
attention) through the WHOLE production CLI on one chip.

The encoder counterpart (bert-base) is covered by tools/bert_budget.py;
this runs the same full pipeline — hist calibration + SmoothQuant +
profiling + deploy + QOperator export — on the decoder family, whose
export shape is different where it matters: causal Where masking and
probs Casts folded into FusedAttention, tanh-approximate GELU, and
Gemm (not MatMul) projections, so the QOP model is QGemm-quantized.
Mirrors the reference's --optim_transformer intent (reference
__main__.py:80-89): big-transformer statistics bounded on device.

Usage: python tools/gpt2_budget.py [--cpu] [--samples 32] [--seq 128]
Writes docs/DECODER_FULL_PIPELINE.json (artifacts in
.model_cache/gpt2_full_pipeline_out).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

from bert_budget import CACHE, run_full_pipeline  # noqa: E402

VOCAB = 50257


def ensure_gpt2(seq: int) -> str:
    path = os.path.join(CACHE, f"gpt2_124m_{seq}.onnx")
    if os.path.exists(path):
        return path
    os.makedirs(CACHE, exist_ok=True)
    import torch
    from transformers import GPT2Config, GPT2Model
    from torch_export import export

    cfg = GPT2Config(attn_implementation="eager")  # stock gpt2: 12L/768H
    torch.manual_seed(0)
    model = GPT2Model(cfg)
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"GPT-2 params: {n_params / 1e6:.1f}M", file=sys.stderr)
    assert n_params > 100e6

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, ids):
            return self.m(input_ids=ids).last_hidden_state

    export(Wrap(model), torch.randint(0, VOCAB, (1, seq)), path)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--seq", type=int, default=128)
    args = ap.parse_args()

    if not args.cpu and os.environ.get("JAX_PLATFORMS", "") == "axon":
        import jax
        jax.config.update("jax_platforms", "axon,cpu")
    from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.path.join(CACHE, "xla_cache"))

    model_path = ensure_gpt2(args.seq)
    data_dir = os.path.join(CACHE, f"gpt2_tokens_{args.seq}_{args.samples}")
    if not os.path.exists(os.path.join(data_dir, ".done")):
        from dipoorlet_tpu.runtime.data import save_sample
        rng = np.random.RandomState(0)
        for i in range(args.samples):
            ids = rng.randint(0, VOCAB, size=(1, args.seq)).astype(np.float32)
            save_sample(data_dir, "input", i, ids)
        open(os.path.join(data_dir, ".done"), "w").write("ok")

    import jax
    res = run_full_pipeline(model_path, data_dir, args.samples,
                            cpu=args.cpu, out_name="gpt2_full_pipeline_out")
    res.update({"model": "gpt2 (random init, 124.4M params, causal)",
                "seq": args.seq, "samples": args.samples,
                "backend": jax.devices()[0].platform,
                "device_kind": getattr(jax.devices()[0], "device_kind", "?")})
    out_json = os.path.join(ROOT, "docs", "DECODER_FULL_PIPELINE.json")
    with open(out_json, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

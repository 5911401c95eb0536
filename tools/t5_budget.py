"""Encoder-decoder-at-scale evidence: T5-small-architecture (random
init, ~60M params) through the WHOLE production CLI on one chip.

Completes the transformer-matrix chip rows (bert_budget.py encoder,
gpt2_budget.py decoder): two integer inputs, cross-attention +
relative-position bias fused into FusedAttention, RMS-style norms, and
MatMul projections QOP-quantized.

Usage: python tools/t5_budget.py [--cpu] [--samples 32] [--seq 64]
Writes docs/ENCDEC_FULL_PIPELINE.json (artifacts in
.model_cache/t5_full_pipeline_out).
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

VOCAB = 32128


def ensure_t5(seq: int) -> str:
    path = os.path.join(CACHE, f"t5_small_{seq}.onnx")
    if os.path.exists(path):
        return path
    os.makedirs(CACHE, exist_ok=True)
    import torch
    from transformers import T5Config, T5Model
    from torch_export import export

    cfg = T5Config()  # stock t5-small architecture: 6L/512H enc+dec
    torch.manual_seed(0)
    model = T5Model(cfg)
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"T5 params: {n_params / 1e6:.1f}M", file=sys.stderr)
    assert n_params > 40e6

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, enc_ids, dec_ids):
            return self.m(input_ids=enc_ids,
                          decoder_input_ids=dec_ids).last_hidden_state

    export(Wrap(model), (torch.randint(0, VOCAB, (1, seq)),
                         torch.randint(0, VOCAB, (1, seq))), path, opset=14)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--seq", type=int, default=64)
    args = ap.parse_args()

    if not args.cpu and os.environ.get("JAX_PLATFORMS", "") == "axon":
        import jax
        jax.config.update("jax_platforms", "axon,cpu")
    from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.path.join(CACHE, "xla_cache"))

    model_path = ensure_t5(args.seq)
    data_dir = os.path.join(CACHE, f"t5_tokens_{args.seq}_{args.samples}")
    if not os.path.exists(os.path.join(data_dir, ".done")):
        from dipoorlet_tpu.runtime.data import save_sample
        rng = np.random.RandomState(0)
        for i in range(args.samples):
            for name in ("input_0", "input_1"):
                ids = rng.randint(0, VOCAB, size=(1, args.seq)).astype(np.float32)
                save_sample(data_dir, name, i, ids)
        open(os.path.join(data_dir, ".done"), "w").write("ok")

    import jax
    res = run_full_pipeline(model_path, data_dir, args.samples,
                            cpu=args.cpu, out_name="t5_full_pipeline_out")
    res.update({"model": "t5-small architecture (random init, enc+dec)",
                "seq": args.seq, "samples": args.samples,
                "backend": jax.devices()[0].platform,
                "device_kind": getattr(jax.devices()[0], "device_kind", "?")})
    out_json = os.path.join(ROOT, "docs", "ENCDEC_FULL_PIPELINE.json")
    with open(out_json, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

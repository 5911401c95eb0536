"""Decoder-family accuracy: a REALLY-TRAINED small GPT-2 language model
quantized through the production CLI, measured on held-out next-token
top-1.

The image families (tools/train_eval_accuracy.py) measure top-1 on a
procedural vision task; this is the decoder analogue: sequences from a
fixed random second-order Markov chain (each (prev2, prev1) pair has one
preferred next token with probability P_PREF, rest uniform), so the
Bayes-optimal next-token top-1 is exactly P_PREF and a small GPT-2 must
learn a 3-gram table through its causal-attention stack to reach it.
Quantization damage appears as a drop below the trained FP32 accuracy;
SmoothQuant/AdaRound recovery is measured the same way the ViT family's
was.

Usage:
  python tools/train_eval_lm.py [--steps 1500] [--n_calib 64]
      [--n_test 256] [--epochs 1000] [--cpu] [--configs substr,substr]
Writes docs/accuracy_gpt2_lm.json and appends to docs/ACCURACY.md.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

VOCAB = 64
SEQ = 32
P_PREF = 0.75  # Bayes-optimal next-token top-1

# all rows run the transformer path (--optim_transformer) like the
# reference's transformer protocol: attention fusion erases the
# masked-score interiors whose -inf range cannot carry a scale.  The
# one "unfused" row runs WITHOUT it to exercise quant_graph's
# non-finite-range guard (mask tensors are skipped with a warning
# instead of silently zeroing the scores).
CONFIGS = [
    ("int8 minmax unfused", ["-A", "minmax"]),
    ("int8 minmax", ["-A", "minmax", "--optim_transformer"]),
    ("int8 mse (OCTAV)", ["-A", "mse", "--optim_transformer"]),
    ("int8 mse SmoothQuant", ["-A", "mse", "--smooth_quant",
                              "--optim_transformer"]),
    ("w4a8 naive", ["--w_bit", "4", "--optim_transformer"]),
    ("w4a8 AdaRound", ["--w_bit", "4", "--adaround", "--optim_transformer"]),
    ("w4a4 naive", ["--w_bit", "4", "--a_bit", "4", "--optim_transformer"]),
    ("w4a4 BRECQ+QDrop", ["--w_bit", "4", "--a_bit", "4", "--brecq",
                          "--drop", "--optim_transformer"]),
    # does outlier migration recover the a4 activation damage?
    ("w4a4 SmoothQuant", ["--w_bit", "4", "--a_bit", "4", "--smooth_quant",
                          "--optim_transformer"]),
    ("w4a4 SmoothQuant BRECQ+QDrop",
     ["--w_bit", "4", "--a_bit", "4", "--smooth_quant", "--brecq", "--drop",
      "--optim_transformer"]),
]


class MarkovLM:
    """Second-order Markov source: next = preferred[(prev2, prev1)] with
    prob P_PREF, else uniform over the remaining tokens."""

    def __init__(self, seed=0):
        rng = np.random.RandomState(seed)
        self.preferred = rng.randint(0, VOCAB, size=(VOCAB, VOCAB))

    def batch(self, rng, n, seq=SEQ):
        ids = np.zeros((n, seq), dtype=np.int64)
        ids[:, 0] = rng.randint(0, VOCAB, size=n)
        ids[:, 1] = rng.randint(0, VOCAB, size=n)
        for t in range(2, seq):
            pref = self.preferred[ids[:, t - 2], ids[:, t - 1]]
            take = rng.rand(n) < P_PREF
            rand = rng.randint(0, VOCAB, size=n)
            ids[:, t] = np.where(take, pref, rand)
        return ids


def build_model(seed=0):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel
    cfg = GPT2Config(vocab_size=VOCAB, n_positions=SEQ, n_embd=128,
                     n_layer=4, n_head=4, attn_implementation="eager")
    torch.manual_seed(seed)
    return GPT2LMHeadModel(cfg)


def train(steps, log=print, seed=0):
    import torch
    import torch.nn.functional as F
    torch.set_num_threads(os.cpu_count() or 8)
    model = build_model(seed)
    model.train()
    src = MarkovLM()
    rng = np.random.RandomState(1)
    opt = torch.optim.Adam(model.parameters(), lr=3e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    t0 = time.time()
    for it in range(steps):
        ids = torch.from_numpy(src.batch(rng, 64))
        logits = model(input_ids=ids).logits
        loss = F.cross_entropy(logits[:, :-1].reshape(-1, VOCAB),
                               ids[:, 1:].reshape(-1))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if it % 100 == 0 or it == steps - 1:
            acc = (logits[:, 2:-1].argmax(-1) == ids[:, 3:]).float().mean()
            log(f"step {it}: loss {float(loss):.3f} next-top1 {float(acc):.3f} "
                f"({time.time() - t0:.0f}s)  [bayes {P_PREF}]")
    model.eval()
    return model, src


def eval_next_top1_onnx(model_path, ids_test, batch=64):
    """Held-out next-token top-1 (positions >= 2, where the 3-gram
    context exists) of an ONNX model via our executor."""
    import jax
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime import Executor
    g = GraphIR.load(model_path)
    ex = Executor(g)
    params = ex.init_params()
    fn = ex.make_batched(outputs=[g.network_outputs[0]])
    correct = total = 0
    for i in range(0, len(ids_test), batch):
        chunk = ids_test[i:i + batch]
        out, _ = fn(params, {"input": chunk[:, None].astype(np.float32)})
        logits = np.asarray(jax.device_get(out[g.network_outputs[0]]))
        logits = logits.reshape(len(chunk), SEQ, VOCAB)
        pred = logits[:, 2:-1].argmax(-1)
        correct += int((pred == chunk[:, 3:]).sum())
        total += pred.size
    return correct / total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--n_calib", type=int, default=64)
    p.add_argument("--n_test", type=int, default=256)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--ada_bs", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--configs", default=None)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS") == "axon":
        jax.config.update("jax_platforms", "axon,cpu")
    # accuracy, not throughput: pin matmul precision (see
    # train_eval_accuracy.py — bf16 default cost an undertrained model 7.7%)
    jax.config.update("jax_default_matmul_precision", "highest")

    import torch
    from torch_export import export
    from dipoorlet_tpu.runtime.data import save_sample
    from dipoorlet_tpu.__main__ import main as cli_main
    from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.path.join(ROOT, ".model_cache", "xla_cache"))

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    ws = os.path.join(ROOT, ".model_cache", "trained_gpt2_lm")
    os.makedirs(ws, exist_ok=True)
    model_path = os.path.join(ws, "model.onnx")
    state_path = os.path.join(ws, "model.pt")

    if os.path.exists(state_path):
        log("loading trained weights from cache")
        model = build_model()
        model.load_state_dict(torch.load(state_path, weights_only=True))
        model.eval()
        src = MarkovLM()
    else:
        model, src = train(args.steps, log=log)
        torch.save(model.state_dict(), state_path)

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, ids):
            return self.m(input_ids=ids).logits

    export(Wrap(model), torch.randint(0, VOCAB, (1, SEQ)), model_path)

    test_rng = np.random.RandomState(999)
    ids_test = src.batch(test_rng, args.n_test)
    with torch.no_grad():
        tl = Wrap(model)(torch.from_numpy(ids_test)).numpy()
    fp_torch = float((tl[:, 2:-1].argmax(-1) == ids_test[:, 3:]).mean())
    log(f"FP32 torch next-top1: {fp_torch:.4f} (bayes-optimal {P_PREF})")

    fp_top1 = eval_next_top1_onnx(model_path, ids_test)
    log(f"FP32 onnx/executor next-top1: {fp_top1:.4f}")

    calib_dir = os.path.join(ws, "calib")
    if not os.path.exists(os.path.join(calib_dir, ".done")):
        calib_rng = np.random.RandomState(7)
        ids_c = src.batch(calib_rng, args.n_calib)
        for i in range(args.n_calib):
            save_sample(calib_dir, "input", i,
                        ids_c[i:i + 1].astype(np.float32))
        open(os.path.join(calib_dir, ".done"), "w").write("ok")

    def _merged_result(rows):
        result = {
            "model": "gpt2-small-lm (4L/128H/64V, causal, trained from scratch)",
            "task": f"2nd-order Markov LM, bayes-optimal next-top1 {P_PREF}",
            "seq": SEQ, "train_steps": args.steps, "n_test": args.n_test,
            "n_calib": args.n_calib, "recon_epochs": args.epochs,
            "fp32_next_top1": fp_top1, "fp32_torch_next_top1": fp_torch,
            "rows": list(rows),
            "protocol": "trained-from-scratch decoder on a synthetic 3-gram "
                        "source; held-out next-token top-1; quantized via the "
                        "production CLI",
        }
        path = os.path.join(ROOT, "docs", "accuracy_gpt2_lm.json")
        if os.path.exists(path):
            prior = json.load(open(path))
            newer = {r["config"] for r in result["rows"]}
            result["rows"] = [r for r in prior.get("rows", [])
                              if r["config"] not in newer] + result["rows"]
        return result, path

    rows = []
    for name, extra in CONFIGS:
        if args.configs and not any(s in name for s in args.configs.split(",")):
            continue
        out_dir = os.path.join(ws, "out_" + name.replace(" ", "_")
                               .replace("+", "_").replace("(", "").replace(")", ""))
        shutil.rmtree(out_dir, ignore_errors=True)
        argv = ["-M", model_path, "-I", calib_dir, "-O", out_dir,
                "-N", str(args.n_calib), "-D", "trt", "--batch_size", "16",
                "--ada_epoch", str(args.epochs), "--ada_bs", str(args.ada_bs)] + extra
        if args.cpu:
            argv.append("--cpu")
        t0 = time.time()
        cli_main(argv)
        wall = time.time() - t0
        q_top1 = eval_next_top1_onnx(os.path.join(out_dir, "quant_model.onnx"),
                                     ids_test)
        delta = fp_top1 - q_top1
        rows.append({"config": name, "next_top1": q_top1, "delta": delta,
                     "pipeline_s": round(wall, 1)})
        log(f"{name}: next-top1 {q_top1:.4f} (Δ {delta:+.4f}) in {wall:.0f}s")
        # a multi-config run over the remote TPU can take tens of minutes
        # and a late crash must not lose completed rows: merge-write the
        # docs json after EVERY row, not only at the end
        result, path = _merged_result(rows)
        with open(path, "w") as f:
            json.dump(result, f, indent=2)

    result, path = _merged_result(rows)
    with open(path, "w") as f:
        json.dump(result, f, indent=2)

    md = ["", f"## gpt2-small LM (decoder, trained; bayes {P_PREF}, "
              f"FP32 next-top1 {fp_top1:.3f})", "",
          "| config | next-top1 | Δ vs FP32 |", "|---|---|---|"]
    for r in result["rows"]:
        md.append(f"| {r['config']} | {r['next_top1']:.4f} | {r['delta']:+.4f} |")
    with open(os.path.join(ROOT, "docs", "ACCURACY.md"), "a") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

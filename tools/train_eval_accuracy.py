"""Measured top-1 accuracy deltas through the real quantization pipeline.

BASELINE.md's north-star bands are ImageNet top-1 Δ-vs-FP32 from the
AdaRound/BRECQ/QDrop papers.  This container has no ImageNet, no
pretrained weights and zero egress, so the protocol here is the closest
measurable analogue: TRAIN a model from the zoo on a procedurally
generated labeled image task (class-specific textures + shape masks +
heavy noise, tuned so FP32 top-1 is NOT saturated), then quantize it
with the production CLI at each config and measure the true held-out
top-1 drop.  Unlike prediction-agreement proxies this measures real
accuracy of a really-trained network; the distribution is synthetic and
is documented as such next to the paper bands.

Usage:
  python tools/train_eval_accuracy.py [--model resnet18] [--size 64]
      [--steps 1500] [--n_calib 64] [--n_test 1000] [--epochs 1000] [--cpu]
Appends a row table to docs/ACCURACY.md and writes docs/accuracy_<model>.json.
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

N_CLASSES = 20

CONFIGS = [
    ("int8 minmax", ["-A", "minmax"]),  # CLI default is mse (reference parity)
    ("int8 hist", ["-A", "hist"]),
    ("int8 kl", ["-A", "kl"]),
    ("int8 mse (OCTAV)", ["-A", "mse"]),
    # transformer-outlier row: per-tensor int8 visibly damages ViTs
    # (LayerNorm-fed MatMuls); SmoothQuant migrates the outliers into the
    # weights — measured recovery on the trained ViT family
    ("int8 mse SmoothQuant", ["-A", "mse", "--smooth_quant",
                              "--optim_transformer"]),
    ("w4a8 naive", ["--w_bit", "4"]),
    ("w4a8 AdaRound", ["--w_bit", "4", "--adaround"]),
    ("w4a4 naive", ["--w_bit", "4", "--a_bit", "4"]),
    ("w4a4 BRECQ+QDrop", ["--w_bit", "4", "--a_bit", "4", "--brecq", "--drop"]),
    # the W2A4 regime is where PTQ visibly breaks without reconstruction
    # (QDrop paper: 64.7% vs FP 71% even WITH reconstruction) — included to
    # show the task detects quantization damage and reconstruction recovers it
    ("w2a4 naive", ["--w_bit", "2", "--a_bit", "4"]),
    ("w2a4 BRECQ+QDrop", ["--w_bit", "2", "--a_bit", "4", "--brecq", "--drop"]),
    # sparse-quant: 50% magnitude pruning + int8 with STE finetuning —
    # accuracy evidence for the sparse reconstruction path
    ("int8 sparse50", ["-A", "minmax", "--sparse", "--sparse_rate", "0.5"]),
    ("int8 sparse50 nv24", ["-A", "minmax", "--sparse", "--pattern", "nv24"]),
]


class TextureShapes:
    """Deterministic procedural labeled images with a built-in error floor.

    The class signal is an oriented grating (orientations pi/N apart)
    under pixel noise, shared background texture, and random gain.  Each
    sample's orientation is jittered by N(0, ORI_JITTER) class-widths, so
    a fraction of samples genuinely lies closer to a neighboring class:
    the Bayes error is ~2*(1-Phi(0.5/ORI_JITTER)) ≈ 13%, which pins the
    FP32 plateau near ~85-88% top-1 regardless of training budget.  That
    head-room is the point — quantization error perturbs the decision
    boundary and shows up as a true held-out top-1 drop, instead of
    vanishing against a saturated task."""

    ORI_JITTER = 0.33  # class-widths of sigma; floor ≈ 2(1-Φ(.5/.33)) ≈ 13%

    def __init__(self, size=64, seed=0, noise=1.3, mix=0.45):
        self.size = size
        self.noise = noise
        self.mix = mix
        rng = np.random.RandomState(seed)
        low = rng.randn(3, 8, 8).astype(np.float32)
        self.texture = np.kron(low, np.ones((size // 8, size // 8), np.float32))
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        self._grid = (xx, yy)

    def _grating(self, c, jitter, freq):
        xx, yy = self._grid
        theta = np.pi * (c + jitter) / N_CLASSES
        # freq is class-INDEPENDENT: orientation must be the only class
        # signal, or boundary samples could be disambiguated by frequency
        # and the designed Bayes floor would vanish.
        g = np.sin(2 * np.pi * freq * (np.cos(theta) * xx + np.sin(theta) * yy))
        return g[None].astype(np.float32)

    def batch(self, rng, n):
        xs = np.empty((n, 3, self.size, self.size), np.float32)
        ys = rng.randint(0, N_CLASSES, size=n)
        for i, c in enumerate(ys):
            freq = 5.0 + 1.5 * rng.rand()
            p = self.mix * self._grating(c, self.ORI_JITTER * rng.randn(), freq) \
                + 0.3 * self.texture
            p = np.roll(p, (rng.randint(self.size), rng.randint(self.size)), axis=(1, 2))
            gain = 0.6 + 0.8 * rng.rand()
            x = gain * p + self.noise * rng.randn(*p.shape).astype(np.float32)
            xs[i] = x
        return xs, ys


def train(model_name, size, steps, seed=0, log=print):
    import torch
    import torch.nn.functional as F
    from torch_export import MODEL_ZOO
    torch.manual_seed(seed)
    torch.set_num_threads(os.cpu_count() or 8)
    model = MODEL_ZOO[model_name](num_classes=N_CLASSES)
    model.train()
    gen = TextureShapes(size=size)
    rng = np.random.RandomState(1)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    t0 = time.time()
    for it in range(steps):
        xs, ys = gen.batch(rng, 64)
        logits = model(torch.from_numpy(xs))
        loss = F.cross_entropy(logits, torch.from_numpy(ys))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if it % 100 == 0 or it == steps - 1:
            acc = (logits.argmax(1).numpy() == ys).mean()
            log(f"step {it}: loss {float(loss):.3f} acc {acc:.3f} "
                f"({time.time() - t0:.0f}s)")
    model.eval()
    return model, gen


def eval_top1_onnx(model_path, xs, ys, batch=50):
    """Top-1 of an ONNX model (FP32 or QDQ) via our executor."""
    import jax
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime import Executor
    g = GraphIR.load(model_path)
    ex = Executor(g)
    params = ex.init_params()
    fn = ex.make_batched(outputs=[g.network_outputs[0]])
    correct = 0
    for i in range(0, len(xs), batch):
        # make_batched expects (B, *declared_shape) = (B, 1, 3, H, W)
        out, _ = fn(params, {"input": xs[i:i + batch, None]})
        pred = np.asarray(jax.device_get(out[g.network_outputs[0]]))
        pred = pred.reshape(pred.shape[0], -1).argmax(1)
        correct += int((pred == ys[i:i + batch]).sum())
    return correct / len(xs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="resnet18")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--n_calib", type=int, default=64)
    p.add_argument("--n_test", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=1000, help="adaround/brecq epochs")
    p.add_argument("--ada_bs", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--configs", default=None,
                   help="comma-separated substring filter of config names")
    p.add_argument("--corrupt_calib", type=int, default=0,
                   help="corrupt this many PIXELS (total, spread over the "
                   "first calibration sample) with +-corrupt_amp hot values: "
                   "the corrupted-calibration-set protocol that separates "
                   "minmax (stretches every range to the outliers) from "
                   "hist/mse (clip them).  Eval data stays clean.")
    p.add_argument("--corrupt_amp", type=float, default=60.0)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS") == "axon":
        jax.config.update("jax_platforms", "axon,cpu")
    # top-1 measurement must not be perturbed by TPU's default bf16 matmul
    # precision: an under-trained model (regnet@1500 steps) lost 7.7% top-1
    # to it.  Slower, but this tool measures accuracy, not throughput.
    jax.config.update("jax_default_matmul_precision", "highest")

    import torch
    from torch_export import export
    from dipoorlet_tpu.runtime.data import save_sample
    from dipoorlet_tpu.__main__ import main as cli_main

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    ws = os.path.join(ROOT, ".model_cache", f"trained_{args.model}_{args.size}")
    os.makedirs(ws, exist_ok=True)
    model_path = os.path.join(ws, "model.onnx")
    state_path = os.path.join(ws, "model.pt")

    from torch_export import MODEL_ZOO
    if os.path.exists(state_path):
        log("loading trained weights from cache")
        model = MODEL_ZOO[args.model](num_classes=N_CLASSES)
        model.load_state_dict(torch.load(state_path, weights_only=True))
        model.eval()
        gen = TextureShapes(size=args.size)
    else:
        model, gen = train(args.model, args.size, args.steps, log=log)
        torch.save(model.state_dict(), state_path)
    export(model, torch.randn(1, 3, args.size, args.size), model_path)

    # held-out test set (seed disjoint from training stream)
    test_rng = np.random.RandomState(999)
    xs_test, ys_test = gen.batch(test_rng, args.n_test)
    with torch.no_grad():
        fp_torch = (model(torch.from_numpy(xs_test)).argmax(1).numpy() == ys_test).mean()
    log(f"FP32 torch top-1: {fp_torch:.4f}")

    fp_top1 = eval_top1_onnx(model_path, xs_test, ys_test)
    log(f"FP32 onnx/executor top-1: {fp_top1:.4f}")

    # calibration data from the training distribution; optionally with a
    # handful of hot pixels in the first sample (rare-corruption protocol)
    tag = (f"calib_hot{args.corrupt_calib}x{int(args.corrupt_amp)}"
           if args.corrupt_calib else "calib")
    calib_dir = os.path.join(ws, tag)
    if not os.path.exists(os.path.join(calib_dir, ".done")):
        calib_rng = np.random.RandomState(7)
        xs_c, _ = gen.batch(calib_rng, args.n_calib)
        if args.corrupt_calib:
            k = args.corrupt_calib
            flat = xs_c[0].reshape(-1)
            pos = calib_rng.choice(flat.size, size=k, replace=False)
            flat[pos] = args.corrupt_amp * np.where(calib_rng.rand(k) < 0.5, -1, 1)
            log(f"corrupted calib sample 0: {k} pixels at +-{args.corrupt_amp}")
        for i in range(args.n_calib):
            save_sample(calib_dir, "input", i, xs_c[i:i + 1])
        open(os.path.join(calib_dir, ".done"), "w").write("ok")

    rows = []
    suffix = " (hot-calib)" if args.corrupt_calib else ""
    for name, extra in CONFIGS:
        if args.configs and not any(s in name for s in args.configs.split(",")):
            continue
        name = name + suffix
        out_dir = os.path.join(ws, "out_" + name.replace(" ", "_").replace("+", "_")
                               .replace("(", "").replace(")", ""))
        shutil.rmtree(out_dir, ignore_errors=True)
        argv = ["-M", model_path, "-I", calib_dir, "-O", out_dir,
                "-N", str(args.n_calib), "-D", "trt",
                "--batch_size", "16",
                "--ada_epoch", str(args.epochs), "--ada_bs", str(args.ada_bs)] + extra
        if args.cpu:
            argv.append("--cpu")
        t0 = time.time()
        cli_main(argv)
        wall = time.time() - t0
        q_top1 = eval_top1_onnx(os.path.join(out_dir, "quant_model.onnx"),
                                xs_test, ys_test)
        delta = fp_top1 - q_top1
        rows.append({"config": name, "top1": q_top1, "delta": delta,
                     "pipeline_s": round(wall, 1)})
        log(f"{name}: top-1 {q_top1:.4f} (Δ {delta:+.4f}) in {wall:.0f}s")
        # incremental dump: a multi-config run over the remote TPU can take
        # tens of minutes — never lose completed rows to a late failure
        with open(os.path.join(ws, "rows_partial.json"), "w") as f:
            json.dump({"fp32_top1": fp_top1, "rows": rows}, f, indent=2)

    result = {
        "model": args.model, "size": args.size, "train_steps": args.steps,
        "n_test": args.n_test, "n_calib": args.n_calib,
        "recon_epochs": args.epochs,
        "corrupt_calib_pixels": args.corrupt_calib,
        "fp32_top1": fp_top1, "rows": rows,
        "protocol": "trained-from-scratch on procedural TextureShapes; "
                    "held-out top-1; quantized via production CLI"
                    + (f"; calib set carries {args.corrupt_calib} hot pixels "
                       f"(+-{args.corrupt_amp}), eval data clean"
                       if args.corrupt_calib else ""),
    }
    os.makedirs(os.path.join(ROOT, "docs"), exist_ok=True)
    fname = (f"accuracy_{args.model}_hot{args.corrupt_calib}x"
             f"{int(args.corrupt_amp)}.json" if args.corrupt_calib
             else f"accuracy_{args.model}.json")
    path = os.path.join(ROOT, "docs", fname)
    if os.path.exists(path):
        # partial (--configs-filtered) runs merge into the existing table
        # instead of clobbering it; re-run rows replace by config name
        prior = json.load(open(path))
        newer = {r["config"] for r in result["rows"]}
        result["rows"] = [r for r in prior.get("rows", [])
                          if r["config"] not in newer] + result["rows"]
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    write_markdown(result)
    print(json.dumps(result))


def write_markdown(result, out=None):
    """Append a measured Δ-top-1 table to docs/ACCURACY.md."""
    out = out or os.path.join(ROOT, "docs", "ACCURACY.md")
    lines = []
    if not os.path.exists(out):
        lines += ["# Measured accuracy through the production pipeline\n",
                  "Held-out top-1 of really-trained networks, quantized via the",
                  "full CLI (`tools/train_eval_accuracy.py`).  The data",
                  "distribution is procedural (no ImageNet in-container; see the",
                  "tool docstring) with a designed ~13% Bayes floor, so FP32 is",
                  "not saturated and quantization error surfaces as a true",
                  "top-1 drop — the measurable analogue of the paper bands in",
                  "BASELINE.md.\n"]
    lines += [f"\n## {result['model']} @{result['size']} "
              f"(FP32 top-1 {result['fp32_top1']:.4f}, "
              f"{result['n_test']} test / {result['n_calib']} calib samples, "
              f"recon epochs {result['recon_epochs']})\n",
              "| Config | top-1 | Δ vs FP32 | pipeline s |",
              "|---|---|---|---|"]
    for r in result["rows"]:
        lines.append(f"| {r['config']} | {r['top1']:.4f} | "
                     f"{r['delta']:+.4f} | {r['pipeline_s']} |")
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()

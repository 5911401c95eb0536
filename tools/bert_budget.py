"""Transformer-scale calibration evidence: BERT-base (~110M params)
through the production CLI within a stated HBM budget.

The reference bounds transformer memory by switching stats to the
per-node ActivationCache (reference forward_net.py:345-456); here the
stats reduce in-trace, `--stats_chunk` bounds tensors-per-compiled-pass,
and `--optim_transformer` fuses decomposed LayerNorm/GELU first.  This
tool runs the real pipeline and reports wall time + peak device memory.

Usage: python tools/bert_budget.py [--cpu] [--samples 32] [--seq 128]
Writes results to docs/TRANSFORMER_BUDGET.json (alongside run artifacts
in .model_cache/bert_budget_out).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

CACHE = os.path.join(ROOT, ".model_cache")
VOCAB = 30522


def ensure_bert(seq: int) -> str:
    path = os.path.join(CACHE, f"bert_base_{seq}.onnx")
    if os.path.exists(path):
        return path
    os.makedirs(CACHE, exist_ok=True)
    import torch
    from transformers import BertConfig, BertModel
    from torch_export import export

    cfg = BertConfig(attn_implementation="eager")  # stock bert-base: 12L/768H
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"BERT-base params: {n_params / 1e6:.1f}M", file=sys.stderr)
    assert n_params > 100e6

    class Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, ids):
            return self.m(input_ids=ids).last_hidden_state

    export(Wrap(model), torch.randint(0, VOCAB, (1, seq)), path)
    return path


def run_full_pipeline(model_path, data_dir, samples, deploy="magicmind",
                      cpu=False, out_name="bert_full_pipeline_out"):
    """Whole-CLI transformer run (round-5 verdict item 6): calibration +
    SmoothQuant + profiling + deploy + QOperator export on bert-base,
    with a per-phase wall split captured from the CLI's own phase logs.
    Deploy target magicmind: the one platform whose quant_nodes include
    MatMul, so the QOP model actually quantizes the attention/FFN
    matmuls (trt's table has no MatMul — a bert QOP there is vacuous).
    Reused by tools/gpt2_budget.py for the decoder-at-scale row."""
    import datetime
    import glob
    import re

    from dipoorlet_tpu.__main__ import main as cli_main

    out_dir = os.path.join(CACHE, out_name)
    argv = ["-M", model_path, "-I", data_dir, "-O", out_dir,
            "-N", str(samples), "-A", "hist", "-D", deploy,
            "--batch_size", "8", "--optim_transformer", "--smooth_quant",
            "--quant_format", "QOP"]
    if cpu:
        argv.append("--cpu")
    t0 = time.time()
    cli_main(argv)
    wall = time.time() - t0

    # per-phase split from the CLI's own log file timestamps (setup_logger
    # clears foreign handlers, so an attached spy handler never survives)
    pat = re.compile(r"\[(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) .*: INFO "
                     r"(Do tensor calibration|Weight transform|Profiling"
                     r"|Deploy to \w+|Total time cost)")
    marks = []
    logf = sorted(glob.glob(os.path.join(out_dir, "log-*.txt")))[-1]
    for line in open(logf):
        m = pat.search(line)
        if m:
            ts = datetime.datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S")
            marks.append((ts, m.group(2)))
    phases = {}
    for (t_a, name), (t_b, _) in zip(marks, marks[1:]):
        phases[name] = round(phases.get(name, 0.0)
                             + (t_b - t_a).total_seconds(), 1)
    qop_path = os.path.join(out_dir, "qop_model.onnx")
    from dipoorlet_tpu.onnx_ir import load_model
    ops = {}
    for n in load_model(qop_path).graph.node:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1

    # peak device bytes: XLA's compiled memory analysis of the widest
    # stats program + resident params + the device dataset cache (device
    # memory_stats is unavailable over the relay)
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.graph.transformer_opt import optimize_transformer
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset
    from dipoorlet_tpu.calib.stats import StatsRunner
    g = GraphIR.load(model_path)
    optimize_transformer(g)
    ex = Executor(g)
    ds = CalibDataset(data_dir, ex.input_shapes(), samples)
    mem = StatsRunner(ex, tap_chunk=512).memory_analysis(
        ex.init_params(), ds, batch_size=8)
    peak = mem["params_bytes"] + mem["batch_bytes"] + mem["peak_step_bytes"]
    return {
        "peak_device_bytes": int(peak),
        "peak_device_gb": round(peak / 2**30, 3),
        "cmd": "python -m dipoorlet_tpu " + " ".join(argv),
        "wall_s": round(wall, 1),
        "phase_split_s": phases,
        "artifacts": sorted(os.listdir(out_dir)),
        "qop_quantized_matmuls": ops.get("QLinearMatMul", 0) + ops.get("QGemm", 0),
        "qop_op_histogram": {k: v for k, v in sorted(ops.items())},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--algo", default="hist")
    ap.add_argument("--budget_gb", type=float, default=8.0,
                    help="stated HBM budget the run must stay within")
    ap.add_argument("--chunk_sweep", action="store_true",
                    help="also time warm passes at stats_chunk 256/512/1024 "
                    "(3 extra compiles; persistent-cached)")
    ap.add_argument("--full", action="store_true",
                    help="run the WHOLE pipeline (smooth_quant + profiling "
                    "+ deploy + QOP) and write TRANSFORMER_FULL_PIPELINE.json")
    args = ap.parse_args()

    if not args.cpu and os.environ.get("JAX_PLATFORMS", "") == "axon":
        import jax
        jax.config.update("jax_platforms", "axon,cpu")
    from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.path.join(CACHE, "xla_cache"))

    model_path = ensure_bert(args.seq)
    data_dir = os.path.join(CACHE, f"bert_tokens_{args.seq}_{args.samples}")
    if not os.path.exists(os.path.join(data_dir, ".done")):
        from dipoorlet_tpu.runtime.data import save_sample
        rng = np.random.RandomState(0)
        for i in range(args.samples):
            ids = rng.randint(0, VOCAB, size=(1, args.seq)).astype(np.float32)
            save_sample(data_dir, "input", i, ids)
        open(os.path.join(data_dir, ".done"), "w").write("ok")

    if args.full:
        import jax
        res = run_full_pipeline(model_path, data_dir, args.samples,
                                cpu=args.cpu)
        res.update({"model": "bert-base (random init, 109.5M params)",
                    "seq": args.seq, "samples": args.samples,
                    "backend": jax.devices()[0].platform,
                    "device_kind": getattr(jax.devices()[0], "device_kind", "?")})
        out_json = os.path.join(ROOT, "docs", "TRANSFORMER_FULL_PIPELINE.json")
        with open(out_json, "w") as f:
            json.dump(res, f, indent=2)
        print(json.dumps(res))
        return

    out_dir = os.path.join(CACHE, "bert_budget_out")
    argv = ["-M", model_path, "-I", data_dir, "-O", out_dir,
            "-N", str(args.samples), "-A", args.algo, "-D", "trt",
            "--batch_size", "8", "--optim_transformer"]
    if args.cpu:
        argv.append("--cpu")

    from dipoorlet_tpu.__main__ import main as cli_main
    t0 = time.time()
    cli_main(argv)
    wall = time.time() - t0

    import jax
    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    peak_live = stats.get("peak_bytes_in_use", 0)

    # device memory_stats is unavailable over the remote relay, so ALWAYS
    # compute XLA's own compiled memory analysis of the widest stats
    # program (+ resident params and the device dataset cache) — this is
    # the number the budget is judged against; peak_live corroborates it
    # when the backend reports one
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset
    from dipoorlet_tpu.calib.stats import StatsRunner
    g = GraphIR.load(model_path)
    from dipoorlet_tpu.graph.transformer_opt import optimize_transformer
    optimize_transformer(g)
    ex = Executor(g)
    params = ex.init_params()
    ds = CalibDataset(data_dir, ex.input_shapes(), args.samples)
    runner = StatsRunner(ex, tap_chunk=512)
    mem_report = runner.memory_analysis(params, ds, batch_size=8)
    peak = (mem_report["params_bytes"] + mem_report["batch_bytes"]
            + mem_report["peak_step_bytes"])

    # steady-state throughput: one compile pass, then a warm repeat (the
    # per-sample cost once programs are cached) — 393s-wall-for-32-samples
    # without the compile/steady split told us nothing (VERDICT r2 weak #5)
    bins = 2048
    t0 = time.time()
    mm = runner.run_minmax_hist(params, ds, bins, batch_size=8)[0]
    compile_pass_s = time.time() - t0
    t0 = time.time()
    runner.run_minmax_hist(params, ds, bins, batch_size=8)
    warm_pass_s = time.time() - t0
    chunk_curve = None
    if args.chunk_sweep:
        chunk_curve = {}
        for chunk in (256, 512, 1024):
            r = StatsRunner(ex, tap_chunk=chunk)
            r.run_minmax_hist(params, ds, bins, batch_size=8)
            t0 = time.time()
            r.run_minmax_hist(params, ds, bins, batch_size=8)
            chunk_curve[str(chunk)] = round(time.time() - t0, 2)
    del mm

    result = {
        "model": "bert-base (random init, 109.5M params)",
        "seq": args.seq,
        "samples": args.samples,
        "algo": args.algo,
        "backend": dev.platform,
        "device_kind": getattr(dev, "device_kind", "?"),
        "wall_s": round(wall, 1),
        "stats_compile_plus_pass_s": round(compile_pass_s, 1),
        "stats_warm_pass_s": round(warm_pass_s, 2),
        "warm_samples_per_s": round(args.samples / warm_pass_s, 2),
        "stats_chunk_warm_s": chunk_curve,
        "peak_device_bytes": int(peak),
        "peak_device_gb": round(peak / 2**30, 3),
        "peak_bytes_in_use_reported": int(peak_live),
        "budget_gb": args.budget_gb,
        "within_budget": bool(peak <= args.budget_gb * 2**30),
        "xla_memory_analysis": mem_report,
    }
    os.makedirs(os.path.join(ROOT, "docs"), exist_ok=True)
    with open(os.path.join(ROOT, "docs", "TRANSFORMER_BUDGET.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""AdaRound at the REFERENCE'S own scale, on the real chip.

The reference's default reconstruction protocol is ada_epoch=5000,
ada_bs=64 (/root/reference/dipoorlet/__main__.py:42-43) on ImageNet-res
inputs; every wall-clock recorded before round 4 used 100-1000 epochs on
16-64 samples at 64-112 px.  This tool anchors the north-star claim:

1. a SHORT production-CLI run (ada_epoch=EPOCH_SHORT) to warm every
   compile cache and measure the non-training phases;
2. the FULL reference-scale run (ada_epoch=5000, ada_bs=64, 64 samples,
   ResNet-18 @ 224) through the production CLI;
3. a profiler capture of a mid-length run, summing the device-side
   `_train_block` scan events for the reconstruction roofline.

The training throughput is the differential (t_full - t_short) /
(5000 - EPOCH_SHORT) epochs — phases other than the train scan are
identical between the two runs and cancel.  FLOP accounting: one epoch
optimizes every learnable layer once over all samples; fwd+bwd of a
layer ~= 3x its forward FLOPs, so epoch FLOPs ~= 3 * model_flops *
n_samples (conv/gemm layers dominate model_flops).

Writes docs/ADAROUND_REF_SCALE.json; bench.py surfaces the numbers as
`adaround_ref_scale_s` / `adaround_tflops` extras.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

if os.environ.get("JAX_PLATFORMS", "") == "axon":
    import jax
    jax.config.update("jax_platforms", "axon,cpu")
import jax  # noqa: E402

from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(ROOT, ".model_cache", "xla_cache"))

CACHE = os.path.join(ROOT, ".model_cache")
N, IMG, BS, EPOCH_FULL, EPOCH_SHORT, EPOCH_TRACE = 64, 224, 64, 5000, 100, 200
PEAK_BF16 = 197e12  # v5e/v5-lite spec bf16 peak


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_cli(out_dir, epochs):
    from dipoorlet_tpu.__main__ import main
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    main(["-M", os.path.join(CACHE, f"resnet18_{IMG}.onnx"),
          "-I", os.path.join(CACHE, f"calib_{IMG}_{N}"),
          "-O", out_dir, "-N", str(N), "-A", "minmax", "-D", "trt",
          "--adaround", "--ada_epoch", str(epochs), "--ada_bs", str(BS)])
    return time.time() - t0


def trace_train_block(out_dir, epochs):
    trace_dir = "/tmp/ada_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        wall = run_cli(out_dir, epochs)
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return wall, None
    ev = json.load(gzip.open(files[-1]))["traceEvents"]
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items() if "TPU" in str(n)}
    train_us = sum(e.get("dur", 0) for e in ev
                   if e.get("ph") == "X" and e.get("pid") in dev_pids
                   and "_train_block" in e.get("name", ""))
    return wall, train_us / 1e6


def main():
    from torch_export import export_zoo_model
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime.data import make_synthetic_dataset
    from dipoorlet_tpu.utils.flops import model_flops

    model = os.path.join(CACHE, f"resnet18_{IMG}.onnx")
    if not os.path.exists(model):
        export_zoo_model("resnet18", model, image_size=IMG)
    data = os.path.join(CACHE, f"calib_{IMG}_{N}")
    if not os.path.exists(os.path.join(data, ".done")):
        make_synthetic_dataset(data, {"input": [1, 3, IMG, IMG]}, N, seed=0)
        open(os.path.join(data, ".done"), "w").write("ok")

    fwd_flops = model_flops(GraphIR.load(model))
    log(f"model_flops(resnet18@{IMG}) = {fwd_flops / 1e9:.2f} GFLOP/sample")

    out = os.path.join(CACHE, "ada_ref_scale")
    t_cold = run_cli(out + "_short", EPOCH_SHORT)
    log(f"short run, cold compiles ({EPOCH_SHORT} ep): {t_cold:.1f}s")
    # the differential needs a WARM short run — the first one pays every
    # shape-class compile the persistent cache couldn't serve
    t_short = run_cli(out + "_short", EPOCH_SHORT)
    log(f"short run, warm ({EPOCH_SHORT} ep): {t_short:.1f}s")

    t_trace, train_dev_s = trace_train_block(out + "_trace", EPOCH_TRACE)
    log(f"trace run ({EPOCH_TRACE} ep): {t_trace:.1f}s, "
        f"device _train_block time: {train_dev_s} "
        f"(None/0 over the axon relay: device events arrive unnamed)")

    t_full = run_cli(out + "_full", EPOCH_FULL)
    log(f"FULL reference-scale run ({EPOCH_FULL} ep): {t_full:.1f}s")

    train_flops_per_epoch = 3 * fwd_flops * N
    d_epochs = EPOCH_FULL - EPOCH_SHORT
    d_t = max(t_full - t_short, 1e-9)
    tflops_wall = train_flops_per_epoch * d_epochs / d_t / 1e12
    res = {
        "protocol": {"model": f"resnet18@{IMG}", "samples": N, "ada_bs": BS,
                     "ada_epoch": EPOCH_FULL,
                     "ref": "dipoorlet/__main__.py:42-43 defaults"},
        "wall_s_full_5000ep": round(t_full, 1),
        "wall_s_short_100ep": round(t_short, 1),
        "train_differential_s": round(d_t, 1),
        "train_flops_per_epoch": train_flops_per_epoch,
        "adaround_tflops": round(tflops_wall, 2),
        "adaround_mfu_vs_bf16_peak": round(tflops_wall * 1e12 / PEAK_BF16, 4),
        "trace": {"epochs": EPOCH_TRACE, "wall_s": round(t_trace, 1),
                  "train_block_device_s": (round(train_dev_s, 2)
                                           if train_dev_s else None)},
        "device_kind": jax.devices()[0].device_kind,
    }
    if train_dev_s:
        # device-side roofline for the scan itself (trace run)
        dev_tflops = train_flops_per_epoch * EPOCH_TRACE / train_dev_s / 1e12
        res["train_block_device_tflops"] = round(dev_tflops, 2)
        res["train_block_device_mfu"] = round(dev_tflops * 1e12 / PEAK_BF16, 4)
    os.makedirs(os.path.join(ROOT, "docs"), exist_ok=True)
    with open(os.path.join(ROOT, "docs", "ADAROUND_REF_SCALE.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Benchmark: end-to-end INT8 calibration throughput (ResNet-18 @ 224,
minmax + 2048-bin histogram passes over 100 samples).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

vs_baseline compares against a reference-architecture emulation measured
once on this host and cached: per-sample batch-1 torch-CPU forward with
every intermediate tensor pulled to host + per-tensor numpy
min/max + np.histogram loops — the exact hot-loop structure of
/root/reference/dipoorlet/forward_net.py:192-281 (ORT CUDA EP replaced
by torch CPU since neither ORT nor a GPU exists in this image; see
BASELINE.md)."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

# keep the CPU backend available alongside the TPU: graph constant folding
# and tiny host-side evals must never dispatch over the device tunnel
if os.environ.get("JAX_PLATFORMS", "") == "axon":
    import jax
    jax.config.update("jax_platforms", "axon,cpu")

CACHE = os.path.join(ROOT, ".model_cache")
N_SAMPLES = 100
IMG = 224
BINS = 2048
BATCH = int(os.environ.get("DIPOORLET_BENCH_BATCH", "16"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_model():
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"resnet18_{IMG}.onnx")
    if not os.path.exists(path):
        from torch_export import export_zoo_model
        log("exporting resnet18 ...")
        export_zoo_model("resnet18", path, image_size=IMG)
    return path


def ensure_data():
    data_dir = os.path.join(CACHE, f"calib_{IMG}_{N_SAMPLES}")
    marker = os.path.join(data_dir, ".done")
    if not os.path.exists(marker):
        from dipoorlet_tpu.runtime.data import make_synthetic_dataset
        log("synthesizing calibration set ...")
        make_synthetic_dataset(data_dir, {"input": [1, 3, IMG, IMG]}, N_SAMPLES, seed=0)
        open(marker, "w").write("ok")
    return data_dir


def measure_baseline():
    """Reference-architecture emulation: batch-1 forward, host numpy stats."""
    os.makedirs(CACHE, exist_ok=True)
    cache_file = os.path.join(CACHE, "baseline.json")
    if os.path.exists(cache_file):
        return json.load(open(cache_file))["samples_per_sec"]
    import torch
    from torch_export import MODEL_ZOO
    torch.manual_seed(0)
    model = MODEL_ZOO["resnet18"]()
    model.eval()
    acts = {}

    def hook(name):
        def fn(mod, inp, out):
            acts[name] = out.detach().numpy()
        return fn

    for name, mod in model.named_modules():
        if len(list(mod.children())) == 0:
            mod.register_forward_hook(hook(name))

    n_probe = 4
    rng = np.random.RandomState(0)
    xs = [rng.randn(1, 3, IMG, IMG).astype(np.float32) for _ in range(n_probe)]
    # pass 1: minmax; pass 2: histogram — matching forward_get_minmax/hist
    stats = {}
    t0 = time.time()
    with torch.no_grad():
        for x in xs:
            acts.clear()
            model(torch.from_numpy(x))
            for name, a in acts.items():
                s = stats.setdefault(name, [np.inf, -np.inf])
                s[0] = min(s[0], a.min())
                s[1] = max(s[1], a.max())
        for x in xs:
            acts.clear()
            model(torch.from_numpy(x))
            for name, a in acts.items():
                amax = max(-stats[name][0], stats[name][1])
                np.histogram(np.abs(a), BINS, (0, amax))
    dt = time.time() - t0
    sps = n_probe / dt  # one "sample" = minmax pass + hist pass
    json.dump({"samples_per_sec": sps, "probe": n_probe, "seconds": dt},
              open(cache_file, "w"))
    log(f"baseline (reference-style CPU): {sps:.3f} samples/s")
    return sps


def measure_ours():
    from dipoorlet_tpu.calib.stats import StatsRunner
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset

    model_path = ensure_model()
    data_dir = ensure_data()
    t0 = time.time()
    g = GraphIR.load(model_path)
    log(f"graph load+simplify: {time.time() - t0:.1f}s")
    ex = Executor(g)
    params = ex.init_params()
    dataset = CalibDataset(data_dir, ex.input_shapes(), N_SAMPLES)
    runner = StatsRunner(ex)

    # first run includes jit compile + data upload; second run is the
    # steady-state cost a production calibration pays.  The fused pass does
    # both phases (full minmax sweep, then full histogram sweep) with a
    # single host sync — the same two-pass work as the reference's
    # forward_get_minmax + forward_get_hist.
    t0 = time.time()
    runner.run_minmax_hist(params, dataset, BINS, batch_size=BATCH)
    log(f"minmax+hist compile+pass: {time.time() - t0:.1f}s")
    t0 = time.time()
    runner.run_minmax_hist(params, dataset, BINS, batch_size=BATCH)
    t_fused = time.time() - t0
    log(f"minmax+hist fused pass: {t_fused:.2f}s ({N_SAMPLES / t_fused:.1f} samples/s)")

    return N_SAMPLES / t_fused


def main():
    baseline = measure_baseline()
    ours = measure_ours()
    print(json.dumps({
        "metric": "resnet18_int8_calibration_throughput",
        "value": round(ours, 3),
        "unit": "samples/s",
        "vs_baseline": round(ours / baseline, 3),
    }))


if __name__ == "__main__":
    main()

"""Forward-pass compute-headroom probe (VERDICT r3 weak #2 / next #7).

Round 3 measured the calibration forward at 13.3% MFU at batch 16 and
left open whether that is latency-shape-bound or improvable.  This tool
measures, on the real chip with device-resident data:

  (a) the production minmax stats pass (full forward + min/max taps) at
      batch {16, 64, 128} — DEVICE time from the profiler, not wall;
  (b) the dominant ResNet-18@224 conv shapes in isolation, each timed
      under both NCHW (the executor's ONNX-native layout) and NHWC
      dimension numbers, reps folded into one dispatch so relay latency
      cancels.

Writes docs/FORWARD_HEADROOM.json; conclusions go to BASELINE.md.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

if os.environ.get("JAX_PLATFORMS", "") == "axon":
    import jax
    jax.config.update("jax_platforms", "axon,cpu")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(ROOT, ".model_cache", "xla_cache"))

CACHE = os.path.join(ROOT, ".model_cache")
N = 128  # dataset size: one pass per batch divides it evenly at 16/64/128

# the FLOP-dominant conv shapes of ResNet-18 @224 (NCHW, OIHW), with
# approximate share of total forward FLOPs
CONV_SHAPES = [
    ("conv1_7x7s2", (3, 64, 7, 7), 224, 2, 0.07),
    ("layer1_3x3", (64, 64, 3, 3), 56, 1, 0.25),
    ("layer2_3x3", (128, 128, 3, 3), 28, 1, 0.25),
    ("layer3_3x3", (256, 256, 3, 3), 14, 1, 0.25),
    ("layer4_3x3", (512, 512, 3, 3), 7, 1, 0.25),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_ms(trace_dir, match):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return None
    ev = json.load(gzip.open(files[-1]))["traceEvents"]
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pid_names.items() if "TPU" in str(n)}
    return sum(e.get("dur", 0) for e in ev
               if e.get("ph") == "X" and e.get("pid") in dev
               and match in e.get("name", "")) / 1e3


def stats_pass_sweep(res):
    from dipoorlet_tpu.calib.stats import StatsRunner
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset, make_synthetic_dataset
    from torch_export import export_zoo_model

    model = os.path.join(CACHE, "resnet18_224.onnx")
    if not os.path.exists(model):
        export_zoo_model("resnet18", model, image_size=224)
    data = os.path.join(CACHE, f"calib_224_{N}")
    if not os.path.exists(os.path.join(data, ".done")):
        make_synthetic_dataset(data, {"input": [1, 3, 224, 224]}, N, seed=0)
        open(os.path.join(data, ".done"), "w").write("ok")
    g = GraphIR.load(model)
    ex = Executor(g)
    params = ex.init_params()
    ds = CalibDataset(data, ex.input_shapes(), N)
    from dipoorlet_tpu.utils.flops import model_flops
    fwd_flops = model_flops(g)
    runner = StatsRunner(ex, compute_dtype=jnp.bfloat16)
    rows = {}
    for b in (16, 64, 128):
        runner.run_minmax(params, ds, batch_size=b)  # compile + upload
        runner.run_minmax(params, ds, batch_size=b)
        trace_dir = f"/tmp/fwd_trace_{b}"
        shutil.rmtree(trace_dir, ignore_errors=True)
        t0 = time.time()
        with jax.profiler.trace(trace_dir):
            runner.run_minmax(params, ds, batch_size=b)
        wall = time.time() - t0
        dev = device_ms(trace_dir, "jit_pass_fn")
        mfu = (N * fwd_flops / (dev / 1e3) / 197e12) if dev else None
        rows[str(b)] = {"wall_s": round(wall, 3),
                        "device_ms": round(dev, 2) if dev else None,
                        "device_ms_per_sample": round(dev / N, 3) if dev else None,
                        "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None}
        log(f"minmax pass batch {b}: wall {wall:.3f}s device {dev} ms "
            f"mfu {mfu}")
    res["stats_pass_batch_sweep"] = rows


def conv_layout_probe(res):
    """Two relay measurement traps found while writing this (memory
    them): (1) re-executing a pure jitted fn on the SAME arguments is
    elided by the relay — every iteration must be data-distinct; (2)
    block_until_ready does NOT block over the relay — the timed call must
    device_get the (scalar) result, so each number carries the ~30-45 ms
    fetch/dispatch floor and is a LOWER bound on device throughput."""
    reps = 256
    rows = {}
    rng = np.random.RandomState(0)
    for name, (cin, cout, kh, kw), hw, stride, _share in CONV_SHAPES:
        per = {}
        for layout in ("NCHW", "NHWC"):
            if layout == "NCHW":
                xs = rng.randn(16, cin, hw, hw).astype(np.float32)
                ws = rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
                dn = ("NCHW", "OIHW", "NCHW")
            else:
                xs = rng.randn(16, hw, hw, cin).astype(np.float32)
                ws = rng.randn(kh, kw, cin, cout).astype(np.float32) * 0.05
                dn = ("NHWC", "HWIO", "NHWC")
            x = jnp.asarray(xs, jnp.bfloat16)
            w = jnp.asarray(ws, jnp.bfloat16)

            @jax.jit
            def loop(x, w, bias):
                def body(i, acc):
                    # bias + i keeps every iteration distinct: nothing can
                    # be hoisted out of the loop or deduped by the relay
                    y = jax.lax.conv_general_dilated(
                        x + (bias + i).astype(jnp.bfloat16) * jnp.bfloat16(1e-6),
                        w, (stride, stride), "SAME", dimension_numbers=dn)
                    return acc + jnp.sum(y.astype(jnp.float32))
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

            float(jax.device_get(loop(x, w, jnp.float32(0.0))))  # compile
            dt = float("inf")
            for k in (1, 2):
                t0 = time.time()
                float(jax.device_get(loop(x, w, jnp.float32(k))))
                dt = min(dt, time.time() - t0)
            oh = -(-hw // stride)
            flops = 2 * 16 * cout * oh * oh * cin * kh * kw * reps
            per[layout] = {"s": round(dt, 4),
                           "tflops": round(flops / dt / 1e12, 1),
                           "mfu": round(flops / dt / 197e12, 3)}
            log(f"{name} {layout}: {dt:.4f}s {per[layout]['tflops']} Tflop/s")
        rows[name] = per
    res["conv_layout_probe_batch16_x256reps"] = rows


def main():
    res = {"device_kind": jax.devices()[0].device_kind}
    stats_pass_sweep(res)
    conv_layout_probe(res)
    os.makedirs(os.path.join(ROOT, "docs"), exist_ok=True)
    with open(os.path.join(ROOT, "docs", "FORWARD_HEADROOM.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

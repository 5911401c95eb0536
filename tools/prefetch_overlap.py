"""Measure the C++ prefetcher's IO/compute overlap on the streaming
calibration path (VERDICT r3 next #3).

Forces DEVICE_RESIDENT_BYTES=0 so every pass takes the streaming branch
(stats.py _run_pass final else), then times the same minmax pass with

  (a) the double-buffered native prefetcher (CalibDataset.stream_batches
      -> dl_prefetch_* in native/dataloader.cpp): batch N+1's disk reads
      happen on C++ threads while batch N's forward executes;
  (b) a shim dataset without stream_batches: synchronous load_batch
      before every dispatch (the pre-round-4 behavior).

Prints both times and the overlap saving.  Writes
docs/PREFETCH_OVERLAP.json.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS") == "axon":
        jax.config.update("jax_platforms", "axon,cpu")
    from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.path.join(ROOT, ".model_cache", "xla_cache"))

    from torch_export import export_zoo_model
    from dipoorlet_tpu.calib.stats import StatsRunner
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset, make_synthetic_dataset

    cache = os.path.join(ROOT, ".model_cache")
    model = os.path.join(cache, f"resnet18_{args.img}.onnx")
    if not os.path.exists(model):
        export_zoo_model("resnet18", model, image_size=args.img)
    data = os.path.join(cache, f"calib_{args.img}_{args.n}")
    if not os.path.exists(os.path.join(data, ".done")):
        make_synthetic_dataset(data, {"input": [1, 3, args.img, args.img]},
                               args.n, seed=0)
        open(os.path.join(data, ".done"), "w").write("ok")

    g = GraphIR.load(model)
    ex = Executor(g)
    params = ex.init_params()
    ds = CalibDataset(data, ex.input_shapes(), args.n)

    class SyncShim:
        """The dataset WITHOUT stream_batches: forces synchronous loads."""

        def __init__(self, inner):
            self._inner = inner
            self.input_shapes = inner.input_shapes
            self.num = inner.num

        def load_batch(self, idx):
            return self._inner.load_batch(idx)

        def iter_batches(self, *a, **kw):
            return self._inner.iter_batches(*a, **kw)

    StatsRunner.DEVICE_RESIDENT_BYTES = 0  # force the streaming branch
    runner = StatsRunner(ex)

    def timed(dataset):
        runner.run_minmax(params, dataset, batch_size=args.batch)  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            runner.run_minmax(params, dataset, batch_size=args.batch)
            best = min(best, time.time() - t0)
        return best

    t_sync = timed(SyncShim(ds))
    t_prefetch = timed(ds)
    from dipoorlet_tpu.runtime.native_loader import get_lib
    res = {
        "backend": jax.default_backend(),
        "native_loader": get_lib() is not None,
        "n_samples": args.n, "img": args.img, "batch": args.batch,
        "streaming_pass_sync_s": round(t_sync, 3),
        "streaming_pass_prefetch_s": round(t_prefetch, 3),
        "overlap_saving_s": round(t_sync - t_prefetch, 3),
        "overlap_saving_pct": round(100 * (t_sync - t_prefetch) / t_sync, 1),
        "note": "page-cache warm: measures np-stack/memcpy+IO overlap, "
                "a lower bound on cold-storage savings",
    }
    os.makedirs(os.path.join(ROOT, "docs"), exist_ok=True)
    with open(os.path.join(ROOT, "docs", "PREFETCH_OVERLAP.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""TPU probe: (a) peak-check a big bf16 matmul through this stack,
(b) cold-process calibration pass time with the persistent compile cache,
(c) forward-only vs stats-pass split, (d) whether jax.profiler works over
the relay.  Findings feed BASELINE.md's roofline analysis."""
from __future__ import annotations

import os
import sys
import time



ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

if os.environ.get("JAX_PLATFORMS", "") == "axon":
    import jax
    jax.config.update("jax_platforms", "axon,cpu")
import jax
import jax.numpy as jnp

from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(os.path.join(ROOT, ".model_cache", "xla_cache"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def matmul_peak():
    n, reps = 4096, 32
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def loop(a):
        def body(i, acc):
            return (acc @ a) * jnp.bfloat16(1e-3)
        return jax.lax.fori_loop(0, reps, body, a)

    jax.block_until_ready(loop(a))
    t0 = time.time()
    jax.block_until_ready(loop(a))
    dt = time.time() - t0
    fl = reps * 2 * n ** 3
    log(f"matmul {n}^3 bf16 x{reps}: {dt:.3f}s = {fl / dt / 1e12:.1f} Tflop/s "
        f"({fl / dt / 197e12 * 100:.0f}% of v5e peak)")


def calib_cold_and_split():
    from dipoorlet_tpu.calib.stats import StatsRunner
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset

    model = os.path.join(ROOT, ".model_cache", "resnet18_224.onnx")
    data = os.path.join(ROOT, ".model_cache", "calib_224_100")
    g = GraphIR.load(model)
    ex = Executor(g)
    params = ex.init_params()
    ds = CalibDataset(data, ex.input_shapes(), 100)
    r16 = StatsRunner(ex, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    mm, _ = r16.run_minmax_hist(params, ds, 2048, batch_size=16)
    log(f"COLD-PROCESS bf16 fused compile+pass (persistent cache): "
        f"{time.time() - t0:.1f}s")
    t0 = time.time()
    r16.run_minmax_hist(params, ds, 2048, batch_size=16)
    log(f"warm fused: {time.time() - t0:.3f}s")
    t0 = time.time()
    r16.run_minmax(params, ds, batch_size=16)
    t_mm = time.time() - t0
    log(f"warm minmax-only (forward + min/max taps): {t_mm:.3f}s "
        f"-> fwd <= {t_mm / 100 * 1e3:.2f} ms/sample")
    t0 = time.time()
    r16.run_hist(params, ds, mm, 2048, batch_size=16)
    log(f"warm hist-only (forward + one-hot binning): {time.time() - t0:.3f}s")
    return r16, params, ds, mm


def try_profiler(r16, params, ds, mm):
    try:
        with jax.profiler.trace("/tmp/jaxtrace"):
            r16.run_minmax_hist(params, ds, 2048, batch_size=16)
        import glob
        files = glob.glob("/tmp/jaxtrace/**/*.pb*", recursive=True) + \
            glob.glob("/tmp/jaxtrace/**/*.json*", recursive=True)
        log(f"profiler trace written: {len(files)} files under /tmp/jaxtrace")
    except Exception as e:
        log(f"profiler unavailable over relay: {type(e).__name__}: {e}")


if __name__ == "__main__":
    matmul_peak()
    r16, params, ds, mm = calib_cold_and_split()
    try_profiler(r16, params, ds, mm)
    log("probe done")

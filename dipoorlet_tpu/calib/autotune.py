"""Probe-once gating for the TPU fast paths.

Two calibration fast paths have a compile-time risk profile that varies
by backend (the remote TPU compile service has shown multi-minute
tails): the Pallas VMEM-resident OCTAV kernel (calib/kernels.py) and the
whole-pass `lax.scan` calibration driver (calib/stats.py).  Instead of
env-var opt-ins, each feature is probed ONCE per (backend, jax version)
— compile + execute + numerics check under a wall-clock budget — and the
outcome is cached on disk, so the best available path is the default
with no configuration.

Env vars still force-override the probe for debugging:
  DIPOORLET_TPU_PALLAS=1|0, DIPOORLET_TPU_SCAN_CALIB=1|0.
"""
from __future__ import annotations

import json
import os
import tempfile
import time

_ENV_VARS = {
    "pallas_octav": "DIPOORLET_TPU_PALLAS",
    "scan_calib": "DIPOORLET_TPU_SCAN_CALIB",
    "pallas_hist": "DIPOORLET_TPU_PALLAS_HIST",
}

# A probe that compiles+runs slower than this is recorded as disabled:
# the fast path would cost more in one-time compile than it saves.
BUDGET_S = {"pallas_octav": 120.0, "scan_calib": 180.0, "pallas_hist": 240.0}

_mem_cache = {}


def _cache_path() -> str:
    override = os.environ.get("DIPOORLET_TPU_AUTOTUNE_CACHE")
    if override:
        return override
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(), f"dipoorlet_tpu_autotune_{uid}.json")


def _key(feature: str, subkey: str = "") -> str:
    import jax
    tag = f"{feature}[{subkey}]" if subkey else feature
    return f"{tag}:{jax.default_backend()}:{jax.__version__}"


def _load() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _store(key: str, enabled: bool, seconds: float, note: str = ""):
    _mem_cache[key] = enabled
    data = _load()
    data[key] = {"enabled": enabled, "probe_seconds": round(seconds, 2), "note": note}
    try:
        tmp = _cache_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, _cache_path())
    except Exception:
        pass  # cache is an optimization; never fail the pipeline over it


def cached_decision(feature: str, subkey: str = ""):
    """Returns True/False if decided (env override or cached probe),
    None if the feature still needs probing.  `subkey` scopes decisions
    that depend on a shape parameter (e.g. the histogram bin count — a
    kernel green-lit at one bin count is a different Mosaic shape regime
    at another)."""
    env = os.environ.get(_ENV_VARS[feature])
    if env is not None:
        return env == "1"
    key = _key(feature, subkey)
    if key in _mem_cache:
        return _mem_cache[key]
    rec = _load().get(key)
    if rec is not None:
        _mem_cache[key] = bool(rec["enabled"])
        return _mem_cache[key]
    return None


def record(feature: str, enabled: bool, seconds: float, note: str = "",
           subkey: str = ""):
    """Record a probe outcome observed in situ (used by the scan path,
    whose first real compile IS the probe)."""
    _store(_key(feature, subkey), enabled, seconds, note)


def pallas_octav_enabled() -> bool:
    """Probe-once gate for the Pallas OCTAV kernel.

    The probe compiles and runs the kernel on a tiny tensor and checks it
    against the plain-XLA fixed point; any Mosaic failure, numeric
    mismatch, or over-budget compile disables it (cached)."""
    decided = cached_decision("pallas_octav")
    if decided is not None:
        return decided
    import jax
    if jax.default_backend() == "cpu":
        # kernels.use_pallas() gates CPU off anyway; record to skip re-probing
        record("pallas_octav", False, 0.0, "cpu backend")
        return False
    t0 = time.time()
    try:
        import numpy as np
        import jax.numpy as jnp
        from .kernels import octav_pallas
        from .stats import make_octav_transform
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4096).astype(np.float32))
        s_pl, lo_pl, hi_pl = jax.device_get(octav_pallas(x, False))
        ref_fn = make_octav_transform(False, allow_pallas=False)
        s_x, lo_x, hi_x = jax.device_get(jax.jit(lambda v: ref_fn("probe", v))(x))
        ok = (abs(float(s_pl) - float(s_x)) <= 1e-4 * max(1.0, abs(float(s_x)))
              and float(lo_pl) == float(lo_x) and float(hi_pl) == float(hi_x))
        # production calls the kernel inside the vmapped stats forward — the
        # batched lowering must also compile and agree (a standalone-only
        # probe once green-lit a kernel whose SMEM output could not batch)
        if ok:
            xb = jnp.stack([x, x * 0.5 + 0.1])
            sb, lob, hib = jax.device_get(
                jax.jit(jax.vmap(lambda v: octav_pallas(v, False)))(xb))
            s2, lo2, hi2 = jax.device_get(
                jax.jit(lambda v: ref_fn("probe", v))(x * 0.5 + 0.1))
            # check EVERY batch element — a batched-lowering bug that only
            # corrupts non-leading elements must not pass the probe
            ok = (abs(float(sb[0]) - float(s_x)) <= 1e-4 * max(1.0, abs(float(s_x)))
                  and float(lob[0]) == float(lo_x) and float(hib[0]) == float(hi_x)
                  and abs(float(sb[1]) - float(s2)) <= 1e-4 * max(1.0, abs(float(s2)))
                  and float(lob[1]) == float(lo2) and float(hib[1]) == float(hi2))
        dt = time.time() - t0
        enabled = ok and dt <= BUDGET_S["pallas_octav"]
        record("pallas_octav", enabled, dt,
               "" if ok else "numeric mismatch vs XLA fixed point")
        return enabled
    except Exception as e:  # Mosaic compile failure, relay error, ...
        record("pallas_octav", False, time.time() - t0, f"{type(e).__name__}: {e}"[:200])
        return False


def pallas_hist_enabled(bins: int = 2048) -> bool:
    """Probe-once gate for the Pallas VMEM-resident histogram kernel.

    The probe checks bit-exact counts vs the XLA matmul-histogram AND races
    the two paths warm (64 reps folded inside one dispatch so remote-relay
    latency cancels); the kernel is enabled only when it is correct, within
    the compile budget, and strictly not slower than the XLA path it
    replaces.  The decision is cached PER BIN COUNT — each bin count is a
    different Mosaic shape regime, and a kernel green-lit at 2048 bins may
    not even compile at another."""
    subkey = str(bins)
    decided = cached_decision("pallas_hist", subkey)
    if decided is not None:
        return decided
    import jax
    if jax.default_backend() == "cpu":
        record("pallas_hist", False, 0.0, "cpu backend", subkey=subkey)
        return False
    t0 = time.time()
    try:
        import numpy as np
        import jax.numpy as jnp
        from .kernels import histogram_pallas
        from .stats import matmul_histogram
        n, reps = 1 << 22, 64
        rng = np.random.RandomState(0)
        idx = jnp.asarray(rng.randint(0, bins, n).astype(np.int32))

        h_pl = jax.device_get(histogram_pallas(idx, bins))
        h_x = jax.device_get(jax.jit(lambda v: matmul_histogram(v, bins))(idx))
        ok = bool((np.asarray(h_pl) == np.asarray(h_x)).all())
        compile_s = time.time() - t0

        def loop(hist_fn):
            # vary the input per rep so XLA cannot hoist the pure call
            def body(i, acc):
                return acc + hist_fn((idx + i) % bins, bins)
            return jax.lax.fori_loop(0, reps, body, jnp.zeros(bins, jnp.int32))

        t_pl = t_x = 0.0
        if ok:
            f_pl = jax.jit(lambda: loop(histogram_pallas))
            f_x = jax.jit(lambda: loop(matmul_histogram))
            jax.block_until_ready(f_pl())
            jax.block_until_ready(f_x())
            t1 = time.time(); jax.block_until_ready(f_pl()); t_pl = time.time() - t1
            t1 = time.time(); jax.block_until_ready(f_x()); t_x = time.time() - t1
        dt = time.time() - t0
        enabled = ok and compile_s <= BUDGET_S["pallas_hist"] and t_pl <= t_x
        record("pallas_hist", enabled, dt,
               f"warm 64x{n >> 20}M-elem @ {bins} bins: pallas {t_pl:.3f}s "
               f"vs xla {t_x:.3f}s"
               if ok else "count mismatch vs matmul_histogram", subkey=subkey)
        return enabled
    except Exception as e:  # Mosaic compile failure, relay error, ...
        record("pallas_hist", False, time.time() - t0,
               f"{type(e).__name__}: {e}"[:200], subkey=subkey)
        return False


def scan_budget() -> float:
    return BUDGET_S["scan_calib"]

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

# string-valued tuning choices (e.g. kernel config), env-overridable
_VALUE_ENV_VARS = {
    "pallas_hist_cfg": "DIPOORLET_TPU_PALLAS_HIST_CFG",
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


def cached_value(feature: str, subkey: str = ""):
    """String-valued tuning choice (kernel config): env override, then the
    cached probe result's note field; None if never probed."""
    env = os.environ.get(_VALUE_ENV_VARS.get(feature, ""), None)
    if env:
        return env
    key = _key(feature, subkey)
    if key in _mem_cache:
        return _mem_cache[key]
    rec = _load().get(key)
    if rec is not None:
        _mem_cache[key] = rec.get("note") or None
        return _mem_cache[key]
    return None


def record_value(feature: str, value: str, seconds: float, subkey: str = ""):
    _store(_key(feature, subkey), True, seconds, value)
    _mem_cache[_key(feature, subkey)] = value  # _store caches the bool; keep the string


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

        h_x = jax.device_get(jax.jit(lambda v: matmul_histogram(v, bins))(idx))

        # candidate (variant, lo_n) kernel configs: the digit split trades
        # VPU one-hot cost (hi_n + lo_n) against MXU stream cycles (~hi_n
        # per 128-element contraction), so the optimum is chip-dependent
        lo_opts = sorted({lo for lo in (32, 64, 128, 256) if lo <= max(bins, 32)})
        cfgs = [(var, lo) for var in ("i8", "i16", "bf16") for lo in lo_opts]
        errs = []
        oks = {}
        for var, lo in cfgs:
            try:
                h_pl = jax.device_get(
                    histogram_pallas(idx, bins, variant=var, lo_n=lo))
                oks[(var, lo)] = bool((np.asarray(h_pl) == np.asarray(h_x)).all())
            except Exception as e:
                oks[(var, lo)] = False
                errs.append(f"{var}:{lo} {type(e).__name__}")
        ok = any(oks.values())
        compile_s = time.time() - t0

        def loop(hist_fn):
            # vary the input per rep so XLA cannot hoist the pure call
            def body(i, acc):
                return acc + hist_fn((idx + i) % bins, bins)
            return jax.lax.fori_loop(0, reps, body, jnp.zeros(bins, jnp.int32))

        def race(fn):
            f = jax.jit(lambda: loop(fn))
            jax.block_until_ready(f())
            t1 = time.time(); jax.block_until_ready(f()); return time.time() - t1

        t_pl = t_x = 0.0
        t_cfg = {}
        best = None
        if ok:
            t_x = race(matmul_histogram)
            for cfg in cfgs:
                if oks[cfg]:
                    t_cfg[cfg] = race(lambda v, b, _c=cfg: histogram_pallas(
                        v, b, variant=_c[0], lo_n=_c[1]))
            best = min(t_cfg, key=t_cfg.get)
            t_pl = t_cfg[best]
        dt = time.time() - t0
        enabled = ok and compile_s <= BUDGET_S["pallas_hist"] and t_pl <= t_x
        note = (f"warm {reps}x{n >> 20}M-elem @ {bins} bins: "
                + " ".join(f"{v}:{lo}={t:.3f}s" for (v, lo), t in sorted(t_cfg.items()))
                + f" vs xla {t_x:.3f}s" + (f"; failed: {errs}" if errs else "")
                if ok else f"count mismatch vs matmul_histogram ({errs})")
        record("pallas_hist", enabled, dt, note, subkey=subkey)
        if best is not None:
            record_value("pallas_hist_cfg", f"{best[0]}:{best[1]}", dt,
                         subkey=subkey)
        return enabled
    except Exception as e:  # Mosaic compile failure, relay error, ...
        record("pallas_hist", False, time.time() - t0,
               f"{type(e).__name__}: {e}"[:200], subkey=subkey)
        return False


def scan_budget() -> float:
    return BUDGET_S["scan_calib"]

"""Persistent XLA compilation cache.

Remote-compile latency on relay-attached TPUs varies 4s-10min and was the
dominant noise source in end-to-end wall-clock numbers (round-2 bench:
442s vs 357s for identical code).  Enabling JAX's persistent cache pins
repeat runs to steady-state compile cost; bench.py and the CLI both call
this at startup."""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None):
    """Idempotently point JAX at an on-disk compilation cache.

    Priority: explicit arg > $DIPOORLET_TPU_COMPILE_CACHE >
    ~/.cache/dipoorlet_tpu/xla_cache.  Set the env var to '0' to disable.
    Returns the directory, or None when disabled/unavailable."""
    env = os.environ.get("DIPOORLET_TPU_COMPILE_CACHE")
    if env == "0":
        return None
    d = cache_dir or env or os.path.expanduser("~/.cache/dipoorlet_tpu/xla_cache")
    try:
        import jax
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every compile: relay round-trips make even small programs
        # worth persisting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return d
    except Exception:
        return None  # cache is an optimization; never fail startup over it

"""TPU experiment: race Pallas histogram formulations vs the XLA matmul path.

Variant A = whatever calib/kernels.py histogram_pallas currently ships —
since commit 170271d that IS the lane-major transposed-one-hot
formulation, so A and B race the same algorithm and this tool now serves
as an independent timing check of the production kernel (the original
(c,1) column-reshape formulation was dropped after remote Mosaic rejected
it; see kernels.py history).
Variant B: 1D blocks, transposed one-hots (hi_n, c)/(lo_n, c) built from a
lane-major flat vector, dot over the lane dim — no column reshape (the op
most likely to upset Mosaic's layout assignment).

Usage: python tools/hist_kernel_probe.py   (on the TPU host; one process)
Prints per-variant: compile ok/fail, exactness vs np.bincount, warm time of
64 reps folded into one dispatch (relay latency cancels).
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS", "") == "axon":
    # only when run as the probe CLI — importing this module (e.g. CPU
    # interpret-mode tests) must not re-pin the platform to the TPU
    import jax
    jax.config.update("jax_platforms", "axon,cpu")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLK = 8192  # elements per grid step


def _kernel_b(idx_ref, out_ref, *, hi_n, lo_n):
    i = pl.program_id(0)
    flat = idx_ref[...]  # (BLK,) int32, -1 = masked
    valid = flat >= 0
    hi = jnp.where(valid, flat // lo_n, -1)
    lo = jnp.where(valid, flat % lo_n, 0)
    c = flat.shape[0]
    hiT = (hi[None, :] == jax.lax.broadcasted_iota(jnp.int32, (hi_n, c), 0)
           ).astype(jnp.int8)
    loT = (lo[None, :] == jax.lax.broadcasted_iota(jnp.int32, (lo_n, c), 0)
           ).astype(jnp.int8)
    part = jax.lax.dot_general(hiT, loT, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        out_ref[...] = part

    @pl.when(i > 0)
    def _():
        out_ref[...] = out_ref[...] + part


@functools.partial(jax.jit, static_argnames=("bins",))
def histogram_pallas_b(idx, bins: int):
    lo_n = min(128, bins)
    hi_n = -(-bins // lo_n)
    n = idx.shape[0]
    nblk = max(1, -(-n // BLK))
    pad = nblk * BLK - n
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
    out = pl.pallas_call(
        functools.partial(_kernel_b, hi_n=hi_n, lo_n=lo_n),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(idx)
    return out.reshape(-1)[:bins]


def race():
    from dipoorlet_tpu.calib.kernels import histogram_pallas
    from dipoorlet_tpu.calib.stats import matmul_histogram

    bins, n, reps = 2048, 1 << 22, 64
    rng = np.random.RandomState(0)
    idx_np = rng.randint(0, bins, n).astype(np.int32)
    idx = jnp.asarray(idx_np)
    ref = np.bincount(idx_np, minlength=bins)

    def loop(hist_fn):
        def body(i, acc):
            return acc + hist_fn((idx + i) % bins, bins)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(bins, jnp.int32))

    results = {}
    for name, fn in [("xla_matmul", matmul_histogram),
                     ("pallas_a", histogram_pallas),
                     ("pallas_b", histogram_pallas_b)]:
        try:
            t0 = time.time()
            h = jax.device_get(jax.jit(lambda v: fn(v, bins))(idx))
            compile_s = time.time() - t0
            exact = bool((np.asarray(h) == ref).all())
            lp = jax.jit(lambda: loop(fn))
            jax.block_until_ready(lp())
            t0 = time.time()
            jax.block_until_ready(lp())
            warm = time.time() - t0
            results[name] = dict(ok=True, exact=exact,
                                 compile_s=round(compile_s, 1),
                                 warm64_s=round(warm, 3))
        except Exception as e:
            results[name] = dict(ok=False, err=f"{type(e).__name__}: {e}"[:160])
        print(name, results[name], flush=True)
    return results


if __name__ == "__main__":
    race()

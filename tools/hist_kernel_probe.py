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


def _kernel_csa(idx_ref, out_ref, *, hi_n, lo_n):
    """Bit-sliced ('CSA / vertical counting') one-hot CONSTRUCTION probe:
    the hi-digit one-hot (hi_n wide, hi_n = 2^(2k)) is factored over its
    bit halves — oh_hi = repeat(oh_a) * tile(oh_b) with two sqrt(hi_n)-wide
    compare sweeps — instead of hi_n equality compares.  Compare count
    drops hi_n -> 2*sqrt(hi_n); the bins are reconstituted by vector
    multiplies.  This is the implementable core of the 'bit-sliced'
    headroom idea declined-on-an-estimate in round 4 (BASELINE.md): if
    Mosaic lowers the multiply+copy tree cheaper than compare+select
    sweeps, it wins; the MXU contraction is identical either way."""
    i = pl.program_id(0)
    flat = idx_ref[...]  # (BLK,) int32, -1 = masked (see kernels.py)
    c = flat.shape[0]
    sh = (lo_n.bit_length() - 1)
    hi = jax.lax.shift_right_arithmetic(flat, jnp.int32(sh))
    lo = jax.lax.bitwise_and(flat, jnp.int32(lo_n - 1))
    half = 1 << ((hi_n.bit_length() - 1) // 2)   # sqrt(hi_n), hi_n = half^2
    a = jax.lax.shift_right_arithmetic(hi, jnp.int32((half.bit_length() - 1)))
    b = jnp.where(hi >= 0, jax.lax.bitwise_and(hi, jnp.int32(half - 1)), -1)
    oh_a = (a[None, :] == jax.lax.broadcasted_iota(jnp.int32, (half, c), 0)
            ).astype(jnp.int8)
    oh_b = (b[None, :] == jax.lax.broadcasted_iota(jnp.int32, (half, c), 0)
            ).astype(jnp.int8)
    oh_hi = (jnp.repeat(oh_a, half, axis=0) *
             jnp.tile(oh_b, (half, 1)))                    # (hi_n, c)
    oh_lo = (lo[None, :] == jax.lax.broadcasted_iota(jnp.int32, (lo_n, c), 0)
             ).astype(jnp.int8)
    part = jax.lax.dot_general(oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        out_ref[...] = part

    @pl.when(i > 0)
    def _():
        out_ref[...] = out_ref[...] + part


@functools.partial(jax.jit, static_argnames=("bins",))
def histogram_pallas_csa(idx, bins: int):
    lo_n = 32
    hi_n = -(-bins // lo_n)  # 64 at 2048 bins: half = 8
    n = idx.shape[0]
    nblk = max(1, -(-n // BLK))
    pad = nblk * BLK - n
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
    out = pl.pallas_call(
        functools.partial(_kernel_csa, hi_n=hi_n, lo_n=lo_n),
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


def _kernel_i4(idx_ref, out_ref, *, hi_n, lo_n):
    """4-bit one-hots: halves the one-hot register/VMEM footprint if
    Mosaic supports an s4 x s4 -> s32 MXU contraction (the other
    'bit-sliced' direction: slice the OPERAND width, not the compares)."""
    i = pl.program_id(0)
    flat = idx_ref[...]
    c = flat.shape[0]
    sh = (lo_n.bit_length() - 1)
    hi = jax.lax.shift_right_arithmetic(flat, jnp.int32(sh))
    lo = jax.lax.bitwise_and(flat, jnp.int32(lo_n - 1))
    hi_oh = (hi[None, :] == jax.lax.broadcasted_iota(jnp.int32, (hi_n, c), 0)
             ).astype(jnp.int4)
    lo_oh = (lo[None, :] == jax.lax.broadcasted_iota(jnp.int32, (lo_n, c), 0)
             ).astype(jnp.int4)
    part = jax.lax.dot_general(hi_oh, lo_oh, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        out_ref[...] = part

    @pl.when(i > 0)
    def _():
        out_ref[...] = out_ref[...] + part


@functools.partial(jax.jit, static_argnames=("bins",))
def histogram_pallas_i4(idx, bins: int):
    lo_n = 32
    hi_n = -(-bins // lo_n)
    n = idx.shape[0]
    nblk = max(1, -(-n // BLK))
    pad = nblk * BLK - n
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
    out = pl.pallas_call(
        functools.partial(_kernel_i4, hi_n=hi_n, lo_n=lo_n),
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
                     ("pallas_b", histogram_pallas_b),
                     ("pallas_csa_factored", histogram_pallas_csa),
                     ("pallas_i4", histogram_pallas_i4)]:
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

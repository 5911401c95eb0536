"""Pallas TPU kernels for calibration statistics.

OCTAV (MSE-optimal clip, forward_net.py:323-330) is a 20-step fixed
point whose every step needs two global reductions over |x|.  The XLA
`lax.while_loop` formulation re-streams the tensor from HBM each
iteration (~20-40 passes); this kernel pins the tensor in VMEM and runs
the whole fixed point on-chip — one HBM read total.

Used for tensors that fit the VMEM budget; callers fall back to the XLA
path otherwise (calib/stats.py)."""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# VMEM is ~16MB/core; leave room for the fixed-point temporaries.
OCTAV_VMEM_ELEMS = 2 * 1024 * 1024  # 8MB of f32


def _octav_kernel(x_ref, out_ref, *, n_valid, dynamic_sym):
    """x_ref: (R, 128) f32 (zero-padded); n_valid: static count of real
    elements (the tensor shape is known at trace time, so it needs no SMEM
    operand).  out_ref: VMEM (8, 128) f32 tile carrying
    (optimal_s, data_min, data_max) in lanes 0..2 — a full vector tile
    rather than SMEM scalars so `jax.vmap` of the pallas_call (the batched
    stats forward) lowers cleanly: the batch dim becomes a squeezed grid
    dim and every remaining block dim equals the array dim."""
    x = x_ref[...]
    total = x.size
    rows = x.shape[0]
    n_valid = jnp.int32(n_valid)
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
                + jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1))
    valid = flat_idx < n_valid

    big = jnp.float32(np.finfo(np.float32).max)
    data_min = jnp.min(jnp.where(valid, x, big))
    data_max = jnp.max(jnp.where(valid, x, -big))

    abs_x = jnp.where(valid, jnp.abs(x), 0.0)
    pad_count = jnp.float32(total) - n_valid.astype(jnp.float32)
    nnz = jnp.maximum(jnp.sum((abs_x > 0).astype(jnp.float32)), 1.0)
    s0 = jnp.sum(abs_x) / nnz

    if dynamic_sym:
        unsigned = jnp.where(jnp.abs(data_min) < 1e-6, 4.0, 1.0)
    else:
        unsigned = jnp.float32(1.0)
    coef = 1.0 / (4.0 ** 8) / 3.0 / unsigned

    def cond(carry):
        s, prev, it = carry
        return jnp.logical_and(it < 20, jnp.abs(s - prev) >= 1e-6)

    def body(carry):
        s, _, it = carry
        gt = abs_x > s
        gt_f = gt.astype(jnp.float32)
        num = jnp.sum(abs_x * gt_f)
        gt_count = jnp.sum(gt_f)
        # zero-padded lanes land in the <=s bucket; remove them
        le_count = jnp.float32(total) - gt_count - pad_count
        s_next = num / jnp.maximum(coef * le_count + gt_count, 1e-30)
        return s_next, s, it + 1

    s_fin, _, _ = jax.lax.while_loop(cond, body, (s0, s0 + 1.0, jnp.int32(0)))
    # write a full (8, 128) tile (scalar VMEM stores are rejected by Mosaic;
    # SMEM outputs don't batch under vmap): lanes 0/1/2 of every row carry
    # the three results
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    out_ref[...] = jnp.where(
        lane == 0, s_fin,
        jnp.where(lane == 1, data_min,
                  jnp.where(lane == 2, data_max, 0.0)))


@functools.partial(jax.jit, static_argnames=("dynamic_sym",))
def octav_pallas(x, dynamic_sym: bool = False):
    """Returns (optimal_s, data_min, data_max) scalars for tensor x.
    Requires x.size <= OCTAV_VMEM_ELEMS."""
    flat = x.astype(jnp.float32).ravel()
    n = flat.size
    rows = -(-n // LANE)
    rows = max(rows, 8)  # min f32 tile is (8, 128)
    pad = rows * LANE - n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.float32)])
    x2d = flat.reshape(rows, LANE)
    out = pl.pallas_call(
        functools.partial(_octav_kernel, n_valid=n, dynamic_sym=dynamic_sym),
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2d)
    return out[0, 0], out[0, 1], out[0, 2]


def octav_fits_vmem(shape) -> bool:
    return int(np.prod(shape)) <= OCTAV_VMEM_ELEMS


# -- histogram ---------------------------------------------------------------
# 8192 elements per grid step; the in-kernel transposed one-hots are
# (hi_n, 8192) + (lo_n, 8192) int8 ~= 1.2MB of VMEM for bins=2048.
HIST_BLOCK = 8192


def _hist_kernel(idx_ref, out_ref, *, hi_n, lo_n):
    """One grid step: exact (hi_n, lo_n) count matrix of a chunk of bucket
    indices, accumulated across the sequential grid into the VMEM-resident
    output.  Negative indices (the padding sentinel) match no `hi` digit, so
    their joint count is zero — padding needs no separate mask.

    Same digit-split-as-matmul formulation as stats.matmul_histogram, but
    the one-hot operands live only in VMEM: HBM traffic is one int32 read
    per element instead of the ~(hi_n+lo_n) one-hot bytes/element the XLA
    path materializes for the MXU.  The one-hots are built TRANSPOSED —
    (digits, elements), elements on the lane axis, contraction over lanes —
    from a 1D lane-major block: a (elements, 1) column layout is rejected by
    the remote Mosaic compiler (probed on v5-lite); this form compiles and
    runs correctly but measurably TIES the XLA matmul-histogram on that
    chip (autotune probe 2026-08-21: pallas 0.052s vs xla 0.051s warm for
    64x4M-element 2048-bin histograms), so the strict-win gate keeps the
    XLA path in production and this kernel is the documented
    fallback/reference implementation — the binning cost is VPU-bound
    one-hot construction (~(hi_n+lo_n) compares/element), which both
    formulations share."""
    i = pl.program_id(0)
    flat = idx_ref[...]  # (HIST_BLOCK,) int32; -1 = masked padding
    valid = flat >= 0
    # keep the integer div/mod on non-negative operands only (floor-vs-trunc
    # semantics of negative division never enter the picture)
    hi = jnp.where(valid, flat // lo_n, -1)
    lo = jnp.where(valid, flat % lo_n, 0)
    c = flat.shape[0]
    hi_oh = (hi[None, :] == jax.lax.broadcasted_iota(jnp.int32, (hi_n, c), 0)
             ).astype(jnp.int8)
    lo_oh = (lo[None, :] == jax.lax.broadcasted_iota(jnp.int32, (lo_n, c), 0)
             ).astype(jnp.int8)
    part = jax.lax.dot_general(hi_oh, lo_oh, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        out_ref[...] = part

    @pl.when(i > 0)
    def _():
        out_ref[...] = out_ref[...] + part


@functools.partial(jax.jit, static_argnames=("bins",))
def histogram_pallas(idx, bins: int):
    """Exact histogram of int32 bucket indices in [0, bins); entries < 0 are
    ignored (callers mark masked/padded elements with -1).  Drop-in for
    stats.matmul_histogram with identical (bit-exact) counts."""
    lo_n = min(128, bins)
    hi_n = -(-bins // lo_n)
    n = idx.shape[0]
    nblk = max(1, -(-n // HIST_BLOCK))
    pad = nblk * HIST_BLOCK - n
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
    out = pl.pallas_call(
        functools.partial(_hist_kernel, hi_n=hi_n, lo_n=lo_n),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((HIST_BLOCK,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((hi_n, lo_n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_n, lo_n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(idx)
    return out.reshape(-1)[:bins]


def use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False

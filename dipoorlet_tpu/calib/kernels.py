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
# VMEM budget for the in-kernel transposed one-hot temporaries; the block
# length adapts so (hi_n + lo_n) rows x block x dtype stays under it.
HIST_ONEHOT_VMEM = 4 << 20


def _digit_split(bins: int, lo_n: int = None):
    """(hi_n, lo_n) digit split with hi_n * lo_n >= bins.

    The split is the kernel's speed dial, trading VPU against MXU:
    one-hot construction costs ~2*(hi_n + lo_n) VPU lane-ops/element,
    while the joint-count matmul (hi_n, E)@(E, lo_n) streams ~hi_n/128
    MXU cycles per element (the contraction dim E is consumed 128/cycle).
    Small hi_n starves the VPU budget (lo_n grows), large hi_n starves
    the MXU — the optimum is chip-dependent, so production resolves lo_n
    from the autotune probe (pallas_hist_cfg) rather than a formula."""
    if lo_n is None:
        lo = 1
        while lo * lo < bins:
            lo *= 2
        lo_n = lo
    lo_n = min(lo_n, bins)
    return -(-bins // lo_n), lo_n


def _hist_block(rows: int, dtype_bytes: int) -> int:
    c = HIST_ONEHOT_VMEM // (rows * dtype_bytes)
    return int(np.clip(c // 512 * 512, 4096, 32768))


def _hist_kernel(idx_ref, out_ref, *, hi_n, lo_n, oh_dtype):
    """One grid step: exact (hi_n, lo_n) count matrix of a chunk of bucket
    indices, accumulated across the sequential grid into the VMEM-resident
    output.

    Same digit-split-as-matmul formulation as stats.matmul_histogram, but
    the one-hot operands live only in VMEM: HBM traffic is one int32 read
    per element instead of the ~(hi_n+lo_n) one-hot bytes/element the XLA
    path materializes for the MXU (the XLA path's real bound).  The
    one-hots are built TRANSPOSED — (digits, elements), elements on the
    lane axis, contraction over lanes — from a 1D lane-major block: a
    (elements, 1) column layout is rejected by the remote Mosaic compiler
    (probed on v5-lite).

    Padding sentinel: callers mark masked elements with -1.  No explicit
    mask is needed — under floor semantics -1 // lo_n == -1 matches no
    `hi` digit; under trunc semantics -1 % lo_n == -1 matches no `lo`
    digit — either way the joint product is 0, saving two selects/element.

    oh_dtype int8: compare int32 -> int8 one-hots -> s8xs8->s32 MXU.
    oh_dtype int16: digits compared in 2-per-lane packed int16 — halves
    VPU compare throughput cost where Mosaic packs them (idx < 2^15).
    oh_dtype bfloat16: packed bf16 compares (digits < 256 are exact),
    f32 MXU accumulation (block counts < 2^24)."""
    i = pl.program_id(0)
    flat = idx_ref[...]  # (HIST_BLOCK,) int32; -1 = masked padding
    c = flat.shape[0]
    if lo_n & (lo_n - 1) == 0:
        sh = lo_n.bit_length() - 1
        # arithmetic >> floors: -1 -> hi -1 matches no digit; & keeps masking
        hi = jax.lax.shift_right_arithmetic(flat, jnp.int32(sh))
        lo = jax.lax.bitwise_and(flat, jnp.int32(lo_n - 1))
    else:
        # lax.div/rem = trunc semantics with no floor-correction selects:
        # -1 -> (hi 0, lo -1), and lo=-1 matches no digit (see docstring)
        hi = jax.lax.div(flat, jnp.int32(lo_n))
        lo = jax.lax.rem(flat, jnp.int32(lo_n))
    if oh_dtype in (jnp.bfloat16, jnp.int16):
        cmp_t = oh_dtype
        mm_t = jnp.bfloat16 if oh_dtype == jnp.bfloat16 else jnp.int8
        hi_oh = (hi.astype(cmp_t)[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (hi_n, c), 0).astype(cmp_t)).astype(mm_t)
        lo_oh = (lo.astype(cmp_t)[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (lo_n, c), 0).astype(cmp_t)).astype(mm_t)
        acc_t = jnp.float32 if oh_dtype == jnp.bfloat16 else jnp.int32
        part = jax.lax.dot_general(hi_oh, lo_oh, (((1,), (1,)), ((), ())),
                                   preferred_element_type=acc_t
                                   ).astype(jnp.int32)
    else:
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


def _hist_cfg(bins: int):
    """(variant, lo_n) for production calls: the probe's cached winner, or
    the geometric-mean split with int8 one-hots before any probe ran.
    A malformed cached/env value ('variant:lo_n' expected) falls back to
    the default instead of crashing the stats pass."""
    from .autotune import cached_value
    cfg = cached_value("pallas_hist_cfg", str(bins))
    if cfg:
        try:
            variant, lo_s = cfg.split(":")
            lo = int(lo_s)
        except ValueError:
            variant = lo = None
        if variant in ("i8", "i16", "bf16") and lo and lo > 0:
            return variant, lo
        from ..utils.logging import logger
        logger.warning("ignoring malformed pallas_hist_cfg %r "
                       "(expected '<i8|i16|bf16>:<lo_n>')", cfg)
    return "i8", None


def histogram_pallas(idx, bins: int, variant: str = None, lo_n: int = None):
    """Exact histogram of int32 bucket indices in [0, bins); entries < 0 are
    ignored (callers mark masked/padded elements with -1).  Drop-in for
    stats.matmul_histogram with identical (bit-exact) counts.

    variant: 'i8' (int8 one-hots, s8 MXU), 'i16' (2-packed int16 compares
    into int8 one-hots), or 'bf16' (bf16 one-hots, f32 MXU).  lo_n
    overrides the digit split.  Defaults resolve from the cached probe
    (pallas_hist_cfg) — OUTSIDE the jit boundary, so a probe result or
    env override recorded mid-process applies to the next call rather
    than being baked into the first trace."""
    if variant is None:
        variant, cfg_lo = _hist_cfg(bins)
        lo_n = lo_n if lo_n is not None else cfg_lo
    return _histogram_pallas_jit(idx, bins, variant, lo_n)


@functools.partial(jax.jit, static_argnames=("bins", "variant", "lo_n"))
def _histogram_pallas_jit(idx, bins: int, variant: str, lo_n):
    hi_n, lo_n = _digit_split(bins, lo_n)
    if variant == "bf16" and max(hi_n, lo_n) > 256:
        variant = "i8"  # bf16 integers are exact only up to 256
    if variant == "i16" and max(hi_n, lo_n) > 32767:
        variant = "i8"
    oh_dtype = {"bf16": jnp.bfloat16, "i16": jnp.int16}.get(variant, jnp.int8)
    block = _hist_block(hi_n + lo_n, 2 if variant == "bf16" else 1)
    n = idx.shape[0]
    nblk = max(1, -(-n // block))
    # bucket grid sizes to multiples of 4: every distinct grid count is a
    # separate Mosaic remote compile (a flake surface — see the runtime
    # fallback in stats.py); padding blocks are all -1 sentinels and cost
    # ~3 blocks of VPU time at most
    if nblk > 1:
        nblk = -(-nblk // 4) * 4
    pad = nblk * block - n
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
    out = pl.pallas_call(
        functools.partial(_hist_kernel, hi_n=hi_n, lo_n=lo_n, oh_dtype=oh_dtype),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((block,), lambda i: (i,),
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

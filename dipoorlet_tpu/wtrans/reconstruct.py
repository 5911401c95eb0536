"""Reconstruction engine: learns AdaRound round masks for a block of
1..3 learnable layers against FP32 outputs.

Reference: adaround.py:119-144 / brecq.py:158-200 — a torch Adam loop
over 5000 epochs with DDP gradient allreduce per step.

TPU-first design: the ENTIRE training loop (epochs x minibatches) runs
on-device inside a single jitted lax.scan — no per-step host dispatch.
Data parallelism comes from sharding the cached activation batch over
the mesh's data axis; XLA inserts the gradient psum in the backward pass
(replacing DDP/NCCL).  One compile per layer-shape class."""
from __future__ import annotations

import math
from functools import partial
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..quant.qparams import QParams
from ..utils.logging import logger
from .rounding import (adaround_reg, hard_quant_weight, init_round_mask,
                       l2_recon_loss, rectified_sigmoid, soft_quant_weight,
                       weight_rest)


class LayerSpec(NamedTuple):
    apply: callable                 # apply(x, w, b) in ONNX layouts
    weight: jnp.ndarray             # quant layout (transposed for ConvTranspose)
    bias: Optional[jnp.ndarray]
    qp: QParams
    per_channel: bool
    transposed: bool                # ConvTranspose: transpose back before apply
    relu: bool                      # fused trailing ReLU
    acti_qp: Optional[QParams]      # activation fake-quant (BRECQ/QDrop)


def _to_onnx_layout(w, transposed):
    return jnp.swapaxes(w, 0, 1) if transposed else w


def _layer_forward(spec: LayerSpec, mask, x, acti_quant: bool, drop_ratio: float, key):
    w_q = soft_quant_weight(spec.weight, mask, spec.qp.scale, spec.qp.q_min,
                            spec.qp.q_max, spec.per_channel)
    out = spec.apply(x, _to_onnx_layout(w_q, spec.transposed), spec.bias)
    if spec.relu:
        out = jnp.maximum(out, 0)
    if acti_quant and spec.acti_qp is not None:
        s = jnp.asarray(spec.acti_qp.scale, jnp.float32)
        lo = jnp.asarray(spec.acti_qp.q_min, jnp.float32)
        hi = jnp.asarray(spec.acti_qp.q_max, jnp.float32)
        oq = jnp.clip(jnp.round(out / s), lo, hi) * s
        if drop_ratio < 1.0:
            keep = jax.random.uniform(key, out.shape) < drop_ratio
            oq = jnp.where(keep, oq, out)
        out = oq
    return out


def learn_block(specs: List[LayerSpec], q_in: np.ndarray, fp_out: np.ndarray,
                batch_size: int, max_epoch: int, total_iter: int,
                acti_quant: bool = False, drop: bool = False,
                fp_in: Optional[np.ndarray] = None, seed: int = 0,
                data_sharding=None):
    """Returns the list of learned round masks (device arrays).

    q_in/fp_out: (N, *declared_shape) with the declared leading batch dim
    squeezed away by the caller (reference squeezes dim 1, adaround.py:128).
    """
    n = q_in.shape[0]
    n_batches = max(1, math.ceil(n / batch_size))
    pad = n_batches * batch_size - n
    drop_ratio = 0.5

    def pad0(a):
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a

    q_in_d = jnp.asarray(pad0(q_in))
    fp_out_d = jnp.asarray(pad0(fp_out))
    fp_in_d = jnp.asarray(pad0(fp_in)) if fp_in is not None else None
    valid = jnp.asarray(pad0(np.ones((n,), np.float32)))
    if data_sharding is not None:
        q_in_d = jax.device_put(q_in_d, data_sharding)
        fp_out_d = jax.device_put(fp_out_d, data_sharding)
        if fp_in_d is not None:
            fp_in_d = jax.device_put(fp_in_d, data_sharding)

    masks0 = tuple(init_round_mask(weight_rest(s.weight, s.qp.scale)) for s in specs)
    tx = optax.adam(1e-3)  # torch.optim.Adam defaults (adaround.py:120)
    opt_state = tx.init(masks0)
    root_key = jax.random.PRNGKey(seed)

    def body(carry, it):
        masks, opt_state = carry
        b_idx = it % n_batches
        st = b_idx * batch_size
        x = jax.lax.dynamic_slice_in_dim(q_in_d, st, batch_size)
        tgt = jax.lax.dynamic_slice_in_dim(fp_out_d, st, batch_size)
        w = jax.lax.dynamic_slice_in_dim(valid, st, batch_size)
        it_key = jax.random.fold_in(root_key, it)
        if drop and fp_in_d is not None:
            xf = jax.lax.dynamic_slice_in_dim(fp_in_d, st, batch_size)
            keep = jax.random.uniform(jax.random.fold_in(it_key, 9999), x.shape) < 0.5
            x = jnp.where(keep, x, xf)

        def full_loss(masks):
            out = x
            for li, spec in enumerate(specs):
                k = jax.random.fold_in(it_key, li)
                out = _layer_forward(spec, masks[li], out, acti_quant, drop_ratio, k)
            se = jnp.sum(jnp.square(out - tgt), axis=1)
            wgt = w.reshape((-1,) + (1,) * (se.ndim - 1))
            l2 = jnp.sum(se * wgt) / jnp.maximum(jnp.sum(w) * np.prod(se.shape[1:]), 1.0)
            reg = 0.0
            for m in masks:
                reg = reg + adaround_reg(m, it.astype(jnp.float32), float(total_iter))
            return l2 + reg, l2

        (loss, l2), grads = jax.value_and_grad(full_loss, has_aux=True)(masks)
        updates, opt_state = tx.update(grads, opt_state)
        masks = optax.apply_updates(masks, updates)
        return (masks, opt_state), l2

    @jax.jit
    def train(masks, opt_state):
        (masks, opt_state), losses = jax.lax.scan(
            body, (masks, opt_state), jnp.arange(total_iter))
        return masks, losses

    masks, losses = train(masks0, opt_state)
    final_l2 = float(losses[-1])
    for m in masks:
        h = np.asarray(rectified_sigmoid(m))
        ceil_n = int((h + 1e-4 >= 1.0).sum())
        floor_n = int((h <= 1e-4).sum())
        logger.info("L2 Loss: %.3f Ceil: %d Floor: %d Total: %d Ratio: %.3f",
                    final_l2, ceil_n, floor_n, h.size,
                    (ceil_n + floor_n) / h.size)
    return list(masks)


def hard_round_weight(spec: LayerSpec, mask) -> np.ndarray:
    """Final hard-rounded weight in the node's ONNX layout."""
    w = hard_quant_weight(spec.weight, mask, spec.qp.scale, spec.qp.q_min,
                          spec.qp.q_max, spec.per_channel)
    return np.asarray(_to_onnx_layout(w, spec.transposed))

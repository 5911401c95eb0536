"""Reconstruction engine: learns AdaRound round masks for a block of
1..3 learnable layers against FP32 outputs.

Reference: adaround.py:119-144 / brecq.py:158-200 — a torch Adam loop
over 5000 epochs with DDP gradient allreduce per step.

TPU-first design:
  * the ENTIRE training loop (epochs x minibatches) runs on-device inside
    a single jitted lax.scan — no per-step host dispatch;
  * the trainer is ONE module-level jitted function whose static key is
    the block's structural signature, so identically-shaped layers (most
    of a ResNet) reuse the compiled program instead of recompiling
    (SURVEY §7 "shape-bucketing");
  * data parallelism = shard the cached activation batch over the mesh's
    data axis; XLA inserts the gradient psum in the backward pass
    (replacing DDP/NCCL)."""
from __future__ import annotations

import math
import os
from functools import lru_cache, partial
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..graph.graph import node_attrs
from ..ops import OP_REGISTRY, OpContext
from ..quant.qparams import QParams
from ..utils.logging import logger
from .rounding import (adaround_reg, hard_quant_weight, init_round_mask,
                       rectified_sigmoid, soft_quant_weight, weight_rest)


class LayerSpec(NamedTuple):
    node_sig: tuple                 # hashable (op_type, attrs) signature
    weight: jnp.ndarray             # quant layout (transposed for ConvTranspose)
    bias: Optional[jnp.ndarray]
    qp: QParams
    per_channel: bool
    transposed: bool                # ConvTranspose: transpose back before apply
    relu: bool                      # fused trailing ReLU
    acti_qp: Optional[QParams]      # activation fake-quant (BRECQ/QDrop)


def node_signature(node) -> tuple:
    """Hashable structural signature of a node (op_type + attributes)."""
    items = []
    for k, v in sorted(node_attrs(node).items()):
        if isinstance(v, (list, tuple)):
            v = tuple(v)
        elif isinstance(v, (bytes, int, float, str)):
            pass
        else:
            v = repr(v)
        items.append((k, v))
    return (node.op_type, tuple(items))


@lru_cache(maxsize=None)
def _apply_from_sig(sig: tuple):
    op_type, items = sig
    attrs = {k: (list(v) if isinstance(v, tuple) else v) for k, v in items}
    fn = OP_REGISTRY[op_type]
    ctx = OpContext(attrs)

    def apply(x, w, b=None):
        if b is None:
            return fn(ctx, x, w)
        return fn(ctx, x, w, b)

    return apply


def _to_onnx_layout(w, transposed):
    return jnp.swapaxes(w, 0, 1) if transposed else w


def make_stacker(n, batch_size, data_sharding=None, plan=None, global_mesh=None):
    """Builds the (n_batches, bs, ...) minibatch stacking machinery shared
    by the reconstruction and sparse trainers.

    Returns (stack, place, n_batches, bs_local, multihost): `stack` maps a
    local (N_local, ...) activation stack into the training layout —
    scattered into this process's plan slots, then (multi-host) assembled
    into the GLOBAL (n_batches, bs_global, ...) array over a mesh spanning
    every process, or (single-controller) device_put with the batch axis
    sharded over the local data mesh.  `place` does only the placement
    step for an already-stacked array (the valid mask)."""
    multihost = global_mesh is not None  # only passed under process_count > 1
    if plan is not None:
        n_batches, bsl = plan.n_batches, plan.bs_local
        slots = jnp.asarray(plan.slots)
    else:
        n_batches = max(1, math.ceil(n / batch_size))
        bsl = batch_size
        slots = jnp.arange(n)

    if data_sharding is not None and bsl % data_sharding.mesh.devices.size:
        data_sharding = None  # batch does not divide the mesh: run replicated
    stacked_sharding = None
    from jax.sharding import NamedSharding, PartitionSpec
    if multihost:
        stacked_sharding = NamedSharding(global_mesh, PartitionSpec(None, "data"))
    elif data_sharding is not None:
        stacked_sharding = NamedSharding(data_sharding.mesh,
                                         PartitionSpec(None, *data_sharding.spec))

    def place(full):
        if multihost:
            # every process contributes its (n_batches, bs_local) slice of
            # the (n_batches, bs_global) array along the sharded batch axis
            return jax.make_array_from_process_local_data(
                stacked_sharding, np.asarray(jax.device_get(full)))
        if stacked_sharding is not None:
            return jax.device_put(full, stacked_sharding)
        return full

    def stack(a):
        a = jnp.asarray(a)  # device-side scatter; inputs may already live on device
        full = jnp.zeros((n_batches * bsl,) + a.shape[1:], a.dtype)
        if n:
            full = full.at[slots].set(a)
        return place(full.reshape((n_batches, bsl) + a.shape[1:]))

    return stack, place, n_batches, bsl, multihost


def _valid_mask(n, batch_size, plan=None):
    if plan is not None:
        return jnp.asarray(plan.valid)
    n_batches = max(1, math.ceil(n / batch_size))
    v = np.zeros((n_batches, batch_size), np.float32)
    v.ravel()[:n] = 1.0
    return jnp.asarray(v)


class _BlockSig(NamedTuple):
    layers: tuple      # per-layer (node_sig, transposed, relu, per_channel, has_bias, has_acti)
    batch_size: int
    n_batches: int
    total_iter: int
    acti_quant: bool
    drop: bool


def _layer_forward(sig_entry, mask, x, w, b, scale, q_min, q_max, acti, drop_ratio, key):
    node_sig, transposed, relu, per_channel, has_bias, has_acti = sig_entry
    apply = _apply_from_sig(node_sig)
    w_q = soft_quant_weight(w, mask, scale, q_min, q_max, per_channel)
    out = apply(x, _to_onnx_layout(w_q, transposed), b if has_bias else None)
    if relu:
        out = jnp.maximum(out, 0)
    if acti is not None and has_acti:
        a_scale, a_lo, a_hi = acti
        oq = jnp.clip(jnp.round(out / a_scale), a_lo, a_hi) * a_scale
        if drop_ratio < 1.0:
            keep = jax.random.uniform(key, out.shape) < drop_ratio
            oq = jnp.where(keep, oq, out)
        out = oq
    return out


@partial(jax.jit, static_argnames=("bsig", "n_iter"))
def _train_block_chunk(bsig: _BlockSig, weights, biases, wq, actis, masks,
                       opt_state, start_it, n_iter, q_in, fp_out, fp_in,
                       valid, seed):
    """THE reconstruction trainer — the only step-body definition.

    Runs iterations [start_it, start_it + n_iter) of the GLOBAL range as
    one on-device lax.scan: minibatch rotation, PRNG folding and the
    β-annealed regularizer all key off the global step, so a sequence of
    chunked calls with carried (masks, opt_state) is bit-identical to one
    n_iter = total_iter call (parity-tested).  The unchunked path IS the
    n_iter = total_iter special case — there is deliberately no separate
    single-scan trainer to keep in sync.

    Activation tensors arrive stacked (n_batches, bs, *shape) with the bs
    axis (optionally) sharded over the mesh's 'data' axis: indexing the
    leading (replicated) axis per step keeps every minibatch sharded like
    its source array, so the gradient psum XLA inserts in the backward is
    the whole cross-chip communication (DDP's allreduce, reference
    adaround.py:121).  Chunking exists because a single 5000-step scan at
    large shapes repeatably crashes the relay-attached TPU worker
    (docs/SCAN_FAULT_REPRO.md); the jit static key is (bsig, n_iter), so
    identically-shaped layers and every equal-length chunk reuse one
    compiled program."""
    tx = optax.adam(1e-3)  # torch.optim.Adam defaults (adaround.py:120)
    root_key = jax.random.PRNGKey(seed)
    n_batches = bsig.n_batches
    drop_ratio = 0.5

    def body(carry, it):
        masks, opt_state = carry
        b_idx = it % n_batches
        x0 = jax.lax.dynamic_index_in_dim(q_in, b_idx, keepdims=False)
        tgt = jax.lax.dynamic_index_in_dim(fp_out, b_idx, keepdims=False)
        w_mask = jax.lax.dynamic_index_in_dim(valid, b_idx, keepdims=False)
        it_key = jax.random.fold_in(root_key, it)
        if bsig.drop:
            xf = jax.lax.dynamic_index_in_dim(fp_in, b_idx, keepdims=False)
            keep = jax.random.uniform(jax.random.fold_in(it_key, 9999), x0.shape) < 0.5
            x0 = jnp.where(keep, x0, xf)

        def full_loss(masks):
            out = x0
            for li, entry in enumerate(bsig.layers):
                k = jax.random.fold_in(it_key, li)
                acti = actis[li] if bsig.acti_quant else None
                out = _layer_forward(entry, masks[li], out, weights[li], biases[li],
                                     wq[li][0], wq[li][1], wq[li][2],
                                     acti, drop_ratio, k)
            se = jnp.sum(jnp.square(out - tgt), axis=1)
            wgt = w_mask.reshape((-1,) + (1,) * (se.ndim - 1))
            l2 = jnp.sum(se * wgt) / jnp.maximum(
                jnp.sum(w_mask) * np.prod(se.shape[1:]), 1.0)
            reg = 0.0
            for m in masks:
                reg = reg + adaround_reg(m, it.astype(jnp.float32),
                                         float(bsig.total_iter))
            return l2 + reg, l2

        (_, l2), grads = jax.value_and_grad(full_loss, has_aux=True)(masks)
        updates, opt_state = tx.update(grads, opt_state)
        masks = optax.apply_updates(masks, updates)
        return (masks, opt_state), l2

    (masks, opt_state), losses = jax.lax.scan(
        body, (masks, opt_state), start_it + jnp.arange(n_iter))
    return masks, opt_state, losses


def _auto_chunk(specs, q_in_d, fp_out_d, fp_in_d, total_iter, acti_quant, drop):
    """Chunk length for the training scan, 0 = unchunked.

    Fences the repeatable relay-TPU worker kernel fault on long
    multi-layer-block scans.  The condition is MEASURED, not a proxy
    (round-5 bisect, docs/SCAN_FAULT_REPRO.md + SCAN_FAULT_PROBE.json):
    every isolated scan passes — including the exact crash-shape program
    — and in the full pipeline the largest single-layer blocks pass
    unchunked while the 2-conv block at >64 MB step activations crashes
    at 5000 iters (r4 and r5).  So the fence keys on exactly that
    regime: multi-layer AND long AND large-step; activation bytes alone
    were shown NOT to discriminate (the passing single-layer case moves
    3x more bytes than the crashing 2-conv case)."""
    step_bytes = (np.prod(q_in_d.shape[1:]) + np.prod(fp_out_d.shape[1:])
                  + np.prod(fp_in_d.shape[1:])) * 4
    return 500 if (len(specs) > 1 and total_iter > 1000
                   and step_bytes > 64 * 2 ** 20) else 0


def learn_block(specs: List[LayerSpec], q_in: np.ndarray, fp_out: np.ndarray,
                batch_size: int, max_epoch: int, total_iter: int,
                acti_quant: bool = False, drop: bool = False,
                fp_in: Optional[np.ndarray] = None, seed: int = 0,
                data_sharding=None, plan=None, global_mesh=None):
    """Returns the list of learned round masks.

    q_in/fp_out: (N_local, *shape) with the declared batch dim already
    squeezed (reference squeezes dim 1, adaround.py:128).

    data_sharding: a NamedSharding over the batch axis (P('data')); the
    stacked (n_batches, bs, ...) layout shards bs and replicates the
    step axis.

    plan/global_mesh (multi-host): a ShardPlan mapping this process's
    activations into its (n_batches, bs_local) slice of the GLOBAL
    minibatch, assembled over a mesh spanning every process's devices —
    one SPMD program whose backward psum reduces gradients across all
    ranks (the reference's DDP allreduce, adaround.py:121), so every rank
    learns identical masks from all shards."""
    stack, place, n_batches, bsl, multihost = make_stacker(
        q_in.shape[0], batch_size, data_sharding, plan, global_mesh)
    q_in_d = stack(q_in)
    fp_out_d = stack(fp_out)
    fp_in_d = stack(fp_in) if fp_in is not None else q_in_d
    valid = place(_valid_mask(q_in.shape[0], batch_size, plan))

    layers_sig = tuple(
        (s.node_sig, s.transposed, s.relu, s.per_channel, s.bias is not None,
         s.acti_qp is not None)
        for s in specs)
    bsig = _BlockSig(layers=layers_sig, batch_size=bsl, n_batches=n_batches,
                     total_iter=int(total_iter), acti_quant=acti_quant, drop=drop)

    weights = tuple(s.weight for s in specs)
    biases = tuple((s.bias if s.bias is not None else jnp.zeros((1,), jnp.float32))
                   for s in specs)
    wq = tuple((jnp.asarray(s.qp.scale, jnp.float32),
                jnp.asarray(s.qp.q_min, jnp.float32),
                jnp.asarray(s.qp.q_max, jnp.float32)) for s in specs)
    actis = tuple(((jnp.asarray(s.acti_qp.scale, jnp.float32),
                    jnp.asarray(s.acti_qp.q_min, jnp.float32),
                    jnp.asarray(s.acti_qp.q_max, jnp.float32))
                   if s.acti_qp is not None else
                   (jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0)))
                  for s in specs)
    masks0 = tuple(init_round_mask(weight_rest(s.weight, s.qp.scale)) for s in specs)

    env_chunk = os.environ.get("DIPOORLET_TPU_SCAN_CHUNK")
    if env_chunk is not None:
        chunk = int(env_chunk)
    else:
        chunk = _auto_chunk(specs, q_in_d, fp_out_d, fp_in_d, int(total_iter),
                            acti_quant, drop)
    if not (chunk and int(total_iter) > chunk):
        chunk = int(total_iter)  # unchunked = the single full-range chunk
    tx_state = optax.adam(1e-3).init(masks0)
    masks = masks0
    loss_chunks = []
    for start in range(0, int(total_iter), chunk):
        n_iter = min(chunk, int(total_iter) - start)
        masks, tx_state, losses = _train_block_chunk(
            bsig, weights, biases, wq, actis, masks, tx_state,
            jnp.int32(start), n_iter, q_in_d, fp_out_d, fp_in_d, valid,
            jnp.int32(seed))
        loss_chunks.append(losses)
    losses = jnp.concatenate(loss_chunks) if len(loss_chunks) > 1 else loss_chunks[0]
    if multihost:
        # masks/losses are replicated over the global mesh; pull them to
        # host so downstream hard-rounding is a purely local computation
        masks = [jnp.asarray(np.asarray(jax.device_get(m))) for m in masks]
        final_l2 = float(np.asarray(jax.device_get(losses))[-1])
    else:
        final_l2 = float(losses[-1])
    for m in masks:
        h = np.asarray(rectified_sigmoid(m))
        ceil_n = int((h + 1e-4 >= 1.0).sum())
        floor_n = int((h <= 1e-4).sum())
        logger.info("L2 Loss: %.3f Ceil: %d Floor: %d Total: %d Ratio: %.3f",
                    final_l2, ceil_n, floor_n, h.size, (ceil_n + floor_n) / h.size)
    return list(masks)


def hard_round_weight(spec: LayerSpec, mask) -> np.ndarray:
    """Final hard-rounded weight in the node's ONNX layout."""
    w = hard_quant_weight(spec.weight, mask, spec.qp.scale, spec.qp.q_min,
                          spec.qp.q_max, spec.per_channel)
    return np.asarray(_to_onnx_layout(w, spec.transposed))

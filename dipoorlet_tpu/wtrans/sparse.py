"""Sparse-quant: per-layer weight finetune under a prune mask + STE
fake-quant.

Behavioral port of /root/reference/dipoorlet/weight_transform/
sparse_quant.py:19-130 and sparse_quant_layer.py:9-176: SGD(lr 1e-3,
momentum .9, wd 1e-4) with per-epoch cosine LR; dynamic prune mask
(unstructured top-k magnitude or NV 2:4) recomputed every forward;
final weight = quant(prune(w)).  The full loop runs on-device in one
lax.scan."""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..quant.fake_quant import ste_round
from ..quant.quant_graph import quant_graph
from ..utils.logging import logger
from .adaround import _build_layer_spec
from .common import (LEARNABLE_LAYER_TYPES, follow_relu,
                     make_activation_provider, mesh_sharding,
                     quantized_input_name, reconstruction_mesh,
                     reconstruction_plan, squeeze_batch_dim,
                     warn_if_shared_param, wt_input_source)
from .reconstruct import _apply_from_sig, _to_onnx_layout
from .weight_equalization import node_has_equalized


def unstructured_mask(w, rate):
    absw = jnp.abs(w)
    prune_num = int(rate * w.size)
    if prune_num == 0:
        return jnp.ones_like(w)
    threshold = jnp.sort(absw.ravel())[prune_num - 1]
    return (absw > threshold).astype(w.dtype)


def nv24_mask(w, n=2, m=4):
    """Keep largest n of every m along the input-channel dim
    (sparse_quant_layer.py:42-54)."""
    if w.ndim == 4:
        wt = jnp.transpose(jnp.abs(w), (0, 2, 3, 1)).reshape(-1, m)
    else:
        wt = jnp.abs(w).reshape(-1, m)
    ranks = jnp.argsort(jnp.argsort(wt, axis=1), axis=1)
    mask = (ranks >= (m - n)).astype(w.dtype)
    if w.ndim == 4:
        mask = mask.reshape(w.shape[0], w.shape[2], w.shape[3], w.shape[1])
        mask = jnp.transpose(mask, (0, 3, 1, 2))
    else:
        mask = mask.reshape(w.shape)
    return mask


def prune_weight(w, sparse_info):
    if sparse_info["pattern"] == "unstruction":
        return w * unstructured_mask(w, sparse_info["rate"])
    return w * nv24_mask(w)


def quant_weight_ste(w, qp, per_channel):
    s = jnp.asarray(qp.scale, jnp.float32)
    if s.ndim > 0 and s.size > 1:
        s = s.reshape((-1,) + (1,) * (w.ndim - 1))
        lo = jnp.asarray(qp.q_min, jnp.float32).reshape(s.shape)
        hi = jnp.asarray(qp.q_max, jnp.float32).reshape(s.shape)
    else:
        lo = jnp.asarray(qp.q_min, jnp.float32).reshape(())
        hi = jnp.asarray(qp.q_max, jnp.float32).reshape(())
        s = s.reshape(())
    wq = ste_round(w / s)
    if per_channel:
        wq = jnp.clip(wq, lo, hi)
    return wq * s


def sparse_quant(graph_ori, graph, act_clip_val, weight_clip_val, args):
    clip_val = act_clip_val.copy()
    clip_val.update(weight_clip_val)
    graph_sq = graph.clone()
    plan = reconstruction_plan(args)
    gmesh = reconstruction_mesh(args, plan)
    sparse_info = {"sparse": True, "rate": args.sparse_rate, "pattern": args.pattern}

    fp_provider = make_activation_provider(graph_ori, args, 0, args.data_num,
                                           indices=plan.indices)
    graph_q, _ = quant_graph(graph_sq, clip_val, args)
    q_provider = make_activation_provider(graph_q, args, 0, args.data_num,
                                          indices=plan.indices)

    for node in graph_ori.graph.node:
        if node.name in args.skip_layers:
            continue
        if node.op_type not in LEARNABLE_LAYER_TYPES:
            continue
        if args.we and node_has_equalized(graph, node):
            continue
        logger.info("sparse_quant for: %s", node.name)

        in_name = quantized_input_name(q_provider.graph,
                                       wt_input_source(graph_sq, node))
        q_in = q_provider.get(in_name)[in_name]
        relu_flag = follow_relu(graph, node)
        fp_out = fp_provider.get(node.output[0], relu=relu_flag)[node.output[0]]
        q_in = squeeze_batch_dim(q_in)
        fp_out = squeeze_batch_dim(fp_out)

        spec = _build_layer_spec(graph_sq, graph_sq, node, clip_val, args, relu_flag)
        new_weight = _learn_sparse(spec, q_in, fp_out, args.ada_bs, args.ada_epoch,
                                   sparse_info, data_sharding=mesh_sharding(args),
                                   plan=plan, global_mesh=gmesh)
        warn_if_shared_param(graph_sq, node.input[1], "sparse_quant")
        graph_sq.set_initializer(node.input[1], new_weight)
        q_provider.update_weight(node.input[1], new_weight)

    if getattr(args, "world_size", 1) > 1:
        from ..parallel import assert_rank_identical
        assert_rank_identical(graph_sq, "sparse_quant")
    if getattr(args, "rank", 0) == 0 and graph_sq.output_dir:
        graph_sq.update_model()
        graph_sq.save_onnx_model("sparse_quant")
    return graph_sq


def _learn_sparse(spec, q_in, fp_out, batch_size, max_epoch, sparse_info,
                  data_sharding=None, plan=None, global_mesh=None):
    from .reconstruct import _valid_mask, make_stacker
    # stacked (n_batches, bs, ...) layout; bs axis shards over the local
    # mesh, or over the all-process global mesh under multi-host (see
    # reconstruct.make_stacker)
    stack, place, n_batches, _, multihost = make_stacker(
        q_in.shape[0], batch_size, data_sharding, plan, global_mesh)
    q_in_d = stack(q_in)
    fp_out_d = stack(fp_out)
    valid = place(_valid_mask(q_in.shape[0], batch_size, plan))
    total_iter = max_epoch * n_batches

    # torch CosineAnnealingLR stepped per epoch (sparse_quant.py:108-127)
    def lr_schedule(it):
        epoch = it // n_batches
        return 0.001 * 0.5 * (1.0 + jnp.cos(np.pi * epoch / max_epoch))

    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(learning_rate=lr_schedule, momentum=0.9))
    w0 = spec.weight
    opt_state = tx.init(w0)

    apply = _apply_from_sig(spec.node_sig)

    def forward(w, x):
        wq = quant_weight_ste(prune_weight(w, sparse_info), spec.qp, spec.per_channel)
        out = apply(x, _to_onnx_layout(wq, spec.transposed), spec.bias)
        if spec.relu:
            out = jnp.maximum(out, 0)
        return out

    @jax.jit
    def train(w, opt_state, q_in_d, fp_out_d, valid):
        # data arrive as jit ARGUMENTS (never closed over): under multi-host
        # they are global arrays spanning non-addressable devices, which jit
        # only accepts as inputs
        def body(carry, it):
            w, opt_state = carry
            b_idx = it % n_batches
            x = jax.lax.dynamic_index_in_dim(q_in_d, b_idx, keepdims=False)
            tgt = jax.lax.dynamic_index_in_dim(fp_out_d, b_idx, keepdims=False)
            vw = jax.lax.dynamic_index_in_dim(valid, b_idx, keepdims=False)

            def loss_fn(w):
                out = forward(w, x)
                se = jnp.sum(jnp.square(out - tgt), axis=1)
                wgt = vw.reshape((-1,) + (1,) * (se.ndim - 1))
                return jnp.sum(se * wgt) / jnp.maximum(
                    jnp.sum(vw) * np.prod(se.shape[1:]), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(w)
            updates, opt_state = tx.update(grads, opt_state, w)
            w = optax.apply_updates(w, updates)
            return (w, opt_state), loss

        (w, opt_state), losses = jax.lax.scan(body, (w, opt_state),
                                              jnp.arange(total_iter))
        return w, losses

    w_fin, losses = train(w0, opt_state, q_in_d, fp_out_d, valid)
    if multihost:
        # replicated over the global mesh; pull to host for local finishing
        w_fin = jnp.asarray(np.asarray(jax.device_get(w_fin)))
        losses = np.asarray(jax.device_get(losses))
    logger.info("Loss: %.6f", float(losses[-1]))
    w_final = quant_weight_ste(prune_weight(w_fin, sparse_info), spec.qp, spec.per_channel)
    return np.asarray(_to_onnx_layout(w_final, spec.transposed))

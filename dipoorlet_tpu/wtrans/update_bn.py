"""BN statistics refresh from quantized activations.

Behavioral port of /root/reference/dipoorlet/weight_transform/
update_bn.py:12-48 (multipass variant): for each BatchNormalization node
in order, re-estimate running mean/var from the quantized graph's input
activations with momentum 0.9, updating the graph between BNs.

Note: the reference updates running_var with np.std (not variance) —
reproduced verbatim for parity (update_bn.py:17).

The per-sample (mean, std) statistics are computed on device; the
momentum recurrence runs on host over tiny (C,) vectors."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.graph import GraphIR
from ..quant.quant_graph import quant_graph
from ..utils.logging import logger
from .common import ActivationProvider, shard_bounds

MOMENTUM = 0.9


def update_bn(graph: GraphIR, act_clip_val, weight_clip_val, args):
    clip_val = act_clip_val.copy()
    clip_val.update(weight_clip_val)
    graph_bn = graph.clone()
    bn_nodes = [n for n in graph_bn.graph.node if n.op_type == "BatchNormalization"]
    if not bn_nodes:
        if getattr(args, "rank", 0) == 0:
            graph_bn.save_onnx_model("update_bn_model")
        return graph_bn

    st, ed = shard_bounds(args)
    graph_q, _ = quant_graph(graph_bn, clip_val, args)
    q_provider = ActivationProvider(graph_q, args, st, ed)

    def per_sample_stats(name, arr):
        axes = (0,) + tuple(range(2, arr.ndim))
        return jnp.mean(arr, axis=axes), jnp.std(arr, axis=axes)

    # one compiled program tapping EVERY BN input (vs one per node): each
    # sequential iteration still sees the prior BN updates through the
    # provider's params, but the phase compiles once
    bn_inputs = [n.input[0] for n in bn_nodes]
    key = ("bnstats", tuple(bn_inputs))
    if key not in q_provider._fns:
        q_provider._fns[key] = q_provider.ex.make_batched(
            taps=bn_inputs, tap_transform=per_sample_stats, outputs=())
    fn = q_provider._fns[key]
    for node in bn_nodes:
        logger.info("Update BN for node: %s", node.name)
        in_tensor = node.input[0]
        means, stds = [], []
        for idx in q_provider.dataset.iter_batches(q_provider.batch_size, st, ed):
            batch = q_provider.dataset.load_batch(idx)
            _, taps = fn(q_provider.params, batch)
            m, s = taps[in_tensor]
            means.append(m)  # stay on device; one packed fetch below
            stds.append(s)
        means, stds = (np.asarray(a) for a in jax.device_get(
            (jnp.concatenate(means, axis=0), jnp.concatenate(stds, axis=0))))
        if jax.process_count() > 1:
            # multi-host: gather every rank's per-sample stats (equal-size
            # contiguous shards, so rank-major concatenation IS the global
            # sample order) and run the momentum recurrence over ALL
            # samples on every rank — rank-identical and full-data, where
            # the reference runs rank 0 only and broadcasts via the
            # filesystem (weight_trans_base.py:22-29)
            from jax.experimental import multihost_utils
            g_m = np.asarray(multihost_utils.process_allgather(jnp.asarray(means)))
            g_s = np.asarray(multihost_utils.process_allgather(jnp.asarray(stds)))
            means = g_m.reshape(-1, g_m.shape[-1])
            stds = g_s.reshape(-1, g_s.shape[-1])

        running_mean = graph_bn.get_initializer(node.input[3]).astype(np.float64)
        running_var = graph_bn.get_initializer(node.input[4]).astype(np.float64)
        for i in range(means.shape[0]):
            running_mean = MOMENTUM * running_mean + (1.0 - MOMENTUM) * means[i]
            running_var = MOMENTUM * running_var + (1.0 - MOMENTUM) * stds[i]
        graph_bn.set_initializer(node.input[3], running_mean.astype(np.float32))
        graph_bn.set_initializer(node.input[4], running_var.astype(np.float32))
        # propagate into the quantized executor for the next BN's activations
        q_provider.update_weight(node.input[3], running_mean.astype(np.float32))
        q_provider.update_weight(node.input[4], running_var.astype(np.float32))

    if jax.process_count() > 1:
        from ..parallel import assert_rank_identical
        assert_rank_identical(graph_bn, "update_bn")
    graph_bn.update_model()
    if getattr(args, "rank", 0) == 0:
        graph_bn.save_onnx_model("update_bn_model")
    return graph_bn

"""Bias correction.

Behavioral port of /root/reference/dipoorlet/weight_transform/
bias_correction.py:10-55: for each Conv/Gemm node (topo order), add the
per-channel mean FP-vs-quant output difference to the bias.

TPU design: the QDQ graph is built ONCE; bias updates are executor
param updates (no recompilation, mirroring the reference's incremental
ActivationCache reuse at bias_correction.py:46-51), and the channel-mean
statistic is reduced on device so no activation tensors reach the host."""
from __future__ import annotations

import numpy as np

from ..graph.graph import GraphIR
from ..onnx_ir import make_node
from ..quant.quant_graph import quant_graph
from ..utils.logging import logger
from .common import (ActivationProvider, SegmentedActivationProvider,
                     make_activation_provider, shard_bounds)

BC_NODE_TYPES = ("Conv", "Gemm")


def _ensure_bias(graph: GraphIR, node) -> str:
    """Give the node a zero bias initializer if it has none
    (bias_correction.py:23-31)."""
    if len(node.input) > 2:
        return node.input[2]
    weight = graph.get_initializer(node.input[1])
    c_out = weight.shape[0] if node.op_type != "ConvTranspose" else weight.shape[1]
    bias_name = node.name + "_bias"
    graph.set_initializer(bias_name, np.zeros(c_out, dtype=np.float32))
    node.input.append(bias_name)
    return bias_name


def _bc_segmented(graph_bc, q_provider, bc_nodes, fp_means, args):
    """O(1)-sweep BiasCorrection: ONE segmented frontier sweep over the
    quantized graph (2x segment evaluations — peek the statistic, update
    the bias, re-run the segment under the new bias to commit).  Sequential
    semantics match the reference's incremental cache reuse
    (bias_correction.py:46-51): node k's statistic reflects every earlier
    update because the committed frontier was recomputed under them."""
    import jax
    for node in bc_nodes:
        logger.info("Update bias for node: %s", node.name)
        out = node.output[0]
        q_sum, n_local = q_provider.peek_channel_sum(out)
        if jax.process_count() > 1:
            from ..parallel import allreduce_sum_arrays
            q_sum, n_total = allreduce_sum_arrays([q_sum, np.float64(n_local)])
            n_total = float(n_total)
        else:
            n_total = float(n_local)
        bias_diff = fp_means[out] - q_sum / n_total
        bias_name = node.input[2]
        new_bias = graph_bc.get_initializer(bias_name) + bias_diff.astype(np.float32)
        graph_bc.set_initializer(bias_name, new_bias)
        q_provider.update_weight(bias_name, new_bias)
        q_provider.commit_past(out)


def _bc_full_replay(graph_bc, q_provider, bc_nodes, bc_outputs, fp_means):
    """Legacy O(nodes)-pass path (DIPOORLET_TPU_SEGMENTED=0): tap EVERY bc
    output in one compiled program per pass and re-run the full forward
    after each update."""
    for node in bc_nodes:
        logger.info("Update bias for node: %s", node.name)
        q_mean = q_provider.channel_mean(bc_outputs)[node.output[0]]
        bias_diff = fp_means[node.output[0]] - q_mean
        bias_name = node.input[2]
        new_bias = graph_bc.get_initializer(bias_name) + bias_diff.astype(np.float32)
        graph_bc.set_initializer(bias_name, new_bias)
        q_provider.update_weight(bias_name, new_bias)


def bias_correction(graph: GraphIR, act_clip_val, weight_clip_val, args):
    clip_val = act_clip_val.copy()
    clip_val.update(weight_clip_val)
    graph_bc = graph.clone()

    bc_nodes = [n for n in graph_bc.graph.node if n.op_type in BC_NODE_TYPES]
    # Pre-create biases so the quant graph / executor structure is stable.
    for node in bc_nodes:
        _ensure_bias(graph_bc, node)
    graph_bc.update_model()

    st, ed = shard_bounds(args)
    fp_provider = ActivationProvider(graph, args, st, ed)
    bc_outputs = [n.output[0] for n in bc_nodes]
    fp_means = fp_provider.channel_mean(bc_outputs)

    graph_q, _ = quant_graph(graph_bc, clip_val, args)
    q_provider = make_activation_provider(graph_q, args, st, ed)

    if isinstance(q_provider, SegmentedActivationProvider):
        _bc_segmented(graph_bc, q_provider, bc_nodes, fp_means, args)
    else:
        _bc_full_replay(graph_bc, q_provider, bc_nodes, bc_outputs, fp_means)

    import jax
    if jax.process_count() > 1:
        from ..parallel import assert_rank_identical
        assert_rank_identical(graph_bc, "bias_correction")
    graph_bc.update_model()
    if getattr(args, "rank", 0) == 0:
        graph_bc.save_onnx_model("update_bias_model")
    return graph_bc

"""AdaRound driver.

Behavioral port of /root/reference/dipoorlet/weight_transform/
adaround.py:19-116: per learnable layer (topo order), learn a rounding
mask against the FP32 layer output using the quantized-prefix input,
then hard-round the weight into both graphs (incremental reuse)."""
from __future__ import annotations


import numpy as np
import jax.numpy as jnp

from ..quant.quant_graph import quant_graph
from ..utils.logging import logger
from .common import (LEARNABLE_LAYER_TYPES, follow_relu,
                     make_activation_provider, mesh_sharding,
                     quantized_input_name, reconstruction_mesh,
                     reconstruction_plan, squeeze_batch_dim, stable_seed,
                     warn_if_shared_param, weight_qparams_for_node, wt_input_source)
from .reconstruct import LayerSpec, hard_round_weight, learn_block, node_signature
from .weight_equalization import node_has_equalized


def _build_layer_spec(graph, graph_src, node, clip_val, args, relu_flag, acti_qp=None):
    weight = graph_src.get_initializer(node.input[1]).astype(np.float32)
    bias = None
    if len(node.input) == 3:
        bias = jnp.asarray(graph_src.get_initializer(node.input[2]).astype(np.float32))
    transposed = node.op_type == "ConvTranspose"
    w_t = np.swapaxes(weight, 0, 1) if transposed else weight
    qp, per_channel = weight_qparams_for_node(node, clip_val, args)
    return LayerSpec(node_sig=node_signature(node), weight=jnp.asarray(w_t), bias=bias,
                     qp=qp, per_channel=per_channel, transposed=transposed,
                     relu=relu_flag, acti_qp=acti_qp)


def adaround(graph_ori, graph, act_clip_val, weight_clip_val, args):
    clip_val = act_clip_val.copy()
    clip_val.update(weight_clip_val)
    graph_ada = graph.clone()
    plan = reconstruction_plan(args)
    gmesh = reconstruction_mesh(args, plan)

    fp_provider = make_activation_provider(graph_ori, args, 0, args.data_num,
                                           indices=plan.indices)
    graph_q, _ = quant_graph(graph_ada, clip_val, args)
    q_provider = make_activation_provider(graph_q, args, 0, args.data_num,
                                          indices=plan.indices)

    for node in graph_ori.graph.node:
        if node.name in args.skip_layers:
            continue
        if node.op_type not in LEARNABLE_LAYER_TYPES:
            continue
        if args.we and node_has_equalized(graph, node):
            continue  # cannot mimic equalized layers (adaround.py:34-36)
        logger.info("Adaround for: %s", node.name)

        in_name = quantized_input_name(q_provider.graph,
                                       wt_input_source(graph_ada, node))
        q_in = q_provider.get(in_name)[in_name]
        relu_flag = follow_relu(graph, node)
        fp_out = fp_provider.get(node.output[0], relu=relu_flag)[node.output[0]]
        # squeeze the declared batch dim (adaround.py:128)
        q_in = squeeze_batch_dim(q_in)
        fp_out = squeeze_batch_dim(fp_out)

        spec = _build_layer_spec(graph_ada, graph_ada, node, clip_val, args, relu_flag)
        total_iter = int(args.ada_epoch * plan.n_batches)
        masks = learn_block([spec], q_in, fp_out, args.ada_bs, args.ada_epoch,
                            total_iter, acti_quant=False, drop=False,
                            seed=stable_seed(node.name, args),
                            data_sharding=mesh_sharding(args),
                            plan=plan, global_mesh=gmesh)
        new_weight = hard_round_weight(spec, masks[0])
        warn_if_shared_param(graph_ada, node.input[1], "adaround")
        graph_ada.set_initializer(node.input[1], new_weight)
        q_provider.update_weight(node.input[1], new_weight)

    for tag, p in (("fp", fp_provider), ("q", q_provider)):
        if hasattr(p, "sweep_equivalents"):
            logger.info("adaround %s activation replays: %.2f full-net forwards",
                        tag, p.sweep_equivalents())
    if getattr(args, "world_size", 1) > 1:
        from ..parallel import assert_rank_identical
        assert_rank_identical(graph_ada, "adaround")
    if getattr(args, "rank", 0) == 0 and graph_ada.output_dir:
        graph_ada.update_model()
        graph_ada.save_onnx_model("adaround")
    return graph_ada

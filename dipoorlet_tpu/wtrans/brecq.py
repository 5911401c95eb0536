"""BRECQ / QDrop driver.

Behavioral port of /root/reference/dipoorlet/weight_transform/
brecq.py:20-200: greedy blocks of <=3 learnable layers separated only by
ReLU, jointly optimized round masks with the loss at the block output;
QDrop (--drop) mixes quant/FP block inputs 50/50 per element and
fake-quants activations inside the block with drop ratio 0.5."""
from __future__ import annotations




from ..quant.quant_graph import quant_graph
from ..utils.logging import logger
from .adaround import _build_layer_spec
from .common import (LEARNABLE_LAYER_TYPES, acti_qparams_for_node,
                     follow_relu, get_block_from_first,
                     make_activation_provider, mesh_sharding,
                     quantized_input_name, reconstruction_mesh,
                     reconstruction_plan, sq_rescale_fp_input,
                     squeeze_batch_dim, stable_seed, warn_if_shared_param,
                     wt_input_source)
from .reconstruct import hard_round_weight, learn_block
from .weight_equalization import node_has_equalized


def brecq(graph_ori, graph, act_clip_val, weight_clip_val, args):
    clip_val = act_clip_val.copy()
    clip_val.update(weight_clip_val)
    graph_brecq = graph.clone()
    plan = reconstruction_plan(args)
    gmesh = reconstruction_mesh(args, plan)
    log_head = "Qdrop" if args.drop else "Brecq"

    fp_provider = make_activation_provider(graph_ori, args, 0, args.data_num,
                                           indices=plan.indices)
    graph_q, _ = quant_graph(graph_brecq, clip_val, args)
    q_provider = make_activation_provider(graph_q, args, 0, args.data_num,
                                          indices=plan.indices)

    already = set()
    for node in graph_ori.graph.node:
        if node.name in args.skip_layers:
            continue
        if node.op_type not in LEARNABLE_LAYER_TYPES or node.name in already:
            continue
        block = get_block_from_first(graph, node, args)
        if args.we and node_has_equalized(graph, block[-1]):
            block.pop(-1)  # equalized layer cannot end a block (brecq.py:38-41)
        if not block:
            continue
        logger.info("%s for: %s", log_head, " ".join(n.name for n in block))
        already.update(n.name for n in block)

        in_src = wt_input_source(graph_brecq, block[0])
        fp_src = block[0].input[0]
        in_name = quantized_input_name(q_provider.graph, in_src)
        q_in = q_provider.get(in_name)[in_name]
        fp_in = sq_rescale_fp_input(graph_brecq, fp_src, in_src,
                                    fp_provider.get(fp_src)[fp_src])
        out_relu = follow_relu(graph, block[-1])
        fp_out = fp_provider.get(block[-1].output[0], relu=out_relu)[block[-1].output[0]]
        q_in = squeeze_batch_dim(q_in)
        fp_in = squeeze_batch_dim(fp_in)
        fp_out = squeeze_batch_dim(fp_out)

        specs = []
        for _node in block:
            relu_flag = follow_relu(graph, _node)
            acti_qp = acti_qparams_for_node(graph, _node, clip_val, args)
            specs.append(_build_layer_spec(graph_brecq, graph_brecq, _node, clip_val,
                                           args, relu_flag, acti_qp=acti_qp))

        max_epoch = args.ada_epoch * len(block)
        total_iter = int(max_epoch * plan.n_batches)
        masks = learn_block(specs, q_in, fp_out, args.ada_bs, max_epoch, total_iter,
                            acti_quant=bool(getattr(args, "acti_quant", args.drop)),
                            drop=bool(args.drop), fp_in=fp_in,
                            seed=stable_seed(block[0].name, args),
                            data_sharding=mesh_sharding(args),
                            plan=plan, global_mesh=gmesh)

        for spec, mask, _node in zip(specs, masks, block):
            new_weight = hard_round_weight(spec, mask)
            warn_if_shared_param(graph_brecq, _node.input[1], "brecq")
            graph_brecq.set_initializer(_node.input[1], new_weight)
            q_provider.update_weight(_node.input[1], new_weight)

    for tag, p in (("fp", fp_provider), ("q", q_provider)):
        if hasattr(p, "sweep_equivalents"):
            logger.info("brecq %s activation replays: %.2f full-net forwards",
                        tag, p.sweep_equivalents())
    if getattr(args, "world_size", 1) > 1:
        from ..parallel import assert_rank_identical
        assert_rank_identical(graph_brecq, "brecq")
    if getattr(args, "rank", 0) == 0 and graph_brecq.output_dir:
        graph_brecq.update_model()
        graph_brecq.save_onnx_model("brecq")
    return graph_brecq

"""Weight transforms & reconstruction finetuning.

Sequencing parity with /root/reference/dipoorlet/weight_transform/
weight_trans_base.py:15-68: BC -> WE -> BN-update (each followed by the
required re-calibration) -> AdaRound | BRECQ(/QDrop) | sparse-quant.

Multi-host invariant ("model/args/clip_val identical on every GPU",
weight_trans_base.py:16-18): clip values are collectively merged after
every (re-)calibration, BC/BN statistics are reduced across processes,
and reconstruction trains ONE SPMD program over a global mesh spanning
all processes (ShardPlan + learn_block global assembly) so every rank
learns identical masks from ALL shards — enforced after each transform by
parallel.assert_rank_identical (crc32 allgather), where the reference
runs rank 0 + filesystem broadcast and DDP gradient allreduce."""
from __future__ import annotations

from ..utils.logging import logger
from ..utils.serialization import load_clip_val, save_clip_val, update_model_path
from .adaround import adaround  # noqa: F401
from .bias_correction import bias_correction  # noqa: F401
from .brecq import brecq  # noqa: F401
from .common import LEARNABLE_LAYER_TYPES, follow_relu, get_block_from_first  # noqa: F401
from .smooth_quant import smooth_quant  # noqa: F401
from .sparse import sparse_quant  # noqa: F401
from .update_bn import update_bn  # noqa: F401
from .weight_equalization import node_has_equalized, weight_equalization  # noqa: F401


def _recalibrate(graph, args):
    """Re-run tensor calibration after a weight transform, merging the
    per-process shard clip values over collectives under multi-host —
    without this the re-calibrated ranges diverge per rank and every
    later phase inherits the divergence (the reference re-reads the
    rank-merged files instead, weight_trans_base.py:40-52)."""
    from ..calib import tensor_calibration
    act, w = tensor_calibration(graph, args)
    if getattr(args, "world_size", 1) > 1:
        from ..parallel import reduce_clip_val_collective
        act = reduce_clip_val_collective(act, args.act_quant)
    return act, w


def weight_calibration(onnx_graph, act_clip_val, weight_clip_val, args):
    from ..calib import find_clip_val_minmax_weight

    graph_after_wt = onnx_graph.clone()

    if getattr(args, "smooth_quant", False):
        graph_after_wt = smooth_quant(graph_after_wt, args)
        update_model_path("smooth_quant_model", args)
        logger.info("Re calibration...")
        act_clip_val, weight_clip_val = _recalibrate(graph_after_wt, args)

    if args.bc:
        graph_after_wt = bias_correction(graph_after_wt, act_clip_val, weight_clip_val, args)
        update_model_path("update_bias_model", args)
        weight_clip_val = find_clip_val_minmax_weight(graph_after_wt, args)

    if args.we:
        graph_after_wt = weight_equalization(graph_after_wt, args)
        update_model_path("weight_equal_model", args)
        act_clip_val, weight_clip_val = _recalibrate(graph_after_wt, args)

    if args.update_bn:
        graph_after_wt = update_bn(graph_after_wt, act_clip_val, weight_clip_val, args)
        update_model_path("update_bn_model", args)
        logger.info("Re calibration...")
        act_clip_val, weight_clip_val = _recalibrate(graph_after_wt, args)
        if getattr(args, "rank", 0) == 0:
            save_clip_val(dict(act_clip_val), dict(weight_clip_val), args)

    if not args.sparse:
        if args.adaround:
            args.acti_quant = False
            graph_after_wt = adaround(onnx_graph, graph_after_wt, act_clip_val,
                                      weight_clip_val, args)
        if args.brecq:
            args.acti_quant = bool(args.drop)
            graph_after_wt = brecq(onnx_graph, graph_after_wt, act_clip_val,
                                   weight_clip_val, args)
    else:
        graph_after_wt = sparse_quant(onnx_graph, graph_after_wt, act_clip_val,
                                      weight_clip_val, args)

    return graph_after_wt, onnx_graph, act_clip_val, weight_clip_val

"""Clip-value algorithms: minmax / hist(percentile) / mse(OCTAV).

Aggregation semantics are an exact behavioral port of
/root/reference/dipoorlet/tensor_cali/basic_algorithm.py:13-91 —
per-sample statistics then the reference's exact reductions, so accuracy
deltas reproduce."""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..quant.platform import LAYER_HAS_WEIGHT, platform_setting_table
from ..runtime.data import CalibDataset
from ..runtime.executor import Executor
from ..utils.dispatch import Registry
from ..utils.logging import logger
from .stats import StatsRunner


def _unknown_algorithm(*args, **kwargs):
    raise ValueError("Calibration Algorithm Not Found!")


tensor_cali_dispatcher = Registry("act-calibration", missing=_unknown_algorithm)


def _shard_bounds(args):
    rank = getattr(args, "rank", 0)
    world = getattr(args, "world_size", 1)
    per = args.data_num // world
    st = rank * per
    ed = min((rank + 1) * per, args.data_num)
    return st, ed


def _runner(graph, args):
    ex = Executor(graph)
    params = ex.init_params()
    dataset = CalibDataset(args.input_dir, ex.input_shapes(), args.data_num)
    compute_dtype = None
    if getattr(args, "bf16_calib", False):
        import jax.numpy as jnp
        compute_dtype = jnp.bfloat16
    # production multi-chip: batches shard over the CLI-built 'data' mesh
    # (the reference's per-GPU DP, forward_net.py:207-209, as SPMD)
    runner = StatsRunner(ex, mesh=getattr(args, "mesh", None),
                         compute_dtype=compute_dtype,
                         tap_chunk=getattr(args, "stats_chunk", 0) or None)
    return runner, params, dataset


@tensor_cali_dispatcher.add("minmax")
def find_clip_val_minmax(graph, args, **kwargs):
    runner, params, dataset = _runner(graph, args)
    st, ed = _shard_bounds(args)
    stats = runner.run_minmax(params, dataset, batch_size=args.batch_size, start=st, end=ed)
    return {name: [np.float64(v["min"]), np.float64(v["max"])] for name, v in stats.items()}


@tensor_cali_dispatcher.add("hist")
def find_clip_val_hist(graph, args, store_stats=None, **kwargs):
    bins = int(args.bins)
    st, ed = _shard_bounds(args)
    if store_stats:
        stats_min_max = store_stats["minmax"]
        hists = store_stats["hist"]
    else:
        runner, params, dataset = _runner(graph, args)
        stats_min_max, hists = runner.run_minmax_hist(
            params, dataset, bins, batch_size=args.batch_size, start=st, end=ed)
    clip_val = {}
    for name, hist in hists.items():
        obs_min = stats_min_max[name]["min"]
        obs_max = stats_min_max[name]["max"]
        data_max = max(-obs_min, obs_max)
        total = hist.sum()
        if total > 0:
            cdf = np.cumsum(hist.astype(np.float64)) / total
            # first bin where cumulative mass >= threshold (basic_algorithm.py:43-50)
            hit = np.argmax(cdf >= args.threshold)
            if cdf[hit] >= args.threshold:
                clip_value = (hit + 0.5) * (data_max / bins)
                clip_val[name] = [np.float64(max(-clip_value, obs_min)),
                                  np.float64(min(clip_value, obs_max))]
        if name not in clip_val:
            clip_val[name] = [np.float64(obs_min), np.float64(obs_max)]
    return clip_val


@tensor_cali_dispatcher.add("kl")
def find_clip_val_kl(graph, args, **kwargs):
    """TensorRT-style entropy calibration over the on-device histograms.

    The target quantization grid follows the *effective* activation bit
    width (--a_bit override included): 2^(b-1) levels for the symmetric
    positive half of the |x| histogram — int8 optimizes 128 levels, int4
    optimizes 8 (TRT entropy-method semantics)."""
    from ..quant.platform import effective_setting
    from .kl import find_clip_val_kl_from_hists
    bins = int(args.bins)
    a_bit = int(effective_setting(args)["qi_params"]["bit_width"])
    target_levels = max(2, 2 ** (a_bit - 1))
    if target_levels >= bins:
        raise ValueError(
            f"KL calibration needs bins > 2^(a_bit-1) levels "
            f"(bins={bins}, a_bit={a_bit}); raise --bins")
    st, ed = _shard_bounds(args)
    runner, params, dataset = _runner(graph, args)
    stats_min_max, hists = runner.run_minmax_hist(
        params, dataset, bins, batch_size=args.batch_size, start=st, end=ed)
    return find_clip_val_kl_from_hists(hists, stats_min_max, bins,
                                       target_levels=target_levels)


@tensor_cali_dispatcher.add("mse")
def find_clip_val_octav(graph, args, **kwargs):
    runner, params, dataset = _runner(graph, args)
    st, ed = _shard_bounds(args)
    dynamic_sym = "dynamic_sym" in platform_setting_table[args.deploy]["qi_params"]
    stats = runner.run_octav(params, dataset, dynamic_sym,
                             batch_size=args.batch_size, start=st, end=ed)
    clip_val = {}
    for name, v in stats.items():
        s_mean = v["s_sum"] / max(v["count"], 1)
        clip_val[name] = [np.float64(max(v["min"], -s_mean)),
                          np.float64(min(v["max"], s_mean))]
    return clip_val


def find_clip_val_minmax_weight(graph, args) -> Dict[str, list]:
    """Per-output-channel weight ranges (basic_algorithm.py:72-91)."""
    weight_tensor = {}
    need_transpose = set()
    for node in graph.graph.node:
        if node.op_type in LAYER_HAS_WEIGHT:
            for in_tensor in node.input[1:]:
                if in_tensor in graph.initializer:
                    weight_tensor[in_tensor] = graph.get_initializer(in_tensor)
            if node.op_type == "ConvTranspose":
                need_transpose.add(node.input[1])
    weight_clip_val = {}
    for name, tensor in weight_tensor.items():
        if tensor.ndim < 1:
            continue  # BN tracked scalars have no shape
        if name in need_transpose:
            tensor = tensor.transpose([1, 0] + list(range(2, tensor.ndim)))
        c = tensor.shape[0]
        flat = tensor.reshape(c, -1)
        weight_clip_val[name] = [flat.min(-1), flat.max(-1)]
    return weight_clip_val


def tensor_calibration(graph, args):
    """Entry point (tensor_cali_base.py:4-7): weights always minmax
    per-channel; activation algorithm selected by args.act_quant."""
    weight_clip_val = find_clip_val_minmax_weight(graph, args)
    logger.info("Activation calibration: %s", args.act_quant)
    act_clip_val = tensor_cali_dispatcher(args.act_quant, graph, args)
    return act_clip_val, weight_clip_val

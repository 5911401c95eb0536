"""Quantization-error profiling.

Behavioral parity with /root/reference/dipoorlet/profiling.py:34-264:
per-quant-node cosine similarity between the FP32 and fake-quant
forwards, model-output avg/min cosine ("single" small outputs are
concatenated across samples first), worst-10 report, range dump, and the
per-channel-benefit advisory.

TPU-first: both forwards run inside ONE jitted program per batch and the
cosine sufficient statistics (dot, |a|^2, |b|^2) are reduced on device —
activations never hit the host (the reference materializes every tensor
for both nets per sample, profiling.py:56-58)."""
from __future__ import annotations

import heapq
import math
import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from .graph.graph import GraphIR
from .quant.platform import platform_setting_table
from .quant.quant_graph import DQ_SUFFIX, quant_graph
from .runtime.data import CalibDataset
from .runtime.executor import Executor
from .utils.logging import logger


def cos_similarity(ta, tb):
    ta = np.asarray(ta, dtype=np.float64).ravel()
    tb = np.asarray(tb, dtype=np.float64).ravel()
    dot = np.sum(ta * tb)
    if dot == 0:
        return 0.0
    return dot / np.sqrt(np.square(ta).sum()) / np.sqrt(np.square(tb).sum())


def _cos_from_stats(dot, na, nb):
    # na/nb can underflow to exactly 0 while the cross-term doesn't (f32
    # accumulation of denormal-scale tensors), and non-finite stats reach
    # here when a model overflows its own activations — degenerate either
    # way, cosine 0
    if dot == 0 or na <= 0 or nb <= 0 \
            or not (math.isfinite(dot) and math.isfinite(na) and math.isfinite(nb)):
        return 0.0
    return dot / math.sqrt(na) / math.sqrt(nb)


def _snr_db_from_stats(dot, na, nb):
    """SNR(dB) of quantized vs fp: 10*log10(|a|^2 / |a-b|^2), from the same
    sufficient statistics (|a-b|^2 = na + nb - 2*dot)."""
    if not (math.isfinite(dot) and math.isfinite(na) and math.isfinite(nb)):
        return 0.0
    noise = max(na + nb - 2.0 * dot, 0.0)
    if noise <= 0:
        return float("inf")
    if na <= 0:
        return 0.0
    return 10.0 * math.log10(na / noise)


def get_output_single_map(graph: GraphIR):
    single = {}
    for out in graph.network_outputs:
        shape = graph.get_tensor_shape(out)
        single[out] = bool(np.prod(shape[1:]) <= 10)
    return single


def quantize_profiling_multipass(graph_after_wt: GraphIR, graph_ori: GraphIR,
                                 act_clip_val, weight_clip_val, args):
    """Returns (layer_cosine_dict, model_cosine_dict, quant_node_list)."""
    clip_val = act_clip_val.copy()
    clip_val.update(weight_clip_val)
    graph_q, quant_node_list = quant_graph(graph_after_wt, clip_val, args)

    rank = getattr(args, "rank", 0)
    if rank == 0 and graph_q.output_dir:
        graph_q.save_onnx_model(name="quant_model")

    fp_ex = Executor(graph_ori)
    q_ex = Executor(graph_q)
    # upload weights ONCE: passing numpy dicts into the per-batch jitted
    # calls would re-send ~2x model bytes over the device link every batch
    fp_params = jax.device_put(fp_ex.init_params())
    q_params = jax.device_put(q_ex.init_params())

    # tensors to compare (same names exist in both graphs — QDQ nodes rename
    # only consumers' inputs)
    prof_tensors = []
    skip_layer = getattr(args, "skip_prof_layer", False)
    if not skip_layer:
        for node in quant_node_list:
            for out in node.output:
                if out:
                    prof_tensors.append(out)
    single = get_output_single_map(graph_after_wt)
    out_map = {}
    q_tensor_names = set(q_ex.all_tensor_names())
    for name in graph_after_wt.network_outputs:
        out_map[name] = name + DQ_SUFFIX if name + DQ_SUFFIX in q_tensor_names else name

    out_names = [n for n in out_map if not single[n]]
    raw_names = [n for n in out_map if single[n]]

    def profile_one(fp_p, q_p, inputs):
        _, fp_taps = fp_ex.forward(fp_p, inputs, taps=prof_tensors + list(out_map), outputs=())
        _, q_taps = q_ex.forward(q_p, inputs, taps=prof_tensors + list(out_map.values()), outputs=())

        def cos_stats(names, q_name_fn):
            rows = []
            for name in names:
                a = fp_taps[name].astype(jnp.float32).ravel()
                b = q_taps[q_name_fn(name)].astype(jnp.float32).ravel()
                rows.append(jnp.stack([jnp.vdot(a, b), jnp.vdot(a, a), jnp.vdot(b, b)]))
            return jnp.stack(rows) if rows else jnp.zeros((0, 3))

        layer_stats = cos_stats(prof_tensors, lambda n: n)      # (L, 3)
        out_stats = cos_stats(out_names, lambda n: out_map[n])  # (O, 3)
        out_raw = {name: (fp_taps[name], q_taps[out_map[name]]) for name in raw_names}
        return layer_stats, out_stats, out_raw

    batched = jax.jit(jax.vmap(profile_one, in_axes=(None, None, 0)))

    dataset = CalibDataset(args.input_dir, fp_ex.input_shapes(), args.data_num)
    world = getattr(args, "world_size", 1)
    rank_data_size = math.ceil(args.data_num / world)
    rank_st = rank * rank_data_size
    rank_ed = min(rank_st + rank_data_size, args.data_num)
    rank_data_size = rank_ed - rank_st

    # savefp dump forward, compiled once (outputs not in raw_acc)
    _savefp_fns: Dict[str, object] = {}

    def _savefp_fn(name):
        if name not in _savefp_fns:
            _savefp_fns[name] = jax.jit(jax.vmap(
                lambda p, x: fp_ex.forward(p, x, outputs=[name])[0],
                in_axes=(None, 0)))
        return _savefp_fns[name]

    layer_cos_sum: Dict[str, float] = {n: 0.0 for n in prof_tensors}
    layer_snr_sum: Dict[str, float] = {n: 0.0 for n in prof_tensors}
    model_cos: Dict[str, list] = {}
    raw_acc: Dict[str, list] = {name: [] for name in out_map if single[name]}
    fp_out_dump: Dict[str, list] = {}

    bs = getattr(args, "batch_size", 16)
    mesh = getattr(args, "mesh", None)
    sample_idx = rank_st
    for idx in dataset.iter_batches(bs, rank_st, rank_ed):
        batch = dataset.load_batch(idx)
        if mesh is not None and len(idx) % mesh.devices.size == 0:
            from .parallel import shard_batch
            batch = shard_batch(batch, mesh)
        layer_stats, out_stats, out_raw = jax.device_get(batched(fp_params, q_params, batch))
        nb = len(idx)
        # layer_stats: (B, L, 3); out_stats: (B, O, 3)
        for li, name in enumerate(prof_tensors):
            for i in range(nb):
                dot, na, nb_ = layer_stats[i, li]
                layer_cos_sum[name] += _cos_from_stats(float(dot), float(na), float(nb_))
                layer_snr_sum[name] += _snr_db_from_stats(float(dot), float(na), float(nb_))
        for oi, name in enumerate(out_names):
            for i in range(nb):
                dot, na, nb_ = out_stats[i, oi]
                c = _cos_from_stats(float(dot), float(na), float(nb_))
                if name not in model_cos:
                    model_cos[name] = [c, c]
                else:
                    model_cos[name][0] += c
                    model_cos[name][1] = min(model_cos[name][1], c)
        for name in raw_acc:
            a, b = out_raw[name]
            raw_acc[name].append((np.asarray(a), np.asarray(b)))
        if getattr(args, "savefp", False) and rank == 0:
            for name in out_map:
                save_path = os.path.join(args.output_dir, "output", name)
                os.makedirs(save_path, exist_ok=True)
                if name in raw_acc:
                    fp_batch = raw_acc[name][-1][0]
                else:
                    # re-fetch fp outputs for dumping
                    fp_out, _ = _savefp_fn(name)(fp_params, batch)
                    fp_batch = np.asarray(fp_out[name])
                for i in range(nb):
                    fp_batch[i].astype(np.float32).tofile(
                        os.path.join(save_path, f"onnx-output-{idx[i]}.bin"))
        sample_idx += nb

    layer_cosine_dict = {k: v / rank_data_size for k, v in layer_cos_sum.items()}
    if rank == 0 and getattr(args, "output_dir", None):
        import json
        with open(os.path.join(args.output_dir, "layer_snr.json"), "w") as f:
            json.dump({k: v / rank_data_size for k, v in layer_snr_sum.items()},
                      f, indent=4)
    model_cosine_dict = {}
    for name in out_map:
        if single[name]:
            fp_all = np.concatenate([a for a, _ in raw_acc[name]], axis=0)
            q_all = np.concatenate([b for _, b in raw_acc[name]], axis=0)
            c = cos_similarity(q_all, fp_all)
            model_cosine_dict[name] = [c, c]
        else:
            model_cosine_dict[name] = [model_cos[name][0] / rank_data_size, model_cos[name][1]]
    return layer_cosine_dict, model_cosine_dict, quant_node_list


# transformer-path variant keeps the same semantics (model outputs only)
def quantize_profiling_transformer(graph_after_wt, graph_ori, act_clip_val,
                                   weight_clip_val, args):
    args.skip_prof_layer = True
    return quantize_profiling_multipass(graph_after_wt, graph_ori, act_clip_val,
                                        weight_clip_val, args)


def show_model_profiling_res(graph_after_wt, layer_cosine_dict, model_cosine_dict,
                             quant_node_list, args):
    quant_heapq = []
    single = get_output_single_map(graph_after_wt)
    if not getattr(args, "skip_prof_layer", False):
        for node in quant_node_list:
            logger.info(node.name)
            for out_tensor in node.output:
                if out_tensor not in layer_cosine_dict:
                    continue
                logger.info("Layer  cos: {:.5f}".format(layer_cosine_dict[out_tensor]))
                heapq.heappush(quant_heapq,
                               (layer_cosine_dict[out_tensor], node.name + "-" + out_tensor))
        logger.info("The smallest cos value of 10 layers: ")
        for cos, name in heapq.nsmallest(10, quant_heapq):
            logger.info("{:40} cos : {:<.5f}".format(name, cos))
    logger.info("Quant model output cos: ")
    for name in graph_after_wt.network_outputs:
        if not single[name]:
            logger.info("{:40} avgcos : {:<.5f}    mincos : {:<.5f}".format(
                name, model_cosine_dict[name][0], model_cosine_dict[name][1]))
        else:
            logger.info("{:40} tolcos : {:<.5f}".format(name, model_cosine_dict[name][0]))


def show_model_ranges(graph, act_clip_val, weight_clip_val, args):
    logger.info("Model ranges:")
    ranges_all = act_clip_val.copy()
    ranges_all.update(weight_clip_val)
    qw = platform_setting_table[args.deploy]["qw_params"]
    for name, rng in ranges_all.items():
        try:
            shape = graph.get_tensor_shape(name)
        except KeyError:
            continue
        if isinstance(rng[0], np.ndarray) and rng[0].ndim > 0:
            pc = "per channel " if qw.get("per_channel") else ""
            logger.info("{:<30} Shape: {:<20} Range: {}[{:<10f} {:<10f}]".format(
                name, str(shape), pc, float(rng[0].min()), float(rng[1].max())))
        else:
            logger.info("{:<30} Shape: {:<20} Range: [{:<10f} {:<10f}]".format(
                name, str(shape), float(rng[0]), float(rng[1])))


def weight_need_perchannel(graph, args):
    """Advisory: layers hurt most by per-layer weight quant (profiling.py:227-243)."""
    qw = platform_setting_table[args.deploy]["qw_params"]
    if qw.get("per_channel"):
        return
    logger.info("Layer degradate by per layer: ")
    heap = []
    for node in graph.graph.node:
        if node.op_type == "Conv":
            weight = graph.get_initializer(node.input[1])
            c = weight.shape[0]
            flat = weight.reshape(c, -1)
            per_channel_range = flat.max(-1) - flat.min(-1)
            per_layer_range = weight.max() - weight.min()
            heapq.heappush(heap, (float(per_channel_range.mean() / per_layer_range), node.name))
    for ratio, name in heapq.nsmallest(len(heap), heap):
        logger.info("{:40} ratio : {:<.5f}".format(name, ratio))

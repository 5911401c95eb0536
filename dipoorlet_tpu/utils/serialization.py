"""Clip-value & profiling-result persistence and multi-shard reduction.

File format parity with the reference (utils.py:313-412): JSON dicts
name -> [min, max].  Reduction semantics: elementwise min/max for minmax
calibration, arithmetic shard-mean for hist/mse clip values and for
layer cosines; min for model min-cosine.

In SPMD runs these reductions happen on-device via collectives
(parallel/mesh.py); the file path remains for artifact parity and
for multi-process launches without a shared device mesh."""
from __future__ import annotations

import json
import os

import numpy as np

from ..quant.platform import platform_setting_table


def _listify(v):
    return v.tolist() if isinstance(v, np.ndarray) else (
        float(v) if isinstance(v, (np.floating, np.integer)) else v)


def save_clip_val(act_clip_val, weight_clip_val, args,
                  act_fname="act_clip_val.json", weight_fname="weight_clip_val.json"):
    act = {k: [_listify(v[0]), _listify(v[1])] for k, v in act_clip_val.items()}
    wt = {k: [_listify(v[0]), _listify(v[1])] for k, v in weight_clip_val.items()}
    with open(os.path.join(args.output_dir, act_fname), "w") as f:
        json.dump(act, f, indent=4)
    with open(os.path.join(args.output_dir, weight_fname), "w") as f:
        json.dump(wt, f, indent=4)


def load_clip_val(args, act_fname="act_clip_val.json", weight_fname="weight_clip_val.json"):
    with open(os.path.join(args.output_dir, act_fname)) as f:
        act_clip_val = json.load(f)
    for k, v in act_clip_val.items():
        act_clip_val[k] = [np.float64(v[0]), np.float64(v[1])]
    per_channel = platform_setting_table[args.deploy]["qw_params"].get("per_channel", False)
    with open(os.path.join(args.output_dir, weight_fname)) as f:
        weight_clip_val = json.load(f)
    for k, v in weight_clip_val.items():
        if per_channel:
            weight_clip_val[k] = [np.array(v[0]), np.array(v[1])]
        else:
            weight_clip_val[k] = [np.float64(np.min(v[0])) if isinstance(v[0], list) else np.float64(v[0]),
                                  np.float64(np.max(v[1])) if isinstance(v[1], list) else np.float64(v[1])]
    return act_clip_val, weight_clip_val


def reduce_clip_val(rank_size, args, act_fname="act_clip_val.json", weight_fname="weight_clip_val.json"):
    """Rank-file merge (utils.py:326-345): weight ranges from rank 0;
    activations merged as min/max (minmax) or shard-mean (hist/mse)."""
    act_clip_val, weight_clip_val = load_clip_val(
        args, act_fname + ".rank0", weight_fname + ".rank0")
    if args.act_quant != "minmax":
        for k, v in act_clip_val.items():
            v[0] /= float(rank_size)
            v[1] /= float(rank_size)
    for i in range(1, rank_size):
        with open(os.path.join(args.output_dir, act_fname + f".rank{i}")) as f:
            other = json.load(f)
        for k, v in other.items():
            if args.act_quant != "minmax":
                act_clip_val[k][0] += v[0] / float(rank_size)
                act_clip_val[k][1] += v[1] / float(rank_size)
            else:
                act_clip_val[k] = [np.float64(min(v[0], act_clip_val[k][0])),
                                   np.float64(max(v[1], act_clip_val[k][1]))]
    save_clip_val(act_clip_val, weight_clip_val, args, act_fname, weight_fname)


def save_profiling_res(layer_cosine_dict, model_cosine_dict, args, rank=0,
                       layer_res_fname="layer_res.json", model_res_fname="model_res.json"):
    layer = {k: float(v) for k, v in layer_cosine_dict.items()}
    model = {k: [float(v[0]), float(v[1])] for k, v in model_cosine_dict.items()}
    if layer:
        with open(os.path.join(args.output_dir, layer_res_fname + f".rank{rank}"), "w") as f:
            json.dump(layer, f, indent=4)
    with open(os.path.join(args.output_dir, model_res_fname + f".rank{rank}"), "w") as f:
        json.dump(model, f, indent=4)


def reduce_profiling_res(rank_size, args, layer_res_fname="layer_res.json",
                         model_res_fname="model_res.json"):
    """Shard-mean of layer/model avg-cosines; min of model min-cosine
    (utils.py:386-412)."""
    layer_path = os.path.join(args.output_dir, layer_res_fname + ".rank0")
    if os.path.exists(layer_path) and getattr(args, "model_type", None) is None:
        with open(layer_path) as f:
            layer_cosine_dict = json.load(f)
        layer_cosine_dict = {k: v / float(rank_size) for k, v in layer_cosine_dict.items()}
        for i in range(1, rank_size):
            with open(os.path.join(args.output_dir, layer_res_fname + f".rank{i}")) as f:
                other = json.load(f)
            for k, v in other.items():
                layer_cosine_dict[k] += v / float(rank_size)
    else:
        layer_cosine_dict = {}
    with open(os.path.join(args.output_dir, model_res_fname + ".rank0")) as f:
        model_cosine_dict = json.load(f)
    for k, v in model_cosine_dict.items():
        model_cosine_dict[k][0] = v[0] / float(rank_size)
    for i in range(1, rank_size):
        with open(os.path.join(args.output_dir, model_res_fname + f".rank{i}")) as f:
            other = json.load(f)
        for k, v in other.items():
            model_cosine_dict[k][0] += v[0] / float(rank_size)
            model_cosine_dict[k][1] = min(model_cosine_dict[k][1], v[1])
    return layer_cosine_dict, model_cosine_dict


def update_model_path(name, args):
    args.model = os.path.join(args.output_dir, f"{name}.onnx")

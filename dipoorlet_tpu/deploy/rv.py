"""RV1126 / RK3568 quant-param emitters (parity: deploy/deploy_rv.py:23-178).

Two output formats:
  * RV1126: asymmetric-affine yaml+json with u8 scale/zero_point per tensor,
    i32 bias with scale = w_scale * act_scale;
  * RK3568: per-tensor min/max json/yaml.
Both propagate Concat output ranges to inputs, skip Sigmoid-fed tensors,
and merge ReLU (and CaffeBatchNorm+CaffeScale) ranges upstream."""
import json
import os.path as osp

import numpy as np
import yaml

from . import deploy_dispatcher
from ..graph.graph import INPUT_TOKEN, OUTPUT_TOKEN
from ..quant.platform import LAYER_HAS_WEIGHT


def step_zeropoint(clip):
    range_min = min(0.0, float(np.min(clip[0])))
    range_max = max(0.0, float(np.max(clip[1])))
    step = (range_max - range_min) / 255.0
    if step == 0.0:
        step = 1.0 / 255.0
    zero_point = round(-range_min / step)
    return {"scale": [float(step)], "zero_point": [int(zero_point)]}


def _propagate_concat(graph, clip_val):
    for node in graph.graph.node:
        if node.op_type == "Concat":
            for input_tensor in node.input:
                clip_val[input_tensor][0] = clip_val[node.output[0]][0]
                clip_val[input_tensor][1] = clip_val[node.output[0]][1]


def _feeds_sigmoid(graph, node):
    nxt = graph.get_tensor_consumer(node.output[0])
    return len(nxt) == 1 and nxt[0] not in (INPUT_TOKEN, OUTPUT_TOKEN) \
        and not isinstance(nxt[0], str) and nxt[0].op_type == "Sigmoid"


def _gen1126(graph, clip_val, args):
    res = {"customized_quantize_layers": {}, "quantize_parameters": {}}
    qp = res["quantize_parameters"]
    _propagate_concat(graph, clip_val)
    for i in graph.network_inputs:
        entry = {
            "dtype": "asymmetric_affine",
            "method": "layer",
            "max_value": [max(0.0, float(np.max(clip_val[i][1])))],
            "min_value": [min(0.0, float(np.min(clip_val[i][0])))],
            "qtype": "u8",
        }
        entry.update(step_zeropoint(clip_val[i]))
        qp[f"@{i}:out0"] = entry
    for node in graph.graph.node:
        if _feeds_sigmoid(graph, node):
            continue  # Sigmoid input keeps its fixed -6.3..6.3 range
        if node.op_type in LAYER_HAS_WEIGHT:
            for idx, input_tensor in enumerate(node.input[1:]):
                if idx == 0:
                    entry = {
                        "dtype": "asymmetric_affine",
                        "method": "layer",
                        "max_value": [max(0.0, float(np.max(clip_val[input_tensor][1])))],
                        "min_value": [min(0.0, float(np.min(clip_val[input_tensor][0])))],
                        "qtype": "u8",
                    }
                    entry.update(step_zeropoint(clip_val[input_tensor]))
                    qp[f"@{node.name}:weight"] = entry
                elif idx == 1:
                    acts = step_zeropoint(clip_val[node.input[0]])["scale"]
                    ws = step_zeropoint(clip_val[node.input[1]])["scale"]
                    qp[f"@{node.name}:bias"] = {
                        "dtype": "asymmetric_affine",
                        "method": "layer",
                        "max_value": [],
                        "min_value": [],
                        "zero_point": [0],
                        "scale": [ws[0] * acts[0]],
                        "qtype": "i32",
                    }
        last_key = None
        for idx, output_tensor in enumerate(node.output):
            entry = {
                "dtype": "asymmetric_affine",
                "method": "layer",
                "max_value": [max(0.0, float(np.max(clip_val[output_tensor][1])))],
                "min_value": [min(0.0, float(np.min(clip_val[output_tensor][0])))],
                "qtype": "u8",
            }
            entry.update(step_zeropoint(clip_val[output_tensor]))
            last_key = f"@{node.name}:out{idx}"
            qp[last_key] = entry
        if node.op_type == "Relu":
            prev_node = graph.get_tensor_producer(node.input[0])
            if prev_node != INPUT_TOKEN:
                for prev_key in list(qp):
                    if prev_node.name in prev_key and "out" in prev_key:
                        qp[prev_key] = qp[last_key]
        # Caffe-origin graphs split BN into CaffeBatchNorm -> CaffeScale; the
        # runtime fuses them, so the BN output inherits the Scale output's
        # range and the Scale entry disappears (ref deploy_rv.py:99-106).
        if node.op_type == "CaffeScale":
            prev_node = graph.get_tensor_producer(node.input[0])
            if prev_node != INPUT_TOKEN and not isinstance(prev_node, str) \
                    and prev_node.op_type == "CaffeBatchNorm":
                for prev_key in list(qp):
                    if prev_node.name in prev_key and "out" in prev_key:
                        qp[prev_key] = qp[last_key]
                del qp[last_key]
    with open(osp.join(args.output_dir, "rv_quantized_param.yaml"), "w") as f:
        f.write(yaml.dump(res))
    with open(osp.join(args.output_dir, "rv_quantized_param.json"), "w") as f:
        json.dump(res, f, indent=4)


def _gen3568(graph, clip_val, args):
    res = {"custom_quantize_layers": {}, "quantize_parameters": {}}
    qp = res["quantize_parameters"]
    _propagate_concat(graph, clip_val)
    for i in graph.network_inputs:
        qp[i] = {
            "max": [max(0.0, float(np.max(clip_val[i][1])))],
            "min": [min(0.0, float(np.min(clip_val[i][0])))],
        }
    for node in graph.graph.node:
        if _feeds_sigmoid(graph, node):
            continue
        if node.op_type in LAYER_HAS_WEIGHT:
            for idx, input_tensor in enumerate(node.input[1:]):
                if idx == 0:
                    qp[f"{node.name}_W"] = {
                        "max": [max(0.0, float(np.max(clip_val[input_tensor][1])))],
                        "min": [min(0.0, float(np.min(clip_val[input_tensor][0])))],
                    }
                elif idx == 1:
                    amax = max(abs(float(np.max(clip_val[node.input[2]][1]))),
                               abs(float(np.min(clip_val[node.input[2]][0]))))
                    qp[f"{node.name}_b"] = {"max": [amax], "min": [-amax]}
        last_key = None
        for output_tensor in node.output:
            qp[output_tensor] = {
                "max": [max(0.0, float(np.max(clip_val[output_tensor][1])))],
                "min": [min(0.0, float(np.min(clip_val[output_tensor][0])))],
            }
            last_key = output_tensor
        if node.op_type == "Relu":
            qp[node.input[0]] = qp[last_key]
        if node.op_type == "CaffeScale":
            prev_node = graph.get_tensor_producer(node.input[0])
            if prev_node != INPUT_TOKEN and not isinstance(prev_node, str) \
                    and prev_node.op_type == "CaffeBatchNorm":
                qp[node.input[0]] = qp[last_key]
                del qp[last_key]
    with open(osp.join(args.output_dir, "rk_quantized_param.yaml"), "w") as f:
        f.write(yaml.dump(res))
    with open(osp.join(args.output_dir, "rk_quantized_param.json"), "w") as f:
        json.dump(res, f, indent=4)


@deploy_dispatcher.add("rv")
def gen_rv_yaml(graph, clip_val, args, **kwargs):
    _gen1126(graph, clip_val, args)
    _gen3568(graph, clip_val, args)

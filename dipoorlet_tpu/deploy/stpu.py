"""STPU min/max + emin emitter (parity: deploy/deploy_stpu.py:23-222).

Per-tensor symmetric ranges, ReLU/Clip merge, optional 4x4 Winograd
weight-domain ranges (G.k.G^T), per-op `emin` exponent floors for the
FP-ish accumulators, and bias alpha = w_alpha * in_alpha."""
import json
import math
import os

import numpy as np

from . import deploy_dispatcher
from ..graph.graph import node_attrs
from ..quant.platform import LAYER_HAS_WEIGHT


def _abs_max(clip):
    return float(max(np.abs(np.min(clip[0])), np.max(clip[1])))


def _quant_weight(clip_val, graph, param):
    for node in graph.graph.node:
        if node.op_type in LAYER_HAS_WEIGHT:
            amax = _abs_max(clip_val[node.input[1]])
            param[node.name + "_weights"] = {"min": -amax, "max": amax}


def _quant_activation(clip_val, graph, param):
    for in_tensor in graph.network_inputs:
        amax = _abs_max(clip_val[in_tensor])
        param[in_tensor] = {"min": -amax, "max": amax}
    for node in graph.graph.node:
        for out_tensor in node.output:
            amax = _abs_max(clip_val[out_tensor])
            param[out_tensor] = {"min": -amax, "max": amax}


def _merge_relu(graph, param):
    for node in graph.graph.node:
        if node.op_type in ("Relu", "Clip"):
            param[node.input[0]] = param[node.output[0]].copy()


def _conv_wg_filter(node):
    if node.op_type != "Conv":
        return False
    attrs = node_attrs(node)
    if attrs.get("group", 1) != 1:
        return False
    kh, kw = attrs.get("kernel_shape", (0, 0))
    sh, sw = attrs.get("strides", (1, 1))
    return kh == 3 and kw == 3 and sh == 1 and sw == 1


def _wg_weight_range(ker):
    g = np.array([[2, 0, 0], [1, 1, 1], [1, -1, 1], [0, 0, 2]], dtype=np.float32)
    # G k G^T over all (out, in) filters at once
    wu = np.einsum("ab,oibc,dc->oiad", g, ker, g)
    return max(wu.max(), 0.0), min(wu.min(), 0.0)


def _conv_wg_layer(graph, param):
    for node in graph.graph.node:
        if _conv_wg_filter(node) and ("layer_" + node.name) not in param:
            param["layer_" + node.name] = {"wg": True}
            weight = graph.get_initializer(node.input[1])
            vmax, vmin = _wg_weight_range(weight)
            abs_vmax = float(max(vmax, -vmin))
            param[node.name + "_weights"]["max"] = abs_vmax
            param[node.name + "_weights"]["min"] = -abs_vmax


def _biased_exp(v):
    """IEEE-754 biased exponent of |v|, clamped to the normal range
    [1, 254]; 0 for v == 0. STPU emin floors are offsets from this."""
    if v == 0:
        return 0
    _, exp = math.frexp(abs(v))  # |v| = m * 2**exp, m in [0.5, 1)
    return min(max(exp + 126, 1), 254)


def _find_interp_emin(vmax, r):
    return _biased_exp(vmax) - (22 - r)


def _find_conv_emin(i_vmax, w_vmax, o_vmax, n, r):
    # worst-case accumulator magnitude ~ sqrt(n) * |x|max * |w|max
    vmax = max(math.sqrt(n) * i_vmax * w_vmax, o_vmax)
    return _biased_exp(vmax) - (12 - r)


def _find_corr_emin(o_vmax, n, r):
    return _biased_exp(o_vmax * math.sqrt(n)) - (12 - r)


def _layer_emin_state(graph, param):
    for node in graph.graph.node:
        if node.op_type in ("Upsample", "DynamicUpsample", "Resize"):
            param[node.output[0]]["emin"] = _find_interp_emin(param[node.output[0]]["max"], 2)
        if node.op_type in ("Conv", "ConvTranspose"):
            w_shape = graph.get_tensor_shape(node.input[1])
            n = int(np.prod(w_shape[1:4])) if len(w_shape) >= 4 else int(np.prod(w_shape[1:]))
            emin = _find_conv_emin(param[node.input[0]]["max"],
                                   param[node.name + "_weights"]["max"],
                                   param[node.output[0]]["max"], n, 2)
            param[node.output[0]]["emin"] = emin
        if node.op_type == "Gemm":
            n = int(np.prod(graph.get_tensor_shape(node.input[0])))
            emin = _find_conv_emin(param[node.input[0]]["max"],
                                   param[node.name + "_weights"]["max"],
                                   param[node.output[0]]["max"], n, 2)
            param[node.output[0]]["emin"] = emin
        if node.op_type == "Corr":
            co = node_attrs(node).get("groups", 1)
            n = int(np.prod(graph.get_tensor_shape(node.input[0]))) / co
            param[node.output[0]]["emin"] = _find_corr_emin(param[node.output[0]]["max"], n, 4)


def _quant_bias(graph, param):
    for node in graph.graph.node:
        if node.op_type in ("Conv", "ConvTranspose", "Gemm") and len(node.input) == 3:
            wmax = param[node.name + "_weights"]["max"]
            wmin = param[node.name + "_weights"]["min"]
            imax = param[node.input[0]]["max"]
            imin = param[node.input[0]]["min"]
            walpha = (wmax - wmin) / (2 ** 8 - 2)
            ialpha = (imax - imin) / (2 ** 8 - 2)
            param[node.name + "_bias"] = {"alpha": walpha * ialpha, "zero_point": 0}


@deploy_dispatcher.add("stpu")
def gen_stpu_minmax(graph, clip_val, args, **kwargs):
    param = {}
    _quant_weight(clip_val, graph, param)
    _quant_activation(clip_val, graph, param)
    _merge_relu(graph, param)
    if getattr(args, "stpu_wg", False):
        _conv_wg_layer(graph, param)
    _layer_emin_state(graph, param)
    _quant_bias(graph, param)
    with open(os.path.join(args.output_dir, "stpu_minmax.json"), "wt") as f:
        json.dump(param, f, indent=4)

"""Fake-quant (QDQ) graph rewrite.

Behavioral port of /root/reference/dipoorlet/quantize.py:20-108:
  * quantize inputs + weights of platform quant_nodes, leave outputs fp32;
  * ReLU/PRelu/Mul following Conv/Gemm/Eltwise/Add are range-merged (their
    input is not quantized) — quantize.py:50-55;
  * TensorRT: the first Conv-fed branch of an Add is not quantized
    (fused in TRT) — quantize.py:80-84;
  * bias is quantized only on platforms declaring qb_params (none of the
    8 built-ins do) — quantize.py:69-71;
  * optionally quantize network outputs — quantize.py:98-108.

The resulting GraphIR contains ONNX QuantizeLinear/DequantizeLinear pairs
and is directly executable by runtime.Executor (ops/quant_ops.py)."""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..graph.graph import GraphIR, INPUT_TOKEN
from ..onnx_ir import make_node, make_tensor_value_info
from ..onnx_ir.helper import array_to_tensor
from ..onnx_ir.proto import DataType
from .platform import LAYER_HAS_WEIGHT, platform_setting_table
from .qparams import QParams, compute_qparams
from ..utils.logging import logger

Q_SUFFIX = "_q"
DQ_SUFFIX = "_dq"
QUANT_OP_TYPES = ["QuantizeLinear", "DequantizeLinear"]
MERGE_RELU = ["Conv", "Gemm", "Eltwise", "Add"]
RELU_TYPE = ["Relu", "PRelu", "Mul"]


def qparams_for_tensor(param: dict, clip_range) -> QParams:
    return compute_qparams(param, clip_range[0], clip_range[1])


def _finite_range(clip_range) -> bool:
    """A tensor whose calibrated range is not finite cannot carry a
    meaningful scale.  The one legitimate source is masked-attention
    interiors (causal Where / additive-mask Add produce ~-finfo.max or
    -inf logits); the reference pipeline erases those interiors with the
    ORT transformer optimizer before quantizing — ours does the same
    under --optim_transformer.  Without it, inserting a QDQ with an
    inf/NaN scale silently zeroes the whole tensor, so we skip the pair
    and warn instead."""
    return bool(np.all(np.isfinite(clip_range[0]))
                and np.all(np.isfinite(clip_range[1])))


def _make_qdq_nodes(tensor_name: str, qp: QParams, need_transpose: bool):
    """Build [QuantizeLinear, DequantizeLinear] nodes + scale/zp initializers."""
    scale = qp.scale_f32()
    zp = qp.zero_point.astype(qp.zp_dtype)
    if scale.size == 1:
        scale = scale.reshape(())
        zp = zp.reshape(())
    scale_t = array_to_tensor(scale, tensor_name + "_scale")
    zp_t = array_to_tensor(zp, tensor_name + "_zero_point")
    kwargs = {}
    if qp.per_channel and scale.size > 1:
        kwargs["axis"] = 1 if need_transpose else 0
    q_node = make_node("QuantizeLinear",
                       [tensor_name, tensor_name + "_scale", tensor_name + "_zero_point"],
                       [tensor_name + Q_SUFFIX],
                       name=tensor_name + "_QuantizeLinear", **kwargs)
    dq_node = make_node("DequantizeLinear",
                        [tensor_name + Q_SUFFIX, tensor_name + "_scale", tensor_name + "_zero_point"],
                        [tensor_name + DQ_SUFFIX],
                        name=tensor_name + "_DequantizeLinear", **kwargs)
    return [q_node, dq_node], [scale_t, zp_t]


def quant_graph(graph: GraphIR, clip_val: Dict, args):
    """Returns (graph_q, quant_node_list)."""
    g = graph.clone()
    from .platform import effective_setting
    setting = effective_setting(args)
    skip = set(getattr(args, "skip_layers", []) or [])

    quant_node_list = [n for n in g.graph.node
                       if n.name not in skip and n.op_type in setting["quant_nodes"]]
    _warned_nonfinite: set = set()

    act_quantized: Dict[str, str] = {}  # tensor -> dq name
    insertions = []  # (anchor_node_name, [q,dq nodes], [inits])

    for node in quant_node_list:
        find_weight = False
        trt_merge_add = False
        for idx, in_tensor in enumerate(node.input):
            if in_tensor == "":
                continue
            need_transpose = False

            if node.op_type in RELU_TYPE:
                prev = g.get_tensor_producer(node.input[0])
                if prev == INPUT_TOKEN:
                    continue
                if len(node.input) == 1 and prev != INPUT_TOKEN and prev.op_type in MERGE_RELU:
                    continue

            q_nodes = None
            if in_tensor in g.initializer and node.op_type in LAYER_HAS_WEIGHT:
                if not find_weight:
                    find_weight = True
                    if node.op_type == "ConvTranspose":
                        need_transpose = True
                    qp = qparams_for_tensor(setting["qw_params"], clip_val[in_tensor])
                    q_nodes = _make_qdq_nodes(in_tensor, qp, need_transpose)
                elif "qb_params" in setting:
                    qp = qparams_for_tensor(setting["qb_params"], clip_val[in_tensor])
                    q_nodes = _make_qdq_nodes(in_tensor, qp, need_transpose)

            if in_tensor in g.network_inputs or \
                    (in_tensor not in g.input and in_tensor not in g.initializer):
                # TRT merges the first Conv-fed input of an Add (quantize.py:80-84)
                if args.deploy == "trt" and node.op_type == "Add" and not trt_merge_add:
                    prev = g.get_tensor_producer(in_tensor)
                    if prev != INPUT_TOKEN and prev.op_type == "Conv":
                        trt_merge_add = True
                        continue
                if not _finite_range(clip_val[in_tensor]):
                    if in_tensor not in _warned_nonfinite:
                        _warned_nonfinite.add(in_tensor)
                        logger.warning(
                            "tensor %r has a non-finite calibration range %s — "
                            "left unquantized (masked-attention interior? use "
                            "--optim_transformer to fuse it away)",
                            in_tensor, clip_val[in_tensor])
                    continue
                qp = qparams_for_tensor(setting["qi_params"], clip_val[in_tensor])
                q_nodes = _make_qdq_nodes(in_tensor, qp, False)

            if q_nodes is not None:
                nodes, inits = q_nodes
                node.input[idx] = in_tensor + DQ_SUFFIX
                if in_tensor in act_quantized:
                    continue
                insertions.append((node.name, nodes, inits))
                act_quantized[in_tensor] = in_tensor + DQ_SUFFIX

    _apply_insertions(g, insertions)

    if setting["quantize_network_output"]:
        out_insertions = []
        for out_tensor in list(g.network_outputs):
            if out_tensor in act_quantized:
                continue
            qp = qparams_for_tensor(setting["qi_params"], clip_val[out_tensor])
            nodes, inits = _make_qdq_nodes(out_tensor, qp, False)
            producer = g.get_tensor_producer(out_tensor)
            anchor = None if producer == INPUT_TOKEN else producer.name
            out_insertions.append((anchor, nodes, inits, out_tensor))
        for anchor, nodes, inits, out_tensor in out_insertions:
            idx = (g.index(g.output_map[out_tensor]) + 1) if anchor else 0
            for n in reversed(nodes):
                g.graph.node.insert(idx, n)
            for t in inits:
                g.graph.initializer.append(t)
            g.set_index()
            g.prepare_initializer()
            g.del_network_output(out_tensor)
            g.add_network_output(make_tensor_value_info(
                out_tensor + DQ_SUFFIX, DataType.FLOAT, g.get_tensor_shape(out_tensor)))
            g.tensor_name_shape_map[out_tensor + DQ_SUFFIX] = g.get_tensor_shape(out_tensor)

    g.topologize_graph()
    g.ensure_topological()
    _fill_qdq_shapes(g)
    # quant_node_list entries are nodes of g (clone) — map by name back to clones
    name_set = {n.name for n in quant_node_list}
    quant_node_list = [n for n in g.graph.node if n.name in name_set]
    return g, quant_node_list


def _apply_insertions(g: GraphIR, insertions):
    for anchor_name, nodes, inits in insertions:
        idx = g.name_idx_map.get(anchor_name, 0)
        for n in reversed(nodes):
            g.graph.node.insert(idx, n)
        for t in inits:
            g.graph.initializer.append(t)
        g.set_index()
    g.prepare_initializer()


def _fill_qdq_shapes(g: GraphIR):
    """Synthetic shape entries for *_q/*_dq tensors (utils.py:107-117)."""
    for node in g.graph.node:
        if node.op_type in QUANT_OP_TYPES:
            src = node.input[0]
            base = src[:-len(Q_SUFFIX)] if src.endswith(Q_SUFFIX) else src
            if base in g.tensor_name_shape_map:
                g.tensor_name_shape_map[node.output[0]] = g.tensor_name_shape_map[base]

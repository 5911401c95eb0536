"""QOperator-format export: emit a QLinearOps ONNX model.

Replaces the reference's dependency on onnxruntime's ONNXQuantizer
(utils.py:415-435) with a native conversion: Conv/Gemm/MatMul become
QLinearConv/QLinearMatMul with uint8/int8 tensors and int32 bias;
tensors entering/leaving the quantized domain get explicit
QuantizeLinear/DequantizeLinear boundaries."""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..graph.graph import GraphIR, node_attrs
from ..onnx_ir import (array_to_tensor, make_graph, make_model, make_node,
                       make_tensor_value_info)
from ..onnx_ir.proto import DataType
from ..utils.logging import logger
from .platform import platform_setting_table
from .qparams import compute_qparams

QLINEAR_CONVERTIBLE = ("Conv", "Gemm", "MatMul")


def _quantize_array(arr, qp):
    q = np.round(arr / qp.scale_f32().reshape((-1,) + (1,) * (arr.ndim - 1))
                 if qp.scale_f32().size > 1 else arr / qp.scale_f32())
    q = q + qp.zero_point.reshape((-1,) + (1,) * (arr.ndim - 1)) if qp.zero_point.size > 1 \
        else q + qp.zero_point
    lo, hi = (-128, 127) if qp.symmetric else (0, 255)
    return np.clip(q, lo, hi).astype(qp.zp_dtype)


def deploy_qoperator(graph: GraphIR, tensor_range: Dict, args):
    """Convert Conv/Gemm(2D)/MatMul nodes to QLinear ops using calibrated
    activation ranges; write qop_model.onnx."""
    setting = platform_setting_table[args.deploy]
    qi_param = setting["qi_params"]
    qw_param = setting["qw_params"]
    skip = set(getattr(args, "skip_layers", []) or [])

    nodes_out = []
    inits_out = []
    init_names = set()
    quantized_tensors: Dict[str, tuple] = {}  # fp name -> (q name, scale name, zp name)

    def add_init(arr, name):
        if name not in init_names:
            inits_out.append(array_to_tensor(np.asarray(arr), name))
            init_names.add(name)
        return name

    def ensure_act_quant(name):
        """Insert QuantizeLinear for activation `name`; returns (qname, s, zp)."""
        if name in quantized_tensors:
            return quantized_tensors[name]
        rng = tensor_range[name]
        qp = compute_qparams(qi_param, rng[0], rng[1])
        s = add_init(qp.scale_f32().reshape(()), name + "_qop_scale")
        zp = add_init(qp.zero_point.astype(qp.zp_dtype).reshape(()), name + "_qop_zp")
        qname = name + "_quantized"
        nodes_out.append(make_node("QuantizeLinear", [name, s, zp], [qname],
                                   name=name + "_QuantizeLinear_qop"))
        quantized_tensors[name] = (qname, s, zp)
        return quantized_tensors[name]

    convertible = []
    for node in graph.graph.node:
        ok = (node.op_type in QLINEAR_CONVERTIBLE
              and node.op_type in setting["quant_nodes"]
              and node.name not in skip
              and len(node.input) >= 2
              and node.input[1] in graph.initializer
              and node.input[0] in tensor_range
              and node.output[0] in tensor_range)
        if ok and node.op_type == "Gemm":
            attrs = node_attrs(node)
            ok = attrs.get("transA", 0) == 0 and attrs.get("alpha", 1.0) == 1.0 \
                and attrs.get("beta", 1.0) == 1.0
        convertible.append(ok)

    for node, ok in zip(graph.graph.node, convertible):
        if not ok:
            nodes_out.append(node)
            continue
        x_name = node.input[0]
        w = graph.get_initializer(node.input[1]).astype(np.float32)
        attrs = node_attrs(node)
        if node.op_type == "Gemm" and attrs.get("transB", 0) == 0:
            w_for_range = w.T  # QLinearMatMul wants (K, N); ranges per output col
        else:
            w_for_range = w
        c = w_for_range.shape[0]
        wqp = compute_qparams(qw_param, w_for_range.reshape(c, -1).min(-1),
                              w_for_range.reshape(c, -1).max(-1))

        xq, xs, xzp = ensure_act_quant(x_name)
        out_rng = tensor_range[node.output[0]]
        oqp = compute_qparams(qi_param, out_rng[0], out_rng[1])
        os_ = add_init(oqp.scale_f32().reshape(()), node.output[0] + "_qop_scale")
        ozp = add_init(oqp.zero_point.astype(oqp.zp_dtype).reshape(()),
                       node.output[0] + "_qop_zp")

        if node.op_type == "Conv":
            wq = _quantize_array(w, wqp)
            wq_name = add_init(wq, node.input[1] + "_quantized")
            ws = add_init(wqp.scale_f32(), node.input[1] + "_qop_scale")
            wzp = add_init(wqp.zero_point.astype(wqp.zp_dtype), node.input[1] + "_qop_zp")
            q_inputs = [xq, xs, xzp, wq_name, ws, wzp, os_, ozp]
            if len(node.input) == 3:
                bias = graph.get_initializer(node.input[2]).astype(np.float64)
                x_scale = float(compute_qparams(qi_param, *tensor_range[x_name]).scale_f32())
                bias_scale = x_scale * wqp.scale_f32().astype(np.float64)
                bias_q = np.round(bias / bias_scale).astype(np.int32)
                q_inputs.append(add_init(bias_q, node.input[2] + "_quantized"))
            conv_attrs = {k: v for k, v in attrs.items()
                          if k in ("kernel_shape", "strides", "pads", "dilations",
                                   "group", "auto_pad")}
            nodes_out.append(make_node("QLinearConv", q_inputs,
                                       [node.output[0] + "_quantized"],
                                       name=node.name + "_quant", **conv_attrs))
        else:  # Gemm/MatMul -> QLinearMatMul (per-tensor weight quant)
            wq_t = w.T if (node.op_type == "Gemm" and attrs.get("transB", 0)) else w
            w_flat_qp = compute_qparams({**qw_param, "per_channel": False},
                                        wq_t.min(), wq_t.max())
            wq = _quantize_array(wq_t, w_flat_qp)
            wq_name = add_init(wq, node.input[1] + "_quantized")
            ws = add_init(w_flat_qp.scale_f32().reshape(()), node.input[1] + "_qop_scale")
            wzp = add_init(w_flat_qp.zero_point.astype(w_flat_qp.zp_dtype).reshape(()),
                           node.input[1] + "_qop_zp")
            nodes_out.append(make_node("QLinearMatMul",
                                       [xq, xs, xzp, wq_name, ws, wzp, os_, ozp],
                                       [node.output[0] + "_quantized"],
                                       name=node.name + "_quant"))
            if node.op_type == "Gemm" and len(node.input) == 3:
                # bias added after dequantization
                pass
        nodes_out.append(make_node("DequantizeLinear",
                                   [node.output[0] + "_quantized", os_, ozp],
                                   [node.output[0]],
                                   name=node.output[0] + "_DequantizeLinear_qop"))
        if node.op_type == "Gemm" and len(node.input) == 3:
            nodes_out[-1].output[0] = node.output[0] + "_nobias"
            nodes_out.append(make_node("Add", [node.output[0] + "_nobias", node.input[2]],
                                       [node.output[0]], name=node.name + "_bias_add"))

    # keep original initializers still referenced
    used = {i for n in nodes_out for i in n.input}
    for t in graph.graph.initializer:
        if t.name in used:
            inits_out.append(t)

    g = make_graph(nodes_out, graph.graph.name + "_qop",
                   list(graph.graph.input), list(graph.graph.output),
                   initializer=inits_out, value_info=list(graph.graph.value_info))
    model = make_model(g, opset_imports=graph.model.opset_import,
                       ir_version=graph.model.ir_version or 8)
    import os
    path = os.path.join(args.output_dir, "qop_model.onnx")
    from ..onnx_ir import save_model
    save_model(model, path)
    logger.info("QOperator model written to %s", path)
    return path

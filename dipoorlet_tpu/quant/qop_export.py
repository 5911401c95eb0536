"""QOperator-format export: emit a QLinearOps ONNX model.

Native replacement for the reference's onnxruntime ONNXQuantizer call
(utils.py:415-435), which quantizes the platform's WHOLE `quant_nodes`
set in QLinearOps mode.  Coverage here:

  Conv            -> QLinearConv           (per-channel weights, i32 bias)
  Gemm            -> QGemm (com.microsoft; alpha/transA/transB attrs,
                     beta folded into the int32 bias — no fp32 fallback
                     for non-canonical Gemm anymore)
  MatMul          -> QLinearMatMul         (static OR dynamic B)
  Add / Mul       -> QLinearAdd / QLinearMul       (com.microsoft)
  AveragePool     -> QLinearAveragePool            (com.microsoft)
  GlobalAveragePool -> QLinearGlobalAveragePool    (com.microsoft)
  Sigmoid / LeakyRelu -> QLinearSigmoid / QLinearLeakyRelu
  Concat          -> QLinearConcat                 (com.microsoft)
  MaxPool / Split -> int8-domain passthrough (monotone/index ops are
                     exact on quantized values; output inherits the
                     input's scale/zp — no Q/DQ boundary)
  Relu            -> range-merged: a sole-consumer Relu folds its
                     post-activation range into the producer's output
                     requantization; with asymmetric activations
                     (zp == qmin) the clamp IS the Relu and the node is
                     elided; with symmetric activations an int8 Relu
                     node remains (max(q, 0), exact) — either way no
                     Q/DQ boundary.

Tensors move between domains lazily: QuantizeLinear is inserted only
where a quantized consumer needs an fp tensor, DequantizeLinear only
where an fp consumer (or a graph output) needs a quantized one — so no
back-to-back Q/DQ pairs are ever emitted.  Anything in `quant_nodes`
that still lands fp32 (ConvTranspose and PRelu have no QLinear form in
ORT's QLinearOps registry either) is counted and logged.
"""
from __future__ import annotations

import os
from typing import Dict, NamedTuple

import numpy as np

from ..graph.graph import GraphIR, node_attrs
from ..onnx_ir import (array_to_tensor, make_graph, make_model, make_node,
                       make_opsetid, save_model)
from ..utils.logging import logger
from .platform import platform_setting_table
from .qparams import QParams, compute_qparams

MS_DOMAIN = "com.microsoft"

_COMPUTE = {"Conv", "Gemm", "MatMul"}
_ELTWISE = {"Add": "QLinearAdd", "Mul": "QLinearMul",
            "AveragePool": "QLinearAveragePool",
            "GlobalAveragePool": "QLinearGlobalAveragePool",
            "Sigmoid": "QLinearSigmoid", "LeakyRelu": "QLinearLeakyRelu",
            "Concat": "QLinearConcat"}
_PASSTHROUGH = {"MaxPool", "Split"}


class QTensor(NamedTuple):
    qname: str      # int8/uint8 tensor name
    s_name: str     # scale initializer name
    zp_name: str    # zero-point initializer name
    qp: QParams     # numeric qparams (bias quantization needs the scale)


def _bias_int32(vals, name):
    """Saturating int32 bias quantization.  A degenerate activation scale
    (untrained nets whose tail activations collapse toward 0) can push
    bias/(x_scale*w_scale) past 2^31; a raw astype would be UB — clamp
    and warn instead, matching ORT's saturating behavior."""
    q = np.round(vals)
    lim = np.iinfo(np.int32)
    if (q < lim.min).any() or (q > lim.max).any():
        logger.warning("QOP export: int32 bias '%s' saturates (|q| up to "
                       "%.3g) — the input scale is degenerately small; "
                       "expect accuracy loss on this layer",
                       name, float(np.abs(q).max()))
    return np.clip(q, lim.min, lim.max).astype(np.int64).astype(np.int32)


def _quantize_array(arr, qp: QParams):
    """Statically quantize an fp array with per-tensor or axis-0 qparams."""
    s = qp.scale_f32()
    zp = qp.zero_point
    if s.size > 1:
        s = s.reshape((-1,) + (1,) * (arr.ndim - 1))
        zp = zp.reshape((-1,) + (1,) * (arr.ndim - 1))
    q = np.round(arr / s) + zp
    lo, hi = (-128, 127) if qp.symmetric else (0, 255)
    return np.clip(q, lo, hi).astype(qp.zp_dtype)


def deploy_qoperator(graph: GraphIR, tensor_range: Dict, args):
    """Convert the platform's quant_nodes set to QLinear ops using the
    calibrated activation ranges; write qop_model.onnx."""
    setting = platform_setting_table[args.deploy]
    qi_param = setting["qi_params"]
    qw_param = setting["qw_params"]
    quant_nodes = set(setting["quant_nodes"])
    sym_act = bool(qi_param["symmetric"])
    skip = set(getattr(args, "skip_layers", []) or [])

    consumers: Dict[str, list] = {}
    for node in graph.graph.node:
        for inp in node.input:
            if inp:
                consumers.setdefault(inp, []).append(node)
    producer = {o: n for n in graph.graph.node for o in n.output if o}
    net_outputs = set(graph.network_outputs)

    nodes_out = []
    inits_out = []
    init_names = set()
    qmap: Dict[str, QTensor] = {}      # fp name -> quantized twin
    fp_avail = (set(graph.network_inputs) | set(graph.initializer))
    dq_emitted = set()
    fp32_left: Dict[str, int] = {}     # op_type -> count left unquantized

    def add_init(arr, name):
        if name not in init_names:
            inits_out.append(array_to_tensor(np.asarray(arr), name))
            init_names.add(name)
        return name

    def reg_qparams(base, qp):
        s = add_init(qp.scale_f32().reshape(()) if qp.scale_f32().size == 1
                     else qp.scale_f32(), base + "_qop_scale")
        zp_arr = qp.zero_point.astype(qp.zp_dtype)
        zp = add_init(zp_arr.reshape(()) if zp_arr.size == 1 else zp_arr,
                      base + "_qop_zp")
        return s, zp

    def act_qp(range_name):
        rng = tensor_range[range_name]
        return compute_qparams(qi_param, rng[0], rng[1])

    def ensure_q(name) -> QTensor:
        """The quantized-domain twin of tensor `name` (insert Q / quantize
        the initializer on first need)."""
        if name in qmap:
            return qmap[name]
        if name in graph.initializer:
            arr = graph.get_initializer(name).astype(np.float32)
            qp = compute_qparams({**qi_param, "per_channel": False},
                                 float(arr.min()), float(arr.max()))
            qname = add_init(_quantize_array(arr, qp), name + "_quantized")
            s, zp = reg_qparams(name, qp)
            qmap[name] = QTensor(qname, s, zp, qp)
            return qmap[name]
        qp = act_qp(name)
        s, zp = reg_qparams(name, qp)
        qname = name + "_quantized"
        nodes_out.append(make_node("QuantizeLinear", [name, s, zp], [qname],
                                   name=name + "_QuantizeLinear_qop"))
        qmap[name] = QTensor(qname, s, zp, qp)
        return qmap[name]

    def ensure_fp(name):
        """Make the original fp name available (insert DQ if the tensor
        only exists in the quantized domain)."""
        if name in fp_avail or name in dq_emitted or name not in qmap:
            return name
        qt = qmap[name]
        nodes_out.append(make_node("DequantizeLinear",
                                   [qt.qname, qt.s_name, qt.zp_name], [name],
                                   name=name + "_DequantizeLinear_qop"))
        dq_emitted.add(name)
        return name

    def has_range(name):
        return name in tensor_range or name in graph.initializer

    # ---- pre-pass: classify nodes, decide Relu folding --------------------
    def base_quantizable(node):
        if node.op_type not in quant_nodes or node.name in skip:
            return False
        if not all(has_range(i) for i in node.input if i):
            return False
        if not all(o in tensor_range for o in node.output if o):
            return False
        if node.op_type in _COMPUTE:
            if len(node.input) < 2:
                return False
            if node.op_type != "MatMul" and node.input[1] not in graph.initializer:
                return False  # dynamic Conv weight / Gemm B unsupported
            if node.op_type == "Gemm" and len(node.input) == 3 \
                    and node.input[2] not in graph.initializer:
                return False  # dynamic C can't fold into the int32 bias
            return True
        if node.op_type in _ELTWISE:
            return True
        return False  # passthrough / Relu handled separately

    quantizable = {n.name: base_quantizable(n) for n in graph.graph.node}

    # Relu decisions: 'elide' | 'int8' | None (fp32)
    relu_mode: Dict[str, str] = {}
    range_override: Dict[str, str] = {}   # producer out -> post-relu tensor
    for node in graph.graph.node:
        if node.op_type != "Relu" or "Relu" not in quant_nodes \
                or node.name in skip:
            continue
        src = node.input[0]
        prod = producer.get(src)
        prod_q = prod is not None and quantizable.get(prod.name, False)
        sole = prod_q and len(consumers.get(src, [])) == 1 \
            and src not in net_outputs and node.output[0] in tensor_range
        if sole:
            range_override[src] = node.output[0]
            relu_mode[node.name] = "int8" if sym_act else "elide"
        elif prod_q and sym_act:
            relu_mode[node.name] = "int8"   # multi-consumer: keep exact max(q,0)

    # ---- emission ---------------------------------------------------------
    def out_qparams(node):
        rng_name = range_override.get(node.output[0], node.output[0])
        qp = act_qp(rng_name)
        s, zp = reg_qparams(node.output[0], qp)
        return qp, s, zp

    def emit_compute(node):
        attrs = node_attrs(node)
        x = ensure_q(node.input[0])
        oqp, os_, ozp = out_qparams(node)
        oq_name = node.output[0] + "_quantized"

        if node.op_type == "Conv":
            w = graph.get_initializer(node.input[1]).astype(np.float32)
            c = w.shape[0]
            wqp = compute_qparams(qw_param, w.reshape(c, -1).min(-1),
                                  w.reshape(c, -1).max(-1))
            wq_name = add_init(_quantize_array(w, wqp), node.input[1] + "_quantized")
            ws, wzp = reg_qparams(node.input[1], wqp)
            q_inputs = [x.qname, x.s_name, x.zp_name, wq_name, ws, wzp, os_, ozp]
            if len(node.input) == 3:
                bias = graph.get_initializer(node.input[2]).astype(np.float64)
                b_scale = (float(x.qp.scale_f32().reshape(-1)[0])
                           * wqp.scale_f32().astype(np.float64))
                q_inputs.append(add_init(
                    _bias_int32(bias / b_scale, node.input[2]),
                    node.input[2] + "_quantized"))
            conv_attrs = {k: v for k, v in attrs.items()
                          if k in ("kernel_shape", "strides", "pads",
                                   "dilations", "group", "auto_pad")}
            nodes_out.append(make_node("QLinearConv", q_inputs, [oq_name],
                                       name=node.name + "_quant", **conv_attrs))
        elif node.op_type == "Gemm":
            # QGemm (com.microsoft): alpha/transA/transB attrs; C is int32
            # with scale alpha*a_scale*b_scale, zp 0 — beta folds into it.
            b_arr = graph.get_initializer(node.input[1]).astype(np.float32)
            alpha = float(attrs.get("alpha", 1.0))
            beta = float(attrs.get("beta", 1.0))
            bqp = compute_qparams({**qw_param, "per_channel": False},
                                  float(b_arr.min()), float(b_arr.max()))
            bq_name = add_init(_quantize_array(b_arr, bqp),
                               node.input[1] + "_quantized")
            bs, bzp = reg_qparams(node.input[1], bqp)
            q_inputs = [x.qname, x.s_name, x.zp_name, bq_name, bs, bzp]
            if len(node.input) == 3:
                c_arr = graph.get_initializer(node.input[2]).astype(np.float64)
                c_scale = (alpha * float(x.qp.scale_f32().reshape(-1)[0])
                           * float(bqp.scale_f32().reshape(-1)[0]))
                q_inputs.append(add_init(
                    _bias_int32(beta * c_arr / c_scale, node.input[2]),
                    node.input[2] + "_quantized"))
            else:
                q_inputs.append("")
            q_inputs += [os_, ozp]
            nodes_out.append(make_node(
                "QGemm", q_inputs, [oq_name], name=node.name + "_quant",
                domain=MS_DOMAIN, alpha=alpha,
                transA=int(attrs.get("transA", 0)),
                transB=int(attrs.get("transB", 0))))
        else:  # MatMul (static or dynamic B, per-tensor)
            if node.input[1] in graph.initializer:
                b_arr = graph.get_initializer(node.input[1]).astype(np.float32)
                bqp = compute_qparams({**qw_param, "per_channel": False},
                                      float(b_arr.min()), float(b_arr.max()))
                bq_name = add_init(_quantize_array(b_arr, bqp),
                                   node.input[1] + "_quantized")
                bs, bzp = reg_qparams(node.input[1], bqp)
            else:
                b = ensure_q(node.input[1])
                bq_name, bs, bzp = b.qname, b.s_name, b.zp_name
            nodes_out.append(make_node(
                "QLinearMatMul",
                [x.qname, x.s_name, x.zp_name, bq_name, bs, bzp, os_, ozp],
                [oq_name], name=node.name + "_quant"))
        qmap[node.output[0]] = QTensor(oq_name, os_, ozp, oqp)

    def emit_eltwise(node):
        attrs = node_attrs(node)
        oqp, os_, ozp = out_qparams(node)
        oq_name = node.output[0] + "_quantized"
        qop = _ELTWISE[node.op_type]
        if node.op_type in ("Add", "Mul"):
            a, b = ensure_q(node.input[0]), ensure_q(node.input[1])
            inputs = [a.qname, a.s_name, a.zp_name,
                      b.qname, b.s_name, b.zp_name, os_, ozp]
            nodes_out.append(make_node(qop, inputs, [oq_name],
                                       name=node.name + "_quant",
                                       domain=MS_DOMAIN))
        elif node.op_type == "Concat":
            inputs = [os_, ozp]
            for i in node.input:
                t = ensure_q(i)
                inputs += [t.qname, t.s_name, t.zp_name]
            nodes_out.append(make_node(qop, inputs, [oq_name],
                                       name=node.name + "_quant",
                                       domain=MS_DOMAIN,
                                       axis=int(attrs.get("axis", 1))))
        else:  # unary pools / activations
            x = ensure_q(node.input[0])
            keep = {k: v for k, v in attrs.items()
                    if k in ("kernel_shape", "strides", "pads", "auto_pad",
                             "ceil_mode", "count_include_pad", "alpha")}
            nodes_out.append(make_node(
                qop, [x.qname, x.s_name, x.zp_name, os_, ozp], [oq_name],
                name=node.name + "_quant", domain=MS_DOMAIN, **keep))
        qmap[node.output[0]] = QTensor(oq_name, os_, ozp, oqp)

    for node in graph.graph.node:
        op = node.op_type
        if op == "Relu" and relu_mode.get(node.name):
            mode = relu_mode[node.name]
            x = ensure_q(node.input[0])
            if mode == "elide":
                # producer requantized at the post-relu range with
                # zp == qmin: the saturating cast IS the relu
                qmap[node.output[0]] = x
            else:
                oq_name = node.output[0] + "_quantized"
                nodes_out.append(make_node("Relu", [x.qname], [oq_name],
                                           name=node.name + "_quant"))
                qmap[node.output[0]] = QTensor(oq_name, x.s_name,
                                               x.zp_name, x.qp)
            continue
        if op in _PASSTHROUGH and op in quant_nodes and node.name not in skip \
                and node.input[0] in qmap:
            x = qmap[node.input[0]]
            out_names = [o + "_quantized" for o in node.output]
            nodes_out.append(make_node(op, [x.qname] + list(node.input[1:]),
                                       out_names, name=node.name + "_quant",
                                       **node_attrs(node)))
            for o, oq in zip(node.output, out_names):
                qmap[o] = QTensor(oq, x.s_name, x.zp_name, x.qp)
            continue
        if quantizable.get(node.name, False):
            if op in _COMPUTE:
                emit_compute(node)
            else:
                emit_eltwise(node)
            continue
        # fp32 node: bring its inputs back to the float domain
        for inp in node.input:
            if inp:
                ensure_fp(inp)
        nodes_out.append(node)
        fp_avail.update(o for o in node.output if o)
        if op in quant_nodes and op != "Relu":
            fp32_left[op] = fp32_left.get(op, 0) + 1
        elif op == "Relu" and "Relu" in quant_nodes and node.input[0] in qmap:
            fp32_left[op] = fp32_left.get(op, 0) + 1

    for out in graph.network_outputs:
        ensure_fp(out)

    if fp32_left:
        logger.info("QOP export: %d quant_nodes left fp32 (%s) — no QLinear "
                    "lowering exists for these in QLinearOps form",
                    sum(fp32_left.values()),
                    ", ".join(f"{k}x{v}" for k, v in sorted(fp32_left.items())))

    # keep original initializers still referenced
    used = {i for n in nodes_out for i in n.input}
    for t in graph.graph.initializer:
        if t.name in used:
            inits_out.append(t)

    g = make_graph(nodes_out, graph.graph.name + "_qop",
                   list(graph.graph.input), list(graph.graph.output),
                   initializer=inits_out, value_info=list(graph.graph.value_info))
    opsets = list(graph.model.opset_import)
    if not any(o.domain == MS_DOMAIN for o in opsets):
        opsets.append(make_opsetid(MS_DOMAIN, 1))
    model = make_model(g, opset_imports=opsets,
                       ir_version=graph.model.ir_version or 8)
    path = os.path.join(args.output_dir, "qop_model.onnx")
    save_model(model, path)
    logger.info("QOperator model written to %s", path)
    return path

"""Transformer graph optimization: LayerNorm / GELU pattern fusion.

The TPU-native equivalent of the reference's ORT transformer optimizer
subprocess (reference __main__.py:85-89, onnxruntime.transformers
fusion): torch exports at opset < 17 decompose LayerNorm into
ReduceMean/Sub/Pow/ReduceMean/Add/Sqrt/Div/Mul/Add and GELU into
Div/Erf/Add/Mul/Mul chains.  Fusing them

  * shrinks the calibration tap set (9 interior tensors -> 1 per LN),
    which is what bounds stats compile time and quant-noise insertion
    points on transformer-scale graphs, and
  * hands XLA a single LayerNormalization/Gelu HLO it fuses natively.

Quantization semantics match the reference: ORT's optimizer also erases
these interiors before calibration, so per-tensor ranges exist only at
the fused op's boundary.
"""
from __future__ import annotations

import numpy as np

from ..utils.logging import logger
from .graph import GraphIR, node_attrs
from ..onnx_ir import make_node


def _scalar_init(g: GraphIR, name):
    """Initializer value as a python float if it is a scalar, else None."""
    if name not in g.initializer:
        return None
    arr = np.asarray(g.initializer[name])
    if arr.size != 1:
        return None
    return float(arr.reshape(()))


def _only_consumer(g: GraphIR, tensor, op_type):
    """The single consumer node of `tensor` if it has exactly one and it
    has the given op_type (and tensor is not a network output)."""
    if tensor in g.network_outputs:
        return None
    consumers = g.input_map.get(tensor, [])
    if len(consumers) != 1 or consumers[0].op_type != op_type:
        return None
    return consumers[0]


def _reduce_axes(g: GraphIR, node):
    attrs = node_attrs(node)
    if "axes" in attrs:
        return list(attrs["axes"])
    if len(node.input) > 1 and node.input[1] in g.initializer:  # opset >= 18
        return list(np.asarray(g.initializer[node.input[1]]).ravel())
    return None


def _match_layer_norm(g: GraphIR, rm1):
    """rm1: ReduceMean(x).  Returns (fused_node, interior_nodes) or None."""
    axes = _reduce_axes(g, rm1)
    x = rm1.input[0]
    ndim = len(g.tensor_name_shape_map.get(x, []) or [])
    if axes is None or len(axes) != 1 or not ndim:
        return None
    axis = axes[0] + ndim if axes[0] < 0 else axes[0]
    if axis != ndim - 1:
        return None  # LayerNorm over the trailing dim only
    sub = _only_consumer(g, rm1.output[0], "Sub")
    if sub is None or sub.input[0] != x or sub.input[1] != rm1.output[0]:
        return None
    # Sub output feeds exactly Pow and Div
    sub_consumers = g.input_map.get(sub.output[0], [])
    if len(sub_consumers) != 2 or sub.output[0] in g.network_outputs:
        return None
    pow_ = next((n for n in sub_consumers if n.op_type == "Pow"), None)
    div = next((n for n in sub_consumers if n.op_type == "Div"), None)
    if pow_ is None or div is None or _scalar_init(g, pow_.input[1]) != 2.0:
        return None
    rm2 = _only_consumer(g, pow_.output[0], "ReduceMean")
    if rm2 is None or _reduce_axes(g, rm2) != axes:
        return None
    add_eps = _only_consumer(g, rm2.output[0], "Add")
    if add_eps is None:
        return None
    eps = _scalar_init(g, add_eps.input[1])
    if eps is None:
        eps = _scalar_init(g, add_eps.input[0])
    if eps is None or eps <= 0 or eps > 1e-2:
        return None
    sqrt = _only_consumer(g, add_eps.output[0], "Sqrt")
    if sqrt is None:
        return None
    if _only_consumer(g, sqrt.output[0], "Div") is not div \
            or list(div.input) != [sub.output[0], sqrt.output[0]]:
        return None
    mul = _only_consumer(g, div.output[0], "Mul")
    if mul is None:
        return None
    scale = next((i for i in mul.input if i in g.initializer), None)
    if scale is None:
        return None
    add_b = _only_consumer(g, mul.output[0], "Add")
    if add_b is None:
        return None
    bias = next((i for i in add_b.input if i in g.initializer), None)
    if bias is None:
        return None
    fused = make_node("LayerNormalization", [x, scale, bias], [add_b.output[0]],
                      name=rm1.name + "_ln_fused", axis=-1, epsilon=eps)
    return fused, [rm1, sub, pow_, rm2, add_eps, sqrt, div, mul, add_b]


def _match_gelu(g: GraphIR, erf):
    """erf: Erf(Div(x, sqrt2)).  Returns (fused_node, interior_nodes) or None."""
    div = g.output_map.get(erf.input[0])
    if div is None or getattr(div, "op_type", None) != "Div":
        return None
    c = _scalar_init(g, div.input[1])
    if c is None or abs(c - np.sqrt(2.0)) > 1e-3:
        return None
    x = div.input[0]
    if len(g.input_map.get(div.output[0], [])) != 1:
        return None
    add1 = _only_consumer(g, erf.output[0], "Add")
    if add1 is None:
        return None
    one = _scalar_init(g, add1.input[1])
    if one is None:
        one = _scalar_init(g, add1.input[0])
    if one != 1.0:
        return None
    mul_x = _only_consumer(g, add1.output[0], "Mul")
    if mul_x is None or x not in mul_x.input:
        return None
    mul_half = _only_consumer(g, mul_x.output[0], "Mul")
    if mul_half is None:
        return None
    half = _scalar_init(g, mul_half.input[1])
    if half is None:
        half = _scalar_init(g, mul_half.input[0])
    if half != 0.5:
        return None
    fused = make_node("Gelu", [x], [mul_half.output[0]],
                      name=erf.name + "_gelu_fused", approximate="none")
    return fused, [div, erf, add1, mul_x, mul_half]


def _shape(g: GraphIR, name):
    return g.tensor_name_shape_map.get(name) or []


def _match_attention(g: GraphIR, softmax):
    """softmax: Softmax(axis=-1) inside the exported eager-attention core

        scores = MatMul(q, kT) [/ sqrt(dh)] [+ mask]
        ctx    = MatMul(Softmax(scores), v)
        out    = Reshape(Transpose(ctx, 0,2,1,3), (B, S, H*dh))

    Fuses the whole chain (7-9 nodes) into ONE FusedAttention node —
    the TPU-native analogue of ORT's attention fusion (reference
    __main__.py:85-89): XLA sees a single softmax-attention block it
    schedules natively, and transformer calibration taps drop the
    interior score/prob tensors exactly as the reference's optimizer
    does.  Returns (fused_node, interior_nodes) or None."""
    s_in = softmax.input[0]
    nd = len(_shape(g, s_in))
    axis = node_attrs(softmax).get("axis", -1)
    if nd != 4 or axis not in (-1, nd - 1):
        return None
    interior = [softmax]
    scale = 1.0
    mask = None
    cur = g.output_map.get(s_in)
    # optional mask add (other operand may be any tensor: fold-resistant
    # constant extended-attention-mask or a dynamic mask input)
    if cur is not None and cur.op_type == "Add" \
            and _only_consumer(g, cur.output[0],
                               "Softmax") is softmax:
        nxt = g.output_map.get(cur.input[0])
        if nxt is not None and nxt.op_type in ("Div", "Mul", "MatMul"):
            mask = cur.input[1]
            interior.append(cur)
            cur = nxt
        else:
            nxt = g.output_map.get(cur.input[1])
            if nxt is not None and nxt.op_type in ("Div", "Mul", "MatMul"):
                mask = cur.input[0]
                interior.append(cur)
                cur = nxt
            else:
                return None
    if cur is None:
        return None
    # optional scalar scaling
    if cur.op_type in ("Div", "Mul"):
        c = _scalar_init(g, cur.input[1])
        if c is None or len(g.input_map.get(cur.output[0], [])) != 1 \
                or cur.output[0] in g.network_outputs:
            return None
        scale = (1.0 / c) if cur.op_type == "Div" else c
        interior.append(cur)
        cur = g.output_map.get(cur.input[0])
        if cur is None:
            return None
    if cur.op_type != "MatMul" \
            or len(g.input_map.get(cur.output[0], [])) != 1 \
            or cur.output[0] in g.network_outputs:
        return None
    scores_mm = cur
    q_name, k_name = scores_mm.input[0], scores_mm.input[1]
    if len(_shape(g, q_name)) != 4:
        return None
    # absorb the key transpose (B,H,S,dh)->(B,H,dh,S) when it is ours alone
    k_transposed = 1
    kt = g.output_map.get(k_name)
    if kt is not None and kt.op_type == "Transpose" \
            and list(node_attrs(kt).get("perm", [])) == [0, 1, 3, 2] \
            and len(g.input_map.get(k_name, [])) == 1 \
            and k_name not in g.network_outputs:
        k_name = kt.input[0]
        k_transposed = 0
        interior.append(kt)

    ctx_mm = _only_consumer(g, softmax.output[0], "MatMul")
    if ctx_mm is None or ctx_mm.input[0] != softmax.output[0]:
        return None
    v_name = ctx_mm.input[1]
    if len(_shape(g, v_name)) != 4:
        return None
    tr = _only_consumer(g, ctx_mm.output[0], "Transpose")
    if tr is None or list(node_attrs(tr).get("perm", [])) != [0, 2, 1, 3]:
        return None
    rs = _only_consumer(g, tr.output[0], "Reshape")
    if rs is None or len(_shape(g, rs.output[0])) != 3:
        return None
    interior += [scores_mm, ctx_mm, tr, rs]
    inputs = [q_name, k_name, v_name] + ([mask] if mask is not None else [])
    fused = make_node("FusedAttention", inputs, [rs.output[0]],
                      name=scores_mm.name + "_attn_fused",
                      scale=float(scale), k_transposed=k_transposed)
    return fused, interior


def optimize_transformer(g: GraphIR) -> int:
    """In-place LayerNorm + GELU + attention fusion; returns the number
    of fused patterns.  Call after simplify_graph (shape maps
    populated)."""
    fused_count = 0
    for matcher, anchor_op in ((_match_layer_norm, "ReduceMean"),
                               (_match_gelu, "Erf"),
                               (_match_attention, "Softmax")):
        while True:
            hit = None
            for node in g.graph.node:
                if node.op_type == anchor_op:
                    hit = matcher(g, node)
                    if hit is not None:
                        break
            if hit is None:
                break
            fused, interior = hit
            idx = g.index(interior[0])
            interior_ids = {id(n) for n in interior}
            keep = [n for n in g.graph.node if id(n) not in interior_ids]
            keep.insert(min(idx, len(keep)), fused)
            del g.graph.node[:]
            g.graph.node.extend(keep)
            g.topologize_graph()
            g.set_index()
            g.get_inp_oup()
            fused_count += 1
    if fused_count:
        from .passes import _prune_unused_initializers
        _prune_unused_initializers(g, list(g.graph.node))
        g.topologize_graph()
        g.set_index()
        g.get_inp_oup()
        logger.info("transformer optimization: fused %d LayerNorm/GELU patterns",
                    fused_count)
    return fused_count

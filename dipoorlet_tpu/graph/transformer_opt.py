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


_SQRT_2_OVER_PI = 0.7978845608028654


def _match_gelu_tanh(g: GraphIR, tanh):
    """tanh: Tanh inside the tanh-approximate GELU (GPT-2's `gelu_new`,
    torch's approximate='tanh'):

        0.5 * x * (1 + tanh(sqrt(2/pi) * (x + 0.044715 * x^3)))

    Exports as Pow/Mul/Add/Mul/Tanh/Add/Mul[/Mul]; both groupings of
    the outer 0.5*x product are accepted.  Fuses to
    Gelu(approximate='tanh') — same erasure ORT's optimizer performs.
    Returns (fused_node, interior_nodes) or None."""
    mul_in = g.output_map.get(tanh.input[0])
    if mul_in is None or mul_in.op_type != "Mul":
        return None
    c = _scalar_init(g, mul_in.input[1])
    inner_name = mul_in.input[0]
    if c is None:
        c = _scalar_init(g, mul_in.input[0])
        inner_name = mul_in.input[1]
    if c is None or abs(c - _SQRT_2_OVER_PI) > 1e-4:
        return None
    add_in = g.output_map.get(inner_name)
    if add_in is None or add_in.op_type != "Add":
        return None

    def _cube_term(name, xcand):
        """name == 0.044715 * Pow(xcand, 3)?  -> (mul3, pow) or None."""
        mul3 = g.output_map.get(name)
        if mul3 is None or mul3.op_type != "Mul":
            return None
        c2 = _scalar_init(g, mul3.input[1])
        pname = mul3.input[0]
        if c2 is None:
            c2 = _scalar_init(g, mul3.input[0])
            pname = mul3.input[1]
        if c2 is None or abs(c2 - 0.044715) > 1e-6:
            return None
        pw = g.output_map.get(pname)
        if pw is None or pw.op_type != "Pow" \
                or _scalar_init(g, pw.input[1]) != 3.0 \
                or pw.input[0] != xcand:
            return None
        return mul3, pw

    a, b = add_in.input[0], add_in.input[1]
    x, hit = a, _cube_term(b, a)
    if hit is None:
        x, hit = b, _cube_term(a, b)
    if hit is None:
        return None
    mul3, pw = hit
    # interior tensors must feed the chain alone
    for n in (pw, mul3, add_in, mul_in):
        if len(g.input_map.get(n.output[0], [])) != 1 \
                or n.output[0] in g.network_outputs:
            return None
    add1 = _only_consumer(g, tanh.output[0], "Add")
    if add1 is None:
        return None
    one = _scalar_init(g, add1.input[1])
    if one is None:
        one = _scalar_init(g, add1.input[0])
    if one != 1.0:
        return None
    mul_out = _only_consumer(g, add1.output[0], "Mul")
    if mul_out is None:
        return None
    other = mul_out.input[0] if mul_out.input[1] == add1.output[0] \
        else mul_out.input[1]
    interior = [pw, mul3, add_in, mul_in, tanh, add1]
    # form A: other operand is a ready-made 0.5*x
    half_mul = g.output_map.get(other)
    if half_mul is not None and half_mul.op_type == "Mul" \
            and other not in g.network_outputs \
            and len(g.input_map.get(other, [])) == 1:
        h = _scalar_init(g, half_mul.input[1])
        xc = half_mul.input[0]
        if h is None:
            h = _scalar_init(g, half_mul.input[0])
            xc = half_mul.input[1]
        if h == 0.5 and xc == x:
            interior += [half_mul, mul_out]
            return make_node("Gelu", [x], [mul_out.output[0]],
                             name=tanh.name + "_gelu_fused",
                             approximate="tanh"), interior
    # form B: (x * (1 + tanh)) then * 0.5
    if other == x:
        mul_half = _only_consumer(g, mul_out.output[0], "Mul")
        if mul_half is not None:
            h = _scalar_init(g, mul_half.input[1])
            if h is None:
                h = _scalar_init(g, mul_half.input[0])
            if h == 0.5:
                interior += [mul_out, mul_half]
                return make_node("Gelu", [x], [mul_half.output[0]],
                                 name=tanh.name + "_gelu_fused",
                                 approximate="tanh"), interior
    return None


def _shape(g: GraphIR, name):
    return g.tensor_name_shape_map.get(name) or []


# wrapper ops absorbable between the scores MatMul and the Softmax
_ATTN_CHAIN_OPS = ("Add", "Where", "Cast", "Div", "Mul", "MatMul")


def _match_attention(g: GraphIR, softmax):
    """softmax: Softmax(axis=-1) inside the exported eager-attention core

        scores = MatMul(q, kT) [/ sqrt(dh)] [+ mask]* [Where(causal, ., min)]
        ctx    = MatMul(Softmax(scores), v)
        out    = Reshape(Transpose(ctx, 0,2,1,3), (B, S, H*dh))

    Fuses the whole chain into ONE FusedAttention node — the TPU-native
    analogue of ORT's attention fusion (reference __main__.py:85-89):
    XLA sees a single softmax-attention block it schedules natively, and
    transformer calibration taps drop the interior score/prob tensors
    exactly as the reference's optimizer does.

    The score chain is walked from the Softmax down to the MatMul,
    absorbing any interleaving of: additive masks (dynamic input or
    constant — BERT's extended attention mask), a constant-condition
    Where select (GPT-2's causal mask: where(tril, scores, finfo.min)
    becomes the additive mask where(tril, 0, finfo.min) — identical
    post-softmax since the blocked logits stay ~finfo.min), a Cast back
    to f32, and scalar Div/Mul scaling.  Masks absorbed between a scale
    and the MatMul are pre-multiplied by the outer scale so the fused
    scores*scale + mask form stays exact.  Returns
    (fused_node, interior_nodes, prelude_nodes, new_inits) or None."""
    s_in = softmax.input[0]
    nd = len(_shape(g, s_in))
    axis = node_attrs(softmax).get("axis", -1)
    if nd != 4 or axis not in (-1, nd - 1):
        return None
    interior = [softmax]
    scale = 1.0
    mask_consts = []   # np float64 additive masks (already scale-adjusted)
    mask_dyn = None    # at most one non-constant additive mask tensor
    cur = g.output_map.get(s_in)
    for _ in range(8):
        if cur is None:
            return None
        if cur.op_type == "MatMul":
            break
        out = cur.output[0]
        if len(g.input_map.get(out, [])) != 1 or out in g.network_outputs:
            return None
        if cur.op_type == "Add":
            a, b = cur.input[0], cur.input[1]

            def _chains(name):
                n = g.output_map.get(name)
                return n is not None and n.op_type in _ATTN_CHAIN_OPS \
                    and name not in g.initializer
            if _chains(a):
                cont, mask_name = a, b
            elif _chains(b):
                cont, mask_name = b, a
            else:
                return None
            if mask_name in g.initializer:
                mask_consts.append(
                    np.asarray(g.get_initializer(mask_name), dtype=np.float64)
                    * scale)
            else:
                # a dynamic mask under an outer scale would need an extra
                # Mul to stay exact — leave that exotic shape unfused
                if mask_dyn is not None or scale != 1.0:
                    return None
                mask_dyn = mask_name
            interior.append(cur)
            cur = g.output_map.get(cont)
        elif cur.op_type == "Where":
            cond, x_t, y_t = cur.input[0], cur.input[1], cur.input[2]
            if cond not in g.initializer:
                return None
            condv = np.asarray(g.get_initializer(cond)).astype(bool)
            y_scalar = _scalar_init(g, y_t)
            x_scalar = _scalar_init(g, x_t)
            if y_scalar is not None and x_t not in g.initializer:
                mask_consts.append(np.where(condv, 0.0, y_scalar) * scale)
                cont = x_t
            elif x_scalar is not None and y_t not in g.initializer:
                mask_consts.append(np.where(condv, x_scalar, 0.0) * scale)
                cont = y_t
            else:
                return None
            interior.append(cur)
            cur = g.output_map.get(cont)
        elif cur.op_type == "Cast":
            if node_attrs(cur).get("to") != 1:  # only f32 round-trips
                return None
            interior.append(cur)
            cur = g.output_map.get(cur.input[0])
        else:  # Div / Mul scalar scaling
            c = _scalar_init(g, cur.input[1])
            cont = cur.input[0]
            if c is None and cur.op_type == "Mul":
                c = _scalar_init(g, cur.input[0])
                cont = cur.input[1]
            if c is None:
                return None
            scale *= (1.0 / c) if cur.op_type == "Div" else c
            interior.append(cur)
            cur = g.output_map.get(cont)
    else:
        return None
    if len(g.input_map.get(cur.output[0], [])) != 1 \
            or cur.output[0] in g.network_outputs:
        return None
    scores_mm = cur

    # resolve the combined additive mask
    prelude = []
    new_inits = {}
    mask = mask_dyn
    if mask_consts:
        total = mask_consts[0]
        for m in mask_consts[1:]:
            total = total + m
        const_name = scores_mm.name + "_attn_mask"
        # summing two finfo.min-carrying masks overflows f32; clamping is
        # post-softmax identical (both give probability 0)
        f32 = np.finfo(np.float32)
        new_inits[const_name] = np.clip(total, f32.min, f32.max).astype(np.float32)
        if mask_dyn is None:
            mask = const_name
        else:
            mask = scores_mm.name + "_attn_mask_combined"
            prelude.append(make_node("Add", [mask_dyn, const_name], [mask],
                                     name=scores_mm.name + "_attn_mask_add"))
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

    # optional probs Cast back to the value dtype (GPT-2's
    # attn_weights.type(value.dtype)) between the Softmax and the ctx MatMul
    probs_name = softmax.output[0]
    pcast = _only_consumer(g, probs_name, "Cast")
    if pcast is not None and node_attrs(pcast).get("to") == 1:
        interior.append(pcast)
        probs_name = pcast.output[0]
    ctx_mm = _only_consumer(g, probs_name, "MatMul")
    if ctx_mm is None or ctx_mm.input[0] != probs_name:
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
    return fused, interior, prelude, new_inits


def optimize_transformer(g: GraphIR) -> int:
    """In-place LayerNorm + GELU + attention fusion; returns the number
    of fused patterns.  Call after simplify_graph (shape maps
    populated)."""
    fused_count = 0
    for matcher, anchor_op in ((_match_layer_norm, "ReduceMean"),
                               (_match_gelu, "Erf"),
                               (_match_gelu_tanh, "Tanh"),
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
            fused, interior = hit[0], hit[1]
            prelude = hit[2] if len(hit) > 2 else []
            for name, arr in (hit[3] if len(hit) > 3 else {}).items():
                g.set_initializer(name, arr)
            idx = g.index(interior[0])
            interior_ids = {id(n) for n in interior}
            keep = [n for n in g.graph.node if id(n) not in interior_ids]
            keep[min(idx, len(keep)):min(idx, len(keep))] = \
                list(prelude) + [fused]
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

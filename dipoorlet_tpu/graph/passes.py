"""Import-time graph passes: constant folding, Identity/Dropout elision and
shape inference by abstract evaluation.

Together these replace onnxsim.simplify + onnx shape_inference as used at
reference __main__.py:99-102 — but built on our own op library, so the set
of foldable ops automatically matches the set of executable ops."""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax

from ..onnx_ir.helper import NP_TO_ONNX
from ..ops import OP_REGISTRY, STATIC_INPUTS, OpContext
from .graph import GraphIR, node_attrs

_ELIDE = {"Identity", "Dropout"}
# Ops we never fold even with constant inputs (huge outputs / no benefit)
_NO_FOLD = {"ConstantOfShape"} - {"ConstantOfShape"}


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def _np_eval(fn, ctx, args):
    """Evaluate an op on host values. Pinned to the CPU backend when
    available — folding must never dispatch tiny eager ops to a (possibly
    remote) accelerator."""
    cpu = _cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            out = fn(ctx, *args)
    else:
        out = fn(ctx, *args)
    if isinstance(out, tuple):
        return tuple(np.asarray(o) for o in out)
    return np.asarray(out)


def simplify_graph(graph: GraphIR, fold_constants: bool = True) -> GraphIR:
    """In-place: fold constants, elide Identity/Dropout, infer all shapes."""
    g = graph
    opset = 13
    for o in g.model.opset_import:
        if o.domain == "":
            opset = o.version

    rename: Dict[str, str] = {}
    shapes: Dict[str, tuple] = {}
    dtypes: Dict[str, np.dtype] = {}
    consts: Dict[str, np.ndarray] = dict(g.initializer)

    for name in g.network_inputs:
        shp = tuple(g.get_tensor_shape(name))
        shapes[name] = shp
        from ..onnx_ir.helper import ONNX_TO_NP
        dtypes[name] = ONNX_TO_NP.get(g.get_value_type(name), np.dtype(np.float32))

    new_nodes = []
    out_names = set(g.network_outputs)

    for node in g.topo_sort():
        # apply pending renames
        for i, inp in enumerate(node.input):
            if inp in rename:
                node.input[i] = rename[inp]

        # elide Identity/Dropout (keep if output is a network output)
        if node.op_type in _ELIDE:
            src = node.input[0]
            if node.output[0] in out_names:
                if src in consts:
                    # promote to initializer copy, drop node
                    consts[node.output[0]] = consts[src]
                    g.set_initializer(node.output[0], consts[src])
                    continue
                new_nodes.append(node)
                shapes[node.output[0]] = shapes.get(src)
                dtypes[node.output[0]] = dtypes.get(src)
                continue
            rename[node.output[0]] = src
            if len(node.output) > 1 and node.output[1]:
                rename[node.output[1]] = src  # dropout mask unused in inference
            continue

        if node.op_type in ("If", "Loop", "Scan"):
            # subgraph control flow: never folded; output shapes come from
            # abstract evaluation of the subgraph closure (captures resolve
            # against the outer shapes known at this point of topo order).
            # Captured names hit by Identity/Dropout elision must be
            # rewritten inside the subgraphs too, or both this shape lookup
            # and the executor's runtime capture would miss them.
            from ..runtime.control_flow import (abstract_outputs,
                                               rewrite_subgraph_captures)
            if rename:
                rewrite_subgraph_captures(node, rename)

            def lookup_aval(name):
                if name in consts:
                    return consts[name]
                if name not in shapes or shapes[name] is None:
                    raise ValueError(
                        f"missing shape for tensor '{name}' feeding "
                        f"control-flow node {node.name}")
                return jax.ShapeDtypeStruct(shapes[name], dtypes[name])

            outs = abstract_outputs(node, opset, lookup_aval)
            outs = outs if isinstance(outs, tuple) else (outs,)
            for out_name, av in zip(node.output, outs):
                if out_name:
                    shapes[out_name] = tuple(av.shape)
                    dtypes[out_name] = np.dtype(av.dtype)
            new_nodes.append(node)
            continue

        fn = OP_REGISTRY.get(node.op_type)
        if fn is None:
            raise NotImplementedError(f"op '{node.op_type}' (node {node.name}) not implemented")

        static_set = STATIC_INPUTS.get(node.op_type, set())
        attrs = node_attrs(node)

        input_vals = []
        all_const = True
        for i, inp in enumerate(node.input):
            if inp == "":
                input_vals.append(None)
                continue
            if inp in consts:
                input_vals.append(consts[inp])
            else:
                input_vals.append(inp)  # placeholder name
                all_const = False

        # Shape/Size depend only on input *shape*, foldable once shapes known
        shape_foldable = node.op_type in ("Shape", "Size") and node.input[0] in shapes

        if fold_constants and (all_const or shape_foldable) and node.op_type not in _NO_FOLD:
            if shape_foldable and not all_const:
                x_shape = shapes[node.input[0]]
                if node.op_type == "Shape":
                    start = attrs.get("start", 0)
                    end = attrs.get("end", None)
                    val = np.asarray(list(x_shape)[start:end], dtype=np.int64)
                else:
                    val = np.asarray(int(np.prod(x_shape)), dtype=np.int64)
                results = val
            else:
                statics = {i: input_vals[i] for i in static_set
                           if i < len(input_vals) and input_vals[i] is not None}
                ctx = OpContext(attrs, node=node, statics=statics, opset=opset)
                args = list(input_vals)
                while args and args[-1] is None:
                    args.pop()
                results = _np_eval(fn, ctx, args)
            outs = results if isinstance(results, tuple) else (results,)
            for out_name, val in zip(node.output, outs):
                if not out_name:
                    continue
                val = np.asarray(val)
                consts[out_name] = val
                g.set_initializer(out_name, val)
                shapes[out_name] = tuple(val.shape)
                dtypes[out_name] = val.dtype
            continue

        # abstract evaluation for shape inference
        statics = {}
        tracer_args = []
        for i, inp in enumerate(node.input):
            if inp == "":
                tracer_args.append(None)
            elif i in static_set:
                if not isinstance(input_vals[i], np.ndarray):
                    raise ValueError(
                        f"node {node.name} ({node.op_type}) input #{i} '{inp}' is dynamic but "
                        f"must be a constant")
                statics[i] = input_vals[i]
                tracer_args.append(input_vals[i])
            elif isinstance(input_vals[i], np.ndarray):
                tracer_args.append(jax.ShapeDtypeStruct(input_vals[i].shape, input_vals[i].dtype))
            else:
                if inp not in shapes or shapes[inp] is None:
                    raise ValueError(f"missing shape for tensor '{inp}' feeding node {node.name}")
                tracer_args.append(jax.ShapeDtypeStruct(shapes[inp], dtypes[inp]))
        while tracer_args and tracer_args[-1] is None:
            tracer_args.pop()
        ctx = OpContext(attrs, node=node, statics=statics, opset=opset)

        # static (host) operands must be closed over, NOT passed through
        # eval_shape (which would abstract them into tracers)
        dyn_idx = [i for i, a in enumerate(tracer_args)
                   if isinstance(a, jax.ShapeDtypeStruct)]
        fixed = list(tracer_args)

        def _absfn(*dyn):
            full = list(fixed)
            for i, v in zip(dyn_idx, dyn):
                full[i] = v
            return fn(ctx, *full)

        abstract = jax.eval_shape(_absfn, *[tracer_args[i] for i in dyn_idx])
        outs = abstract if isinstance(abstract, tuple) else (abstract,)
        for out_name, av in zip(node.output, outs):
            if not out_name:
                continue
            shapes[out_name] = tuple(av.shape)
            dtypes[out_name] = np.dtype(av.dtype)
        new_nodes.append(node)

    # rename network outputs if they pointed at elided nodes
    for i, out in enumerate(g.network_outputs):
        if out in rename:
            tgt = rename[out]
            g.graph.output[i].name = tgt
            g.network_outputs[i] = tgt

    g.graph.node = new_nodes
    _prune_unused_initializers(g, new_nodes)
    g.topologize_graph()
    g.set_index()
    g.get_inp_oup()

    for name, shp in shapes.items():
        g.tensor_name_shape_map[name] = list(shp) if shp is not None else None
    for name, dt in dtypes.items():
        if dt is not None and dt in NP_TO_ONNX:
            g.value_name_type_map[name] = NP_TO_ONNX[dt]
    return g


def _prune_unused_initializers(g: GraphIR, nodes):
    used = set()
    for node in nodes:
        used.update(n for n in node.input if n)
        if node.op_type in ("If", "Loop", "Scan"):
            # subgraphs capture outer initializers by name
            from ..runtime.control_flow import subgraph_tensor_names
            used |= subgraph_tensor_names(node)
    used.update(g.network_outputs)
    keep = [t for t in g.graph.initializer if t.name in used]
    if len(keep) != len(g.graph.initializer):
        g.graph.initializer = keep
    g.prepare_initializer()


# ---------------------------------------------------------------------------
# Detection-graph truncation
# ---------------------------------------------------------------------------
# Ops whose ONNX output size is data-dependent: ORT (the reference's
# substrate, forward_net.py:195-201) materializes them dynamically, XLA
# cannot.  Our op library executes them with a fixed-size padded output
# (ops/detection.py), which is fine standalone but poisons any consumer
# arithmetic — so for calibration/profiling the CLI cuts the graph just
# before them and quantizes the statically-meaningful backbone+head (what
# an actual TPU/TRT deployment quantizes; NMS runs as postprocess).
DYNAMIC_OUTPUT_OPS = {"NonMaxSuppression"}


def truncate_for_static_execution(g: GraphIR):
    """Remove every node at-or-downstream-of a dynamic-output op and
    promote the cut tensors (kept-node outputs the removed subgraph
    consumed) to graph outputs.  Returns the sorted list of removed node
    names ([] when the graph has no dynamic-output op)."""
    from ..onnx_ir import make_tensor_value_info
    seeds = [n for n in g.graph.node if n.op_type in DYNAMIC_OUTPUT_OPS]
    if not seeds:
        return []
    removed = {n.name for n in seeds}
    dyn_tensors = {t for n in seeds for t in n.output if t}
    for node in g.graph.node:  # topo order: one forward sweep closes the set
        if node.name in removed:
            continue
        if any(i in dyn_tensors for i in node.input):
            removed.add(node.name)
            dyn_tensors.update(t for t in node.output if t)

    kept_nodes = [n for n in g.graph.node if n.name not in removed]
    kept_outputs = {t for n in kept_nodes for t in n.output if t}
    cut_tensors = []
    for node in g.graph.node:
        if node.name not in removed:
            continue
        for t in node.input:
            if t and t in kept_outputs and t not in cut_tensors:
                cut_tensors.append(t)

    for name in list(g.network_outputs):
        if name not in kept_outputs:
            g.del_network_output(name)
    for t in cut_tensors:
        if t not in g.network_outputs:
            dtype = g.value_name_type_map.get(t, 1)  # default FLOAT
            g.add_network_output(
                make_tensor_value_info(t, dtype, g.tensor_name_shape_map.get(t)))

    g.graph.node = kept_nodes
    _prune_unused_initializers(g, kept_nodes)
    g.update_model()
    g.get_inp_oup()
    return sorted(removed)

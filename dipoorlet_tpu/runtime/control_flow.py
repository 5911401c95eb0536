"""ONNX subgraph control flow (If / Loop / Scan) as XLA control flow.

The reference executes these through onnxruntime
(/root/reference/dipoorlet/forward_net.py:195-201).  Here the subgraphs
compile into the SAME traced program as the rest of the graph:

  * If    -> lax.cond        (both branches must produce identical
                              shapes/dtypes — the static-XLA contract)
  * Loop  -> lax.scan        (trip count must be a graph constant and the
                              loop condition constantly true — dynamic
                              early exit is data-dependent shape territory)
  * Scan  -> lax.scan        (axes 0, forward/reverse directions)

Outer-scope capture: ONNX subgraphs reference enclosing-graph tensors by
name.  Capture resolution happens at trace time — the subgraph body is a
closure over the outer env — so captures cost nothing extra in the
compiled program.

Calibration taps only top-level tensors, matching the reference: ORT's
"promote every intermediate to graph output" trick also only reaches the
top-level graph (forward_net.py:195-198), so subgraph-internal tensors
are not calibration targets there either.  Quantization likewise inserts
Q/DQ only at top-level tensors.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..graph.graph import node_attrs
from ..onnx_ir import tensor_to_array
from ..ops import OP_REGISTRY, STATIC_INPUTS, OpContext

CONTROL_FLOW_OPS = ("If", "Loop", "Scan")


class SubPlan:
    """Executable plan for one subgraph (GraphProto attribute).

    formal_inputs: the subgraph's declared inputs (graph.input order);
    everything else referenced by its nodes resolves, in order, from the
    subgraph's own initializers, then the OUTER lookup (env/params/
    initializers of the enclosing executor) at trace time."""

    def __init__(self, graph_proto, opset: int):
        self.graph = graph_proto
        self.opset = opset
        self.formal_inputs = [vi.name for vi in graph_proto.input]
        self.outputs = [vi.name for vi in graph_proto.output]
        self.initializers = {t.name: tensor_to_array(t)
                             for t in graph_proto.initializer}
        self.steps: List = []
        produced = set(self.formal_inputs) | set(self.initializers)
        self.captures: List[str] = []
        cap_seen = set()
        # ONNX subgraph nodes are topologically sorted by spec
        for node in graph_proto.node:
            fn, needs_env = resolve_op(node, opset)
            static_set = STATIC_INPUTS.get(node.op_type, set()) \
                if not needs_env else set()
            statics = {}
            refs = [n for n in node.input if n]
            if needs_env:
                # nested control flow: its subgraph captures also resolve
                # through THIS scope (and transitively outward)
                refs += sorted(control_flow_captures(node, opset))
            for i, name in enumerate(node.input):
                if not name:
                    continue
                if i in static_set:
                    if name in self.initializers:
                        statics[i] = self.initializers[name]
                    else:
                        raise NotImplementedError(
                            f"subgraph node {node.name} ({node.op_type}) input "
                            f"#{i} '{name}' must be a subgraph constant")
            for name in refs:
                if name not in produced and name not in cap_seen:
                    self.captures.append(name)
                    cap_seen.add(name)
            produced.update(o for o in node.output if o)
            ctx = OpContext(node_attrs(node), node=node, statics=statics,
                            opset=opset)
            self.steps.append((node, fn, ctx, static_set, needs_env))
        for name in self.outputs:
            if name not in produced and name not in cap_seen:
                self.captures.append(name)
                cap_seen.add(name)

    def run(self, formal_vals: List, outer_lookup) -> tuple:
        """Execute the subgraph; formal_vals align with formal_inputs,
        outer_lookup(name) resolves captured outer-scope tensors."""
        env: Dict = dict(zip(self.formal_inputs, formal_vals))
        for name in self.captures:
            env[name] = outer_lookup(name)
        for node, fn, ctx, static_set, needs_env in self.steps:
            args = []
            for i, name in enumerate(node.input):
                if not name:
                    args.append(None)
                elif i in static_set:
                    args.append(ctx.statics[i])
                elif name in env:
                    args.append(env[name])
                else:
                    args.append(jnp.asarray(self.initializers[name]))
            while args and args[-1] is None:
                args.pop()
            if needs_env:
                result = fn(ctx, env.__getitem__, *args)
            else:
                result = fn(ctx, *args)
            outs = result if isinstance(result, tuple) else (result,)
            for out_name, val in zip(node.output, outs):
                if out_name:
                    env[out_name] = val
        return tuple(env[name] for name in self.outputs)


def resolve_op(node, opset: int):
    """(fn, needs_env) for a node: control-flow builders get an env lookup
    as their second argument; plain registry ops don't."""
    if node.op_type in CONTROL_FLOW_OPS:
        return make_control_flow_fn(node, opset), True
    fn = OP_REGISTRY.get(node.op_type)
    if fn is None:
        raise NotImplementedError(
            f"op '{node.op_type}' (node {node.name}) has no JAX "
            f"implementation. dipoorlet_tpu covers the CNN, "
            f"transformer-encoder, recurrent (LSTM/GRU), detection and "
            f"subgraph-control-flow (If/Loop/Scan) families "
            f"({len(OP_REGISTRY)} ops); see README's scope contract")
    return fn, False


def make_control_flow_fn(node, opset: int):
    attrs = node_attrs(node)
    if node.op_type == "If":
        then_plan = SubPlan(attrs["then_branch"], opset)
        else_plan = SubPlan(attrs["else_branch"], opset)

        def if_fn(ctx, lookup, cond):
            pred = jnp.squeeze(jnp.asarray(cond)).astype(bool)
            out = lax.cond(pred,
                           lambda: then_plan.run([], lookup),
                           lambda: else_plan.run([], lookup))
            return out if len(out) > 1 else out[0]

        return if_fn

    if node.op_type == "Loop":
        body = SubPlan(attrs["body"], opset)
        # body inputs: (iteration_num, cond_in, *loop_vars)
        # body outputs: (cond_out, *loop_vars_out, *scan_outputs)
        n_loop_vars = len(body.formal_inputs) - 2
        if not _loop_cond_out_trivially_true(body):
            raise NotImplementedError(
                f"Loop node {node.name}: body's cond_out "
                f"'{body.outputs[0]}' is computed, not an Identity of "
                f"cond_in / constant true — the loop may genuinely exit "
                f"early, which lax.scan over a static trip count cannot "
                f"express; refusing to silently run all {'{M}'} iterations")

        def loop_fn(ctx, lookup, trip_count=None, cond=None, *loop_vars):
            if trip_count is None:
                raise NotImplementedError(
                    f"Loop node {node.name}: a static trip count (M) is "
                    f"required — while(cond)-style loops have data-dependent "
                    f"iteration counts, outside the static-XLA contract")
            m = int(np.asarray(trip_count).reshape(-1)[0])
            if cond is not None:
                c0 = np.asarray(cond).reshape(-1)
                if c0.size and not bool(c0[0]):
                    raise NotImplementedError(
                        f"Loop node {node.name}: initial cond must be true "
                        f"(static-trip-count contract)")

            def step(carry, it):
                # ONNX declares the iteration counter int64; without
                # jax_enable_x64 it computes in int32 (documented in the
                # NMS index-dtype note) — exact for any real trip count
                outs = body.run([it, jnp.asarray(True), *carry], lookup)
                # cond_out (outs[0]) must stay true under the contract; it
                # cannot be branched on inside a scan without dynamic shapes
                new_carry = list(outs[1:1 + n_loop_vars])
                scan_out = tuple(outs[1 + n_loop_vars:])
                return new_carry, scan_out

            carry, stacked = lax.scan(step, list(loop_vars),
                                      jnp.arange(m, dtype=jnp.int32))
            result = tuple(carry) + tuple(stacked)
            return result if len(result) > 1 else result[0]

        return loop_fn

    # Scan
    body = SubPlan(attrs["body"], opset)
    num_scan = int(attrs["num_scan_inputs"])
    n_state = len(body.formal_inputs) - num_scan
    n_scan_out = len(body.outputs) - n_state
    in_dirs = list(attrs.get("scan_input_directions", [0] * num_scan))
    out_dirs = list(attrs.get("scan_output_directions", [0] * n_scan_out))
    in_axes = list(attrs.get("scan_input_axes", [0] * num_scan))
    out_axes = list(attrs.get("scan_output_axes", [0] * n_scan_out))
    if any(a != 0 for a in in_axes + out_axes):
        raise NotImplementedError(
            f"Scan node {node.name}: only axis-0 scan inputs/outputs are "
            f"supported")

    def scan_fn(ctx, lookup, *inputs):
        states = list(inputs[:n_state])
        xs = [jnp.flip(x, 0) if in_dirs[i] else x
              for i, x in enumerate(inputs[n_state:])]

        def step(carry, x_elems):
            outs = body.run(list(carry) + list(x_elems), lookup)
            return list(outs[:n_state]), tuple(outs[n_state:])

        carry, stacked = lax.scan(step, states, tuple(xs))
        stacked = tuple(jnp.flip(y, 0) if out_dirs[i] else y
                        for i, y in enumerate(stacked))
        result = tuple(carry) + stacked
        return result if len(result) > 1 else result[0]

    return scan_fn


def abstract_outputs(node, opset: int, lookup_aval):
    """Output ShapeDtypeStructs of a control-flow node for shape inference
    (graph/passes.py): lookup_aval(name) -> jax.ShapeDtypeStruct | ndarray
    for the node's inputs AND any subgraph-captured outer tensors."""
    fn = make_control_flow_fn(node, opset)
    in_avals = [lookup_aval(n) if n else None for n in node.input]

    def lookup(name):
        v = lookup_aval(name)
        if isinstance(v, jax.ShapeDtypeStruct):
            return jnp.zeros(v.shape, v.dtype)
        return jnp.asarray(v)

    # If/Loop consume trip counts / conds as CONCRETE hosts where required:
    # pass ndarrays through, abstract the rest
    dyn_idx = [i for i, a in enumerate(in_avals)
               if isinstance(a, jax.ShapeDtypeStruct)]
    fixed = list(in_avals)

    def _absfn(*dyn):
        full = list(fixed)
        for i, v in zip(dyn_idx, dyn):
            full[i] = v
        while full and full[-1] is None:
            full.pop()
        return fn(None, lookup, *full)

    return jax.eval_shape(_absfn, *[in_avals[i] for i in dyn_idx])


def _loop_cond_out_trivially_true(body: SubPlan) -> bool:
    """True when the Loop body's cond_out is provably constant-true: an
    Identity/Cast chain from cond_in, a true initializer, or a true
    Constant node.  This is the contract under which lowering Loop to a
    fixed-trip-count lax.scan is exact; anything else could exit early
    under ORT semantics and must fail loudly at build time (not return
    silently-different values)."""
    producers = {}
    for n in body.graph.node:
        for o in n.output:
            if o:
                producers[o] = n
    name = body.outputs[0]
    for _ in range(len(body.graph.node) + 1):
        if len(body.formal_inputs) >= 2 and name == body.formal_inputs[1]:
            return True  # cond_out == cond_in; scan re-feeds True each step
        if name in body.initializers:
            v = np.asarray(body.initializers[name]).reshape(-1)
            return bool(v.size) and bool(v[0])
        n = producers.get(name)
        if n is None:
            return False  # captured outer tensor: unprovable
        if n.op_type in ("Identity", "Cast"):
            name = n.input[0]
            continue
        if n.op_type == "Constant":
            t = node_attrs(n).get("value")
            if t is None:
                return False
            v = np.asarray(tensor_to_array(t)).reshape(-1)
            return bool(v.size) and bool(v[0])
        return False
    return False


def _attr_graphs(a):
    return ([a.g] if a.g is not None and a.g.node else []) + list(a.graphs)


def node_captures(node) -> set:
    """Syntactic outer-scope captures of a control-flow node: names its
    subgraphs reference but do not themselves produce (formal inputs,
    initializers, node outputs — which shadow outer scope per ONNX spec).
    Unlike control_flow_captures this never resolves ops, so it is safe
    for structural passes (topo_sort) on graphs with unsupported ops."""
    caps = set()
    for a in node.attribute:
        for g in _attr_graphs(a):
            caps |= _graph_captures(g)
    return caps


def _graph_captures(g) -> set:
    produced = {vi.name for vi in g.input} | {t.name for t in g.initializer}
    for n in g.node:
        produced.update(o for o in n.output if o)
    caps = set()
    for n in g.node:
        caps.update(i for i in n.input if i and i not in produced)
        for a in n.attribute:
            for sg in _attr_graphs(a):
                caps |= {c for c in _graph_captures(sg) if c not in produced}
    caps.update(o.name for o in g.output if o.name and o.name not in produced)
    return caps


def rewrite_subgraph_captures(node, rename: dict) -> None:
    """Apply an outer-scope rename map (Identity/Dropout elision,
    graph/passes.py) to captured names inside a control-flow node's
    subgraphs, recursively.  Names the subgraph itself produces shadow
    the outer scope (ONNX allows this) and are left untouched."""
    for a in node.attribute:
        for g in _attr_graphs(a):
            _rewrite_graph_captures(g, rename)


def _rewrite_graph_captures(g, rename: dict) -> None:
    produced = {vi.name for vi in g.input} | {t.name for t in g.initializer}
    for n in g.node:
        produced.update(o for o in n.output if o)
    eff = {k: v for k, v in rename.items() if k not in produced}
    if not eff:
        return
    for n in g.node:
        for i, inp in enumerate(n.input):
            if inp in eff:
                n.input[i] = eff[inp]
        for a in n.attribute:
            for sg in _attr_graphs(a):
                _rewrite_graph_captures(sg, eff)
    for o in g.output:
        if o.name in eff:
            o.name = eff[o.name]


def control_flow_captures(node, opset: int) -> set:
    """The true outer-scope captures of a control-flow node: union of its
    subgraphs' capture lists (internally-produced subgraph tensors are
    excluded, unlike subgraph_tensor_names)."""
    caps = set()
    for a in node.attribute:
        for g in ([a.g] if a.g is not None and a.g.node else []) + list(a.graphs):
            caps |= set(SubPlan(g, opset).captures)
    return caps


def subgraph_tensor_names(node) -> set:
    """All tensor names referenced inside a control-flow node's subgraphs
    (for initializer pruning: outer initializers may be captured)."""
    out = set()
    for a in node.attribute:
        for g in ([a.g] if a.g is not None and a.g.node else []) + list(a.graphs):
            for n in g.node:
                out.update(i for i in n.input if i)
                for aa in n.attribute:
                    if (aa.g is not None and aa.g.node) or aa.graphs:
                        out |= subgraph_tensor_names(n)
    return out

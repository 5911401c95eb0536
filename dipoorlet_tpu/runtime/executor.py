"""Graph executor: compiles a GraphIR into a single jittable JAX function.

Replaces the reference's onnxruntime InferenceSession usage
(/root/reference/dipoorlet/forward_net.py:195-201) with one traced XLA
program.  Key differences, by design:

  * Activation statistics are computed INSIDE the traced program via
    `tap_transform`, so whole-tensor activations never hit the host
    (the reference promotes every tensor to a graph output and loops
    over them in numpy — forward_net.py:195-237).
  * Initializers live in a params pytree: weight updates (AdaRound,
    BiasCorrection, BN-update) re-run the same compiled program without
    recompilation.
  * Batching is `jax.vmap` over the sample axis, so per-sample ONNX
    shapes hold exactly while XLA still sees large batched convs.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.graph import GraphIR, node_attrs
from ..ops import OP_REGISTRY, STATIC_INPUTS, OpContext


class Step:
    __slots__ = ("name", "op_type", "fn", "ctx", "inputs", "outputs",
                 "static_idx", "needs_env")

    def __init__(self, name, op_type, fn, ctx, inputs, outputs, static_idx,
                 needs_env=False):
        self.name = name
        self.op_type = op_type
        self.fn = fn
        self.ctx = ctx
        self.inputs = inputs
        self.outputs = outputs
        self.static_idx = static_idx
        self.needs_env = needs_env


class Executor:
    """Executable plan for a GraphIR.

    forward(params, inputs, taps=...) where params/inputs are dicts of
    jnp arrays; returns (outputs_dict, taps_dict).
    """

    def __init__(self, graph: GraphIR, opset: Optional[int] = None):
        self.graph = graph
        if opset is None:
            opset = 13
            for o in graph.model.opset_import:
                if o.domain == "":
                    opset = o.version
        self.opset = opset
        self.steps: List[Step] = []
        self.param_names: List[str] = []
        self._build_plan()

    def _build_plan(self):
        g = self.graph
        traced_inits = set()
        for node in g.topo_sort():
            from .control_flow import resolve_op, subgraph_tensor_names
            fn, needs_env = resolve_op(node, self.opset)
            if needs_env:
                # subgraph captures of outer initializers must enter params
                # so weight updates reach the compiled subgraph too
                for name in subgraph_tensor_names(node):
                    if name in g.initializer:
                        traced_inits.add(name)
                ctx = OpContext(node_attrs(node), node=node, opset=self.opset)
                self.steps.append(Step(node.name, node.op_type, fn, ctx,
                                       list(node.input), list(node.output),
                                       set(), needs_env=True))
                continue
            static_set = STATIC_INPUTS.get(node.op_type, set())
            statics = {}
            inputs = list(node.input)
            for i, name in enumerate(inputs):
                if name == "":
                    continue
                if i in static_set:
                    if name in g.initializer:
                        statics[i] = g.initializer[name]
                    else:
                        raise ValueError(
                            f"node {node.name} ({node.op_type}) input #{i} '{name}' must be a "
                            f"graph constant; run constant folding first")
                elif name in g.initializer:
                    traced_inits.add(name)
            ctx = OpContext(node_attrs(node), node=node, statics=statics, opset=self.opset)
            self.steps.append(Step(node.name, node.op_type, fn, ctx, inputs,
                                   list(node.output), static_set))
        self.param_names = sorted(traced_inits)

    # ------------------------------------------------------------------
    def init_params(self, dtype=None) -> Dict[str, np.ndarray]:
        params = {}
        for name in self.param_names:
            arr = self.graph.initializer[name]
            if dtype is not None and np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(dtype)
            params[name] = arr
        return params

    def input_shapes(self) -> Dict[str, Tuple[int, ...]]:
        return {name: tuple(self.graph.get_tensor_shape(name))
                for name in self.graph.network_inputs}

    # ------------------------------------------------------------------
    def forward(self, params: Dict, inputs: Dict, taps: Sequence[str] = (),
                tap_transform: Optional[Callable] = None,
                outputs: Optional[Sequence[str]] = None):
        """Single-sample forward. Traced-friendly: call under jit/vmap."""
        env = dict(inputs)
        self._cast_network_inputs(env)
        taps = set(taps)
        tap_out = {}
        want_outputs = list(outputs) if outputs is not None else list(self.graph.network_outputs)
        for name in list(env):
            if name in taps:
                tap_out[name] = tap_transform(name, env[name]) if tap_transform else env[name]
        self._run_steps(self.steps, params, env, taps, tap_transform, tap_out)
        out = {name: env[name] for name in want_outputs if name in env}
        return out, tap_out

    def _cast_network_inputs(self, env):
        """Cast fed inputs to the graph's declared dtypes: the calibration
        data format is raw float32 (reference forward_net.py:459-464), so
        integer-input models (token ids -> Gather embeddings) receive
        floats that must become indices."""
        from ..onnx_ir.helper import ONNX_TO_NP
        for name in self.graph.network_inputs:
            if name in env:
                want = ONNX_TO_NP.get(self.graph.get_value_type(name))
                arr = jnp.asarray(env[name])
                # cast only float-fed INTEGER inputs (token ids -> indices);
                # float-declared inputs keep whatever compute dtype the
                # runner chose (bf16 calibration).  jnp.issubdtype, not np:
                # bfloat16 is an ml_dtypes type numpy doesn't class as
                # floating.
                if want is not None and jnp.issubdtype(jnp.dtype(want), jnp.integer) \
                        and arr.dtype != jnp.dtype(want) \
                        and jnp.issubdtype(arr.dtype, jnp.floating):
                    env[name] = arr.astype(want)

    def _run_steps(self, steps, params, env, taps, tap_transform, tap_out):
        """Evaluate `steps` in order, reading/writing the tensor env in place."""
        for step in steps:
            args = []
            for i, name in enumerate(step.inputs):
                if name == "":
                    args.append(None)
                elif i in step.static_idx:
                    args.append(step.ctx.statics[i])
                elif name in env:
                    args.append(env[name])
                elif name in params:
                    args.append(params[name])
                else:
                    args.append(jnp.asarray(self.graph.initializer[name]))
            # strip trailing Nones (optional inputs)
            while args and args[-1] is None:
                args.pop()
            if step.needs_env:
                def lookup(name, _env=env, _params=params):
                    if name in _env:
                        return _env[name]
                    if name in _params:
                        return _params[name]
                    return jnp.asarray(self.graph.initializer[name])
                result = step.fn(step.ctx, lookup, *args)
            else:
                result = step.fn(step.ctx, *args)
            if isinstance(result, tuple):
                for out_name, val in zip(step.outputs, result):
                    if out_name:
                        env[out_name] = val
            else:
                env[step.outputs[0]] = result
            for out_name in step.outputs:
                if out_name in taps and out_name in env:
                    tap_out[out_name] = (tap_transform(out_name, env[out_name])
                                         if tap_transform else env[out_name])

    def make_batched(self, taps: Sequence[str] = (), tap_transform: Optional[Callable] = None,
                     outputs: Optional[Sequence[str]] = None, jit: bool = True):
        """Returns fn(params, batched_inputs) vmapped over the sample axis.

        batched_inputs arrays have shape (B, *declared_shape)."""
        def single(params, inputs):
            return self.forward(params, inputs, taps=taps, tap_transform=tap_transform,
                                outputs=outputs)

        batched = jax.vmap(single, in_axes=(None, 0))
        if jit:
            batched = jax.jit(batched)
        return batched

    # -- segment execution (frontier replay) ---------------------------
    def producer_pos(self) -> Dict[str, int]:
        """tensor name -> index of the step producing it (graph inputs: -1)."""
        pos = {name: -1 for name in self.graph.network_inputs}
        for i, step in enumerate(self.steps):
            for out in step.outputs:
                if out:
                    pos[out] = i
        return pos

    def make_segment_batched(self, start: int, stop: int, taps: Sequence[str] = (),
                             tap_transform: Optional[Callable] = None,
                             keeps: Sequence[str] = (), jit: bool = True):
        """Returns fn(params, frontier_batch) -> (taps_dict, keeps_dict)
        evaluating steps[start:stop] from a mid-graph cut.

        frontier_batch maps every tensor live at the cut to a (B, *shape)
        array; keeps selects the tensors (frontier or segment outputs) to
        carry to the next cut. This is what lets an activation provider
        evaluate each node once per sweep instead of once per prefix replay
        (the reference caches per-node ORT outputs for the same reason,
        forward_net.py:23-189)."""
        seg = self.steps[start:stop]
        taps_t, keeps_t = tuple(taps), tuple(keeps)

        def single(params, frontier):
            env = dict(frontier)
            if start == 0:
                self._cast_network_inputs(env)
            tap_out = {}
            tset = set(taps_t)
            for name in list(env):
                if name in tset:
                    tap_out[name] = (tap_transform(name, env[name])
                                     if tap_transform else env[name])
            self._run_steps(seg, params, env, tset, tap_transform, tap_out)
            return tap_out, {n: env[n] for n in keeps_t}

        fn = jax.vmap(single, in_axes=(None, 0))
        if jit:
            fn = jax.jit(fn)
        return fn

    def all_tensor_names(self) -> List[str]:
        names = list(self.graph.network_inputs)
        for step in self.steps:
            for out in step.outputs:
                if out:
                    names.append(out)
        return names

"""Op registry mapping ONNX op_type -> JAX implementation.

Each implementation has signature  fn(ctx, *inputs) -> Array | tuple[Array]
where ctx carries the node's attributes and static (host-side) operand
values.  Inputs listed in STATIC_INPUTS are delivered as numpy arrays
(graph constants: Reshape targets, Slice indices, ...), everything else
as traced JAX arrays.

This layer replaces the reference's onnxruntime execution substrate
(/root/reference/dipoorlet/forward_net.py:35,98) with XLA-compiled JAX.
"""
from __future__ import annotations

from typing import Callable, Dict, Set


OP_REGISTRY: Dict[str, Callable] = {}
# op_type -> set of input indices that must be static host values
STATIC_INPUTS: Dict[str, Set[int]] = {}


class OpContext:
    __slots__ = ("attrs", "node", "statics", "input_shapes", "opset")

    def __init__(self, attrs, node=None, statics=None, input_shapes=None, opset=13):
        self.attrs = attrs
        self.node = node
        self.statics = statics or {}
        self.input_shapes = input_shapes
        self.opset = opset


def register(op_type, static_inputs=()):
    def deco(fn):
        OP_REGISTRY[op_type] = fn
        if static_inputs:
            STATIC_INPUTS[op_type] = set(static_inputs)
        return fn
    return deco


def get_op(op_type: str) -> Callable:
    fn = OP_REGISTRY.get(op_type)
    if fn is None:
        raise NotImplementedError(f"ONNX op '{op_type}' is not implemented in dipoorlet_tpu.ops")
    return fn

"""JAX implementations of ONNX operators (the TPU execution substrate)."""
from .registry import OP_REGISTRY, STATIC_INPUTS, OpContext, get_op, register  # noqa: F401
from . import nn, math_ops, tensor_ops, quant_ops, detection, recurrent  # noqa: F401

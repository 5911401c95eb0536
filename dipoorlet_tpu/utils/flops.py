"""Static FLOP / byte counting over a GraphIR (per ONNX-declared sample).

Used by bench.py to turn measured pass times into achieved-FLOP/s and
fraction-of-roofline numbers.  Counts multiply-accumulates as 2 FLOPs.
Elementwise/pool ops are counted as bandwidth, not FLOPs: on TPU they
fuse into the surrounding matmul/conv HLOs and never bound the roofline.
"""
from __future__ import annotations

import numpy as np


def _prod(shape) -> int:
    return int(np.prod([d if d else 1 for d in shape])) if shape else 1


def node_flops(graph, node) -> int:
    shp = graph.tensor_name_shape_map
    try:
        if node.op_type in ("Conv", "ConvTranspose"):
            w = shp[node.input[1]]  # Conv: (Cout, Cin/g, *k); ConvT: (Cin, Cout/g, *k)
            macs_per_out = _prod(w[1:])  # Cin/g * prod(k) per output elem (Conv)
            if node.op_type == "ConvTranspose":
                # every input element contributes Cout/g * prod(k) MACs
                return 2 * _prod(shp[node.input[0]]) * _prod(w[1:])
            return 2 * _prod(shp[node.output[0]]) * macs_per_out
        if node.op_type == "Gemm":
            a = shp[node.input[0]]
            out = shp[node.output[0]]
            k = a[-1]
            for attr in node.attribute:
                if attr.name == "transA" and attr.i:
                    k = a[0]
            return 2 * _prod(out) * int(k or 1)
        if node.op_type == "MatMul":
            a = shp[node.input[0]]
            return 2 * _prod(shp[node.output[0]]) * int(a[-1] or 1)
    except (KeyError, IndexError):
        return 0
    return 0


def model_flops(graph) -> int:
    """Total matmul-class FLOPs for one ONNX-declared sample."""
    return sum(node_flops(graph, n) for n in graph.graph.node)


def activation_bytes(graph, dtype_bytes: int = 4) -> int:
    """Lower bound on HBM traffic of one stats forward per sample: every
    intermediate tensor written once + read once by its stats tap."""
    shp = graph.tensor_name_shape_map
    inits = set(graph.initializer)
    total = 0
    for node in graph.graph.node:
        for out in node.output:
            if out and out in shp and out not in inits:
                total += 2 * dtype_bytes * _prod(shp[out])
    return total


def weight_bytes(graph, dtype_bytes: int = 4) -> int:
    return sum(dtype_bytes * _prod(list(arr.shape))
               for arr in graph.initializer.values())

"""Shape inference entry point (abstract evaluation over the op library)."""
from __future__ import annotations

from .passes import simplify_graph


def infer_graph_shapes(graph):
    """Fill tensor_name_shape_map for every tensor without folding constants."""
    return simplify_graph(graph, fold_constants=False)

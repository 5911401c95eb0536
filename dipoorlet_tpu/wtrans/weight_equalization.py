"""Cross-layer weight equalization.

Behavioral port of /root/reference/dipoorlet/weight_transform/
weight_equalization.py:10-101: iterative per-channel rescaling
s = r1/sqrt(r1*r2) for Conv->(Relu/PRelu)->Conv pairs (incl. grouped
convs) until the Frobenius-norm change drops below 1e-4.  The inner
per-channel loop is vectorized with numpy instead of per-channel Python."""
from __future__ import annotations

import numpy as np

from ..graph.graph import GraphIR
from ..utils.logging import logger


def find_successor(cur_node, graph: GraphIR):
    """Conv -> Relu -> Conv or Conv -> Conv pattern (weight_equalization.py:10-30)."""
    result = []
    out_tensor = cur_node.output[0]
    for node in graph.get_tensor_consumer(out_tensor):
        if isinstance(node, str):
            return []
        if node.op_type in ("Relu", "PRelu"):
            for nxt in graph.get_tensor_consumer(node.output[0]):
                if not isinstance(nxt, str) and nxt.op_type == "Conv":
                    result.append(nxt)
                else:
                    return []
        elif node.op_type == "Conv":
            result.append(node)
        else:
            return []
    return result


def node_has_equalized(graph: GraphIR, node) -> bool:
    return len(find_successor(node, graph)) == 1


def _group_scales(w1_group, w2_group):
    """Per-channel scale for one group: s_i = r1_i / sqrt(r1_i * r2_i),
    with near-zero ranges forced to s=1."""
    c = w2_group.shape[1]
    r1 = np.abs(w1_group[:c]).reshape(c, -1).max(axis=1)
    r2 = np.abs(w2_group[:, :c]).transpose(1, 0, *range(2, w2_group.ndim)).reshape(c, -1).max(axis=1)
    r1 = np.where(r1 < 1e-6, 0.0, r1)
    r2 = np.where(r2 < 1e-6, 0.0, r2)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = r1 / np.sqrt(r1 * r2)
    s = np.where(~np.isfinite(s), 1.0, s)
    return s


def weight_equalization(graph: GraphIR, args):
    graph_we = graph.clone()
    for node in graph_we.graph.node:
        if node.op_type != "Conv":
            continue
        succ = find_successor(node, graph_we)
        if len(succ) != 1:
            continue
        next_node = succ[0]
        iteration = 1
        while True:
            w1 = graph_we.get_initializer(node.input[1]).copy()
            w2 = graph_we.get_initializer(next_node.input[1]).copy()
            b1 = graph_we.get_initializer(node.input[2]).copy() if len(node.input) == 3 else None
            num_group = w1.shape[0] // w2.shape[1]
            logger.info("Cross Layer WE: %s --- %s Groups: %s Iter: %s",
                        node.name, next_node.name, num_group, iteration)
            gi = w1.shape[0] // num_group
            go = w2.shape[0] // num_group
            new_w1, new_w2 = w1.copy(), w2.copy()
            new_b1 = b1.copy() if b1 is not None else None
            for g in range(num_group):
                w1_g = w1[g * gi:(g + 1) * gi]
                w2_g = w2[g * go:(g + 1) * go]
                s = _group_scales(w1_g, w2_g)  # (w2.shape[1],)
                c = len(s)
                new_w1[g * gi:g * gi + c] /= s.reshape((-1,) + (1,) * (w1.ndim - 1))
                new_w2[g * go:(g + 1) * go] *= s.reshape((1, -1) + (1,) * (w2.ndim - 2))
                if new_b1 is not None:
                    new_b1[g * gi:g * gi + c] /= s
            delta = np.linalg.norm(w1 - new_w1) + np.linalg.norm(w2 - new_w2)
            if delta < 1e-4:
                break
            iteration += 1
            graph_we.set_initializer(node.input[1], new_w1)
            graph_we.set_initializer(next_node.input[1], new_w2)
            if new_b1 is not None:
                graph_we.set_initializer(node.input[2], new_b1)
    graph_we.update_model()
    if getattr(args, "rank", 0) == 0:
        graph_we.save_onnx_model("weight_equal_model")
    return graph_we

"""SmoothQuant-style activation-outlier smoothing (not in the reference —
a TPU-era extension for transformer families, after arXiv:2211.10438).

Per-tensor INT8 on LayerNorm-fed MatMuls collapses on activation outliers
(BERT/ViT output cosine ~0.78 with plain minmax ranges).  SmoothQuant
migrates the difficulty into the weights: for each activation tensor X
feeding MatMul/Gemm weights W_k, a per-channel scale

    s_j = amax(X)_j**alpha / amax(W)_j**(1-alpha)

is folded OUT of the activation (into the producing LayerNorm's
scale/bias — graph output is mathematically unchanged) and INTO every
consuming weight (W_k[j, :] *= s_j).  Activation ranges are re-calibrated
by the caller afterwards.

Foldable producers handled:
  * ONNX `LayerNormalization` (scale/bias inputs),
  * the decomposed-LN tail `Mul(x, gamma) -> Add(., beta)` that the
    torchscript exporter emits at opset 13,
  * a bare `Mul(x, gamma)` with per-channel initializer.
Activation statistics (per-last-axis amax over the calibration shard) are
collected on device in one tapped forward."""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.graph import GraphIR
from ..runtime.data import CalibDataset
from ..runtime.executor import Executor
from ..utils.logging import logger

SQ_TARGET_OPS = ("MatMul", "Gemm")


def _weight_in_channel_amax(graph: GraphIR, node) -> Tuple[str, np.ndarray]:
    """(weight_name, per-input-channel |W| max) for a 2-D initializer weight."""
    w_name = node.input[1]
    if w_name not in graph.initializer:
        return None, None
    w = graph.initializer[w_name]
    if w.ndim != 2:
        return None, None
    if node.op_type == "Gemm":
        from ..graph.graph import node_attrs
        if node_attrs(node).get("transB", 0):
            w = w.T  # view as (K, N)
    return w_name, np.abs(w).max(axis=1)


def _exclusive_init(graph: GraphIR, name, owner) -> bool:
    """True if initializer `name` is consumed ONLY by `owner`.  Exporters
    DEDUPLICATE identical constant tensors: T5 initializes every RMS-norm
    gamma to ones, so torch emits ONE shared initializer for all ~13 norms
    — folding 1/s into it would corrupt every other norm by that group's
    scale (measured: a shared gamma divided 13 times, ratio 6e4, FP cos
    0.40).  Shared params must take the insert path instead."""
    consumers = graph.get_tensor_consumer(name)
    return len(consumers) == 1 and not isinstance(consumers[0], str) \
        and consumers[0] is owner


def _foldable_producer(graph: GraphIR, tensor: str):
    """Returns (kind, payload) describing how to divide the producer's
    per-channel output by s, or None if the producer is not foldable.
    Every fold target (gamma/beta) must be EXCLUSIVE to its producer —
    see _exclusive_init."""
    prod = graph.get_tensor_producer(tensor)
    if isinstance(prod, str):
        return None

    def chan_init(node, exclude=()):
        for name in node.input:
            if name in graph.initializer and name not in exclude:
                arr = graph.initializer[name]
                if arr.ndim >= 1 and arr.size == arr.shape[-1]:
                    return name
        return None

    if prod.op_type == "LayerNormalization":
        scale = prod.input[1]
        bias = prod.input[2] if len(prod.input) > 2 else None
        if scale in graph.initializer and _exclusive_init(graph, scale, prod) \
                and (bias is None or bias not in graph.initializer
                     or _exclusive_init(graph, bias, prod)):
            return "ln", (scale, bias)
    if prod.op_type == "Add":
        beta = chan_init(prod)
        if beta is not None and _exclusive_init(graph, beta, prod):
            inner = [i for i in prod.input if i != beta][0]
            mul = graph.get_tensor_producer(inner)
            if not isinstance(mul, str) and mul.op_type == "Mul":
                gamma = chan_init(mul)
                # the Add's output must be consumed only via this path and the
                # Mul's output only by the Add (no other branch sees the
                # un-smoothed values)
                if gamma is not None and _exclusive_init(graph, gamma, mul) \
                        and len(graph.get_tensor_consumer(inner)) == 1:
                    return "ln", (gamma, beta)
    if prod.op_type == "Mul":
        gamma = chan_init(prod)
        if gamma is not None and _exclusive_init(graph, gamma, prod):
            return "ln", (gamma, None)
    return None


def _collect_act_amax(graph: GraphIR, tensors: List[str], args) -> Dict[str, np.ndarray]:
    """Per-last-axis |X| max over the calibration shard, computed on device."""
    ex = Executor(graph)
    params = ex.init_params()
    dataset = CalibDataset(args.input_dir, ex.input_shapes(), args.data_num)

    def amax_last(name, a):
        a = jnp.abs(a.astype(jnp.float32))
        return jnp.max(a, axis=tuple(range(a.ndim - 1))) if a.ndim > 1 else a

    fn = ex.make_batched(taps=tensors, tap_transform=amax_last, outputs=())
    bs = getattr(args, "batch_size", 16)
    acc_d = None  # device-resident running max; one packed fetch at the end
    sizes = None
    for idx in dataset.iter_batches(bs):
        _, taps = fn(params, dataset.load_batch(idx))
        upd = [jnp.max(taps[n], axis=0).ravel() for n in tensors]
        sizes = [int(u.size) for u in upd]
        upd = jnp.concatenate(upd) if len(upd) > 1 else upd[0]
        acc_d = upd if acc_d is None else jnp.maximum(acc_d, upd)
    flat = np.asarray(jax.device_get(acc_d))
    acc: Dict[str, np.ndarray] = {}
    off = 0
    for n, size in zip(tensors, sizes):
        acc[n] = flat[off:off + size]
        off += size
    return acc


def _scale_weight(graph: GraphIR, node, w_name: str, s: np.ndarray):
    from ..graph.graph import node_attrs
    wv = graph.initializer[w_name]
    if node.op_type == "Gemm" and node_attrs(node).get("transB", 0):
        new_w = wv * s[None, :].astype(wv.dtype)
    else:
        new_w = wv * s[:, None].astype(wv.dtype)
    graph.set_initializer(w_name, new_w.astype(wv.dtype))


def smooth_quant(graph: GraphIR, args) -> GraphIR:
    """Two application modes per activation group:

    * **fold** (zero-cost): every consumer of the activation is a target
      weight op and the producer is an LN tail -> divide the LN
      scale/bias by s; the graph gains no nodes.
    * **insert** (general): the activation also feeds other branches
      (post-LN residuals, as in BERT) -> rewire only the target consumers
      through a per-channel `Mul(act, 1/s)` node (one elementwise op, fused
      by XLA into the following MatMul on TPU).  All other branches see the
      original values, so the FP graph output is unchanged in both modes.
    """
    import dipoorlet_tpu.onnx_ir as oir

    alpha = float(getattr(args, "sq_alpha", 0.5))
    groups: Dict[str, List] = {}  # act -> [(node, w_name, w_amax)]
    for node in graph.graph.node:
        if node.op_type not in SQ_TARGET_OPS or len(node.input) < 2:
            continue
        w_name, w_amax = _weight_in_channel_amax(graph, node)
        if w_name is None:
            continue
        act = node.input[0]
        if act in graph.initializer or act in graph.network_inputs:
            continue
        groups.setdefault(act, []).append((node, w_name, w_amax))

    # channel dims inside a group must agree (they share one activation)
    for act in list(groups):
        dims = {m[2].shape[0] for m in groups[act]}
        if len(dims) != 1:
            del groups[act]
    if not groups:
        logger.info("SmoothQuant: no MatMul/Gemm groups with 2-D initializer "
                    "weights found.")
        return graph

    amax = _collect_act_amax(graph, list(groups), args)
    n_fold = n_insert = 0
    for act, members in groups.items():
        a = amax[act].astype(np.float64)
        if a.shape[0] != members[0][2].shape[0]:
            continue  # activation's last axis is not the contraction axis
        w = np.max(np.stack([m[2] for m in members]), axis=0).astype(np.float64)
        s = np.power(np.maximum(a, 1e-5), alpha) / \
            np.power(np.maximum(w, 1e-5), 1.0 - alpha)
        s = np.clip(s, 1e-5, 1e5)
        s[a <= 1e-30] = 1.0  # dead channels stay untouched
        if np.allclose(s, 1.0, rtol=0.25):
            continue  # nothing worth migrating in this group
        # a weight initializer shared with any consumer OUTSIDE this group
        # (deduplicated constants, tied embeddings) must not be scaled —
        # the outside consumer would see the corrupted values
        member_ids = {id(m[0]) for m in members}
        if any(any(isinstance(c, str) or id(c) not in member_ids
                   for c in graph.get_tensor_consumer(m[1]))
               for m in members):
            continue

        consumers = graph.get_tensor_consumer(act)
        member_nodes = {id(m[0]) for m in members}
        all_target = all(not isinstance(c, str) and id(c) in member_nodes
                         and c.input[0] == act for c in consumers) \
            and act not in graph.network_outputs
        fold = _foldable_producer(graph, act) if all_target else None
        if fold is not None:
            gamma, beta = fold[1]
            g = graph.initializer[gamma]
            if g.shape[-1] != s.shape[0]:
                fold = None
        if fold is not None:
            gamma, beta = fold[1]
            g = graph.initializer[gamma]
            graph.set_initializer(gamma, (g / s.reshape(g.shape)).astype(g.dtype))
            if beta is not None:
                b = graph.initializer[beta]
                graph.set_initializer(beta, (b / s.reshape(b.shape)).astype(b.dtype))
            n_fold += len(members)
            mode = "fold"
        else:
            inv_name = f"{act}_sq_inv_scale"
            graph.set_initializer(inv_name, (1.0 / s).astype(np.float32))
            sq_out = f"{act}_sq"
            mul = oir.make_node("Mul", [act, inv_name], [sq_out],
                                name=f"SQ_{act}")
            idx = min(graph.index(m[0]) for m in members)
            for m_node, _, _ in members:
                m_node.input[0] = sq_out
            graph.insert_node_purely(mul, idx=idx)
            graph.set_index()
            n_insert += len(members)
            mode = "insert"
        scaled = set()  # a weight shared by several members scales ONCE
        for m_node, w_name, _ in members:
            if w_name not in scaled:
                scaled.add(w_name)
                _scale_weight(graph, m_node, w_name, s)
        logger.info("SmoothQuant(%s): %s -> %d weight(s), s in [%.3g, %.3g]",
                    mode, act, len(members), float(s.min()), float(s.max()))

    if n_fold or n_insert:
        graph.update_model()
        graph.ensure_topological()
        graph.infer_shapes()
        logger.info("SmoothQuant: %d weights via LN-fold, %d via inserted "
                    "per-channel Mul (alpha=%.2f).", n_fold, n_insert, alpha)
        if getattr(args, "rank", 0) == 0:
            graph.save_onnx_model("smooth_quant_model")
    else:
        logger.info("SmoothQuant: all groups near-uniform, nothing to do.")
    return graph

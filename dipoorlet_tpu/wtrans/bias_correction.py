"""Bias correction.

Behavioral port of /root/reference/dipoorlet/weight_transform/
bias_correction.py:10-55: for each Conv/Gemm node (topo order), add the
per-channel mean FP-vs-quant output difference to the bias.

TPU design: the QDQ graph is built ONCE; bias updates are executor
param updates (no recompilation, mirroring the reference's incremental
ActivationCache reuse at bias_correction.py:46-51), and the channel-mean
statistic is reduced on device so no activation tensors reach the host."""
from __future__ import annotations

import numpy as np

from ..graph.graph import GraphIR
from ..onnx_ir import make_node
from ..quant.quant_graph import quant_graph
from ..utils.logging import logger
from .common import (ActivationProvider, SegmentedActivationProvider,
                     make_activation_provider, shard_bounds)

BC_NODE_TYPES = ("Conv", "Gemm")


def _ensure_bias(graph: GraphIR, node) -> str:
    """Give the node a zero bias initializer if it has none
    (bias_correction.py:23-31)."""
    if len(node.input) > 2:
        return node.input[2]
    weight = graph.get_initializer(node.input[1])
    c_out = weight.shape[0] if node.op_type != "ConvTranspose" else weight.shape[1]
    bias_name = node.name + "_bias"
    graph.set_initializer(bias_name, np.zeros(c_out, dtype=np.float32))
    node.input.append(bias_name)
    return bias_name


def _bc_fused(graph_bc, graph_q, bc_nodes, fp_means, args, st, ed):
    """The whole BiasCorrection phase as ONE traced program.

    Sequential semantics are preserved INSIDE the trace: for each Conv/
    Gemm node in topo order, a lax.map segment advances the stacked batch
    frontier to the node, its per-channel mean is reduced over all
    samples, the bias param is updated, and the segment re-runs under the
    new bias before the cut commits (the reference's recompute semantics,
    bias_correction.py:46-51).  One dispatch + one packed fetch replace
    the ~8-dispatches-per-node of the segmented driver — over a remote
    device link the phase collapses from tens of seconds to roughly two
    sweeps of device compute."""
    import jax
    import jax.numpy as jnp

    from ..runtime.data import CalibDataset
    from ..runtime.executor import Executor
    from .common import mesh_sharding

    ex = Executor(graph_q)
    params = {k: jnp.asarray(v) for k, v in ex.init_params().items()}
    ds = CalibDataset(args.input_dir, ex.input_shapes(), args.data_num)
    bs = getattr(args, "batch_size", 16)
    indices = list(range(st, ed))
    n = len(indices)
    chunks = {name: [] for name in ds.input_shapes}
    for off in range(0, n, bs):
        idx = indices[off:off + bs]
        batch = ds.load_batch(idx)
        if len(idx) < bs:
            batch = {k: np.concatenate(
                [v, np.repeat(v[-1:], bs - len(idx), axis=0)], axis=0)
                for k, v in batch.items()}
        for k in chunks:
            chunks[k].append(np.asarray(batch[k]))
    frontier0 = {k: np.stack(v) for k, v in chunks.items()}
    sharding = mesh_sharding(args)
    if sharding is not None and bs % sharding.mesh.devices.size == 0:
        from ..parallel import batched_data_sharding
        b_sh = batched_data_sharding(sharding.mesh)
        frontier0 = {k: jax.device_put(v, b_sh) for k, v in frontier0.items()}

    ppos = ex.producer_pos()
    last_use = {}
    for i, step in enumerate(ex.steps):
        for idx_, name in enumerate(step.inputs):
            if name and idx_ not in step.static_idx:
                last_use[name] = i

    def chmean_tx(_name, a):
        return (jnp.mean(a, axis=(0,) + tuple(range(2, a.ndim)))
                if a.ndim > 2 else jnp.mean(a, axis=0))

    segs = []
    pos = 0
    live_names = set(frontier0)
    for node in bc_nodes:
        stop = ppos[node.output[0]] + 1
        live = set(live_names)
        for step in ex.steps[pos:stop]:
            live.update(o for o in step.outputs if o)
        keeps = tuple(sorted(m for m in live if last_use.get(m, -1) >= stop))
        fn = ex.make_segment_batched(pos, stop, (node.output[0],), chmean_tx,
                                     keeps, jit=False)
        segs.append((fn, node.output[0], node.input[2]))
        live_names = set(keeps)
        pos = stop

    fp_vecs = [jnp.asarray(fp_means[out], jnp.float32) for _, out, _ in segs]

    @jax.jit
    def program(params, frontier):
        params = dict(params)
        new_biases = []
        for (fn, out, bias_name), fp_vec in zip(segs, fp_vecs):
            def run(par, fr, _fn=fn):
                return jax.lax.map(lambda fb: _fn(par, fb), fr)
            taps, _ = run(params, frontier)            # peek the statistic
            means = taps[out]
            means = means.reshape((-1,) + means.shape[2:])[:n]
            diff = fp_vec - jnp.mean(means, axis=0)
            params[bias_name] = params[bias_name] + diff.astype(params[bias_name].dtype)
            new_biases.append(params[bias_name])
            _, frontier = run(params, frontier)        # commit under new bias
        return new_biases

    new_biases = jax.device_get(program(params, frontier0))
    for (_, _, bias_name), b in zip(segs, new_biases):
        logger.info("Update bias for node: %s",
                    bias_name.replace("_bias", ""))
        graph_bc.set_initializer(bias_name, np.asarray(b, np.float32))


def _bc_segmented(graph_bc, q_provider, bc_nodes, fp_means, args):
    """O(1)-sweep BiasCorrection: ONE segmented frontier sweep over the
    quantized graph (2x segment evaluations — peek the statistic, update
    the bias, re-run the segment under the new bias to commit).  Sequential
    semantics match the reference's incremental cache reuse
    (bias_correction.py:46-51): node k's statistic reflects every earlier
    update because the committed frontier was recomputed under them."""
    import jax
    for node in bc_nodes:
        logger.info("Update bias for node: %s", node.name)
        out = node.output[0]
        q_sum, n_local = q_provider.peek_channel_sum(out)
        if jax.process_count() > 1:
            from ..parallel import allreduce_sum_arrays
            q_sum, n_total = allreduce_sum_arrays([q_sum, np.float64(n_local)])
            n_total = float(n_total)
        else:
            n_total = float(n_local)
        bias_diff = fp_means[out] - q_sum / n_total
        bias_name = node.input[2]
        new_bias = graph_bc.get_initializer(bias_name) + bias_diff.astype(np.float32)
        graph_bc.set_initializer(bias_name, new_bias)
        q_provider.update_weight(bias_name, new_bias)
        q_provider.commit_past(out)


def _bc_full_replay(graph_bc, q_provider, bc_nodes, bc_outputs, fp_means):
    """Legacy O(nodes)-pass path (DIPOORLET_TPU_SEGMENTED=0): tap EVERY bc
    output in one compiled program per pass and re-run the full forward
    after each update."""
    for node in bc_nodes:
        logger.info("Update bias for node: %s", node.name)
        q_mean = q_provider.channel_mean(bc_outputs)[node.output[0]]
        bias_diff = fp_means[node.output[0]] - q_mean
        bias_name = node.input[2]
        new_bias = graph_bc.get_initializer(bias_name) + bias_diff.astype(np.float32)
        graph_bc.set_initializer(bias_name, new_bias)
        q_provider.update_weight(bias_name, new_bias)


def bias_correction(graph: GraphIR, act_clip_val, weight_clip_val, args):
    clip_val = act_clip_val.copy()
    clip_val.update(weight_clip_val)
    graph_bc = graph.clone()

    bc_nodes = [n for n in graph_bc.graph.node if n.op_type in BC_NODE_TYPES]
    # Pre-create biases so the quant graph / executor structure is stable.
    for node in bc_nodes:
        _ensure_bias(graph_bc, node)
    graph_bc.update_model()

    st, ed = shard_bounds(args)
    fp_provider = ActivationProvider(graph, args, st, ed)
    bc_outputs = [n.output[0] for n in bc_nodes]
    fp_means = fp_provider.channel_mean(bc_outputs)

    graph_q, _ = quant_graph(graph_bc, clip_val, args)

    import os as _os
    import jax as _jax
    if (_jax.process_count() == 1
            and _os.environ.get("DIPOORLET_TPU_BC_FUSED", "1") == "1"
            and _os.environ.get("DIPOORLET_TPU_SEGMENTED", "1") == "1"):
        # whole phase as one traced program (single-process; multi-process
        # keeps the segmented driver with its cross-rank stat allreduce)
        _bc_fused(graph_bc, graph_q, bc_nodes, fp_means, args, st, ed)
    else:
        q_provider = make_activation_provider(graph_q, args, st, ed)
        if isinstance(q_provider, SegmentedActivationProvider):
            _bc_segmented(graph_bc, q_provider, bc_nodes, fp_means, args)
        else:
            _bc_full_replay(graph_bc, q_provider, bc_nodes, bc_outputs, fp_means)

    import jax
    if jax.process_count() > 1:
        from ..parallel import assert_rank_identical
        assert_rank_identical(graph_bc, "bias_correction")
    graph_bc.update_model()
    if getattr(args, "rank", 0) == 0:
        graph_bc.save_onnx_model("update_bias_model")
    return graph_bc

"""Shared infrastructure for the weight-transform / reconstruction passes.

The reference drives these from torch modules rebuilt per ONNX node
(ada_quant_layer.py:133-252) plus an ORT-backed ActivationCache; here a
learnable layer is just its registry op fn applied with the node's attrs,
and activations come from the executors — either full jitted prefix
replays (ActivationProvider) or, by default, segmented frontier replays
that evaluate each node exactly once per sweep
(SegmentedActivationProvider)."""
from __future__ import annotations

import math
import os
from typing import Dict, List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.graph import GraphIR, node_attrs
from ..quant.qparams import compute_qparams
from ..quant.quant_graph import DQ_SUFFIX
from ..runtime.data import CalibDataset
from ..runtime.executor import Executor

LEARNABLE_LAYER_TYPES = ["Conv", "Gemm", "ConvTranspose"]


def stable_seed(name: str, args) -> int:
    """Process-independent deterministic seed for a layer's reconstruction
    RNG (reference determinism contract, weight_trans_base.py:16-18).

    zlib.crc32 is stable across runs and processes — unlike ``hash()``,
    which PYTHONHASHSEED randomizes per interpreter — so every rank derives
    the same PRNG key for the same layer and two identical CLI runs produce
    byte-identical artifacts.  ``--seed`` offsets the whole run."""
    import zlib
    base = zlib.crc32(name.encode("utf-8"))
    return (base + (getattr(args, "seed", 0) or 0) * 0x9E3779B9) % (2 ** 31)


class ShardPlan(NamedTuple):
    indices: np.ndarray   # global sample ids this process computes, block order
    n_batches: int        # minibatches per epoch (GLOBAL semantics)
    bs_local: int         # this process's slice of each global minibatch
    valid: np.ndarray     # (n_batches, bs_local) float32 mask of real samples
    slots: np.ndarray     # positions of `indices` in the (n_batches*bs_local,) stack


def reconstruction_plan(args) -> ShardPlan:
    """Sample-to-minibatch assignment for reconstruction.

    Single-process: contiguous [0, N) in ceil(N/BS) zero-padded minibatches
    (the established layout).  Multi-process: GLOBAL minibatch b is the
    contiguous sample range [b*BS, (b+1)*BS) — the single-process
    composition — split into world_size blocks of BS/world consecutive
    samples; process r computes the blocks congruent to r and contributes
    its (n_batches, BS/world) slice of the globally sharded batch axis.
    One jitted program over the global mesh then gives every rank the
    gradient of the FULL global batch via XLA's psum (the role of the
    reference's DDP allreduce, adaround.py:121), so all ranks learn
    identical masks from ALL calibration data."""
    n = args.data_num
    world = getattr(args, "world_size", 1)
    rank = getattr(args, "rank", 0)
    if n < world:
        raise ValueError(f"data_num {n} < process count {world}")
    # a minibatch larger than the dataset would leave high ranks without
    # samples: clamp to the largest world-divisible size that fits
    bs = min(args.ada_bs, max(world, (n // world) * world))
    if bs % world:
        raise ValueError(
            f"--ada_bs {bs} must be divisible by the process count {world}")
    bsl = bs // world
    n_batches = max(1, math.ceil(n / bs))
    idx, slots = [], []
    valid = np.zeros((n_batches, bsl), np.float32)
    for b in range(n_batches):
        lo = (b * world + rank) * bsl
        for j in range(min(bsl, max(0, n - lo))):
            idx.append(lo + j)
            slots.append(b * bsl + j)
            valid[b, j] = 1.0
    return ShardPlan(np.asarray(idx, np.int64), n_batches, bsl, valid,
                     np.asarray(slots, np.int64))


def reconstruction_mesh(args, plan: ShardPlan):
    """The cross-process global data mesh reconstruction trains over under
    multi-host (all ranks' gradients reduce in-program); None
    single-process (the single-controller multi-chip case rides the
    ordinary data_sharding path instead)."""
    if getattr(args, "world_size", 1) > 1:
        from ..parallel import global_data_mesh
        return global_data_mesh(plan.bs_local)
    return None


def squeeze_batch_dim(x):
    """Drop the declared per-sample batch dim from a stacked activation
    (N, 1, ...) -> (N, ...) — the reference's per-sample squeeze
    (adaround.py:128).  Transformer Gemm inputs are already batchless
    per sample ((S, D) reshaped from (B*S, D)), so only a literal
    size-1 axis is removed; anything else is a real data axis and the
    layer apply broadcasts over it."""
    if x.ndim > 1 and x.shape[1] == 1:
        return x.reshape((x.shape[0],) + x.shape[2:])
    return x


def warn_if_shared_param(graph: GraphIR, name: str, transform: str):
    """Exporters DEDUPLICATE identical constant tensors (T5's all-ones
    RMS gammas collapsed to one shared initializer) and tie weights
    (embedding/lm_head).  A weight transform that rewrites such an
    initializer silently changes EVERY consumer; surface it loudly so
    the corruption is diagnosable (SmoothQuant refuses shared params
    outright; the per-layer transforms warn — the reference would
    corrupt silently)."""
    consumers = graph.input_map.get(name, [])
    if len(consumers) > 1:
        from ..utils.logging import logger
        logger.warning(
            "%s rewrites initializer %r which is SHARED by %d nodes (%s) — "
            "exporter-deduplicated or tied parameter; the update affects "
            "all of them", transform, name, len(consumers),
            ", ".join(c.name for c in consumers[:4]))


def wt_input_source(graph_wt: GraphIR, node) -> str:
    """The first-input tensor of `node` as rewired in the post-weight-
    transform graph.  Reconstruction drivers iterate graph_ori's nodes
    (reference adaround.py:124 semantics), but SmoothQuant's insert mode
    renames the consumer's input to '<x>_sq' (per-channel 1/s Mul) in
    the transformed graph — training the SCALED weight against the
    UNSCALED '<x>' activation corrupts every learned rounding by up to
    the per-channel s (measured: w4a4 SQ+BRECQ collapsed 0.56 -> 0.09
    next-top1 on the trained-LM protocol before this lookup)."""
    return graph_wt.graph.node[graph_wt.name_idx_map[node.name]].input[0]


def sq_rescale_fp_input(graph_wt: GraphIR, fp_src: str, in_src: str, fp_in):
    """QDrop's 50/50 mix needs fp activations in the SAME space as the
    q-side input: when the q side goes through SmoothQuant's inserted
    scaling ('<x>' -> '<x>_sq'), apply the stored 1/s to the fp-side
    activation too."""
    if in_src == fp_src:
        return fp_in
    inv = graph_wt.initializer.get(fp_src + "_sq_inv_scale")
    if in_src != fp_src + "_sq" or inv is None:
        raise NotImplementedError(
            f"unrecognized weight-transform input rewiring {fp_src!r} -> "
            f"{in_src!r}; cannot place fp activations in the q input space")
    import jax.numpy as jnp
    return fp_in * jnp.asarray(inv)


def follow_relu(graph: GraphIR, node) -> bool:
    nxt = graph.get_tensor_consumer(node.output[0])
    return len(nxt) == 1 and not isinstance(nxt[0], str) and nxt[0].op_type == "Relu"


def following_relu(graph: GraphIR, node):
    nxt = graph.get_tensor_consumer(node.output[0])
    assert nxt[0].op_type == "Relu"
    return nxt[0]


def get_block_from_first(graph: GraphIR, node, args) -> List:
    """Chain of <=3 learnable layers separated only by ReLU
    (weight_transform/utils.py:54-65)."""
    res = [node]
    while True:
        nxt = graph.get_tensor_consumer(node.output[0])
        if len(nxt) != 1 or isinstance(nxt[0], str) or \
                nxt[0].op_type not in LEARNABLE_LAYER_TYPES + ["Relu"]:
            return res
        if nxt[0].op_type != "Relu":
            res.append(nxt[0])
            if len(res) == 3:
                return res
        node = nxt[0]


def weight_qparams_for_node(node, clip_val, args):
    """scale/qmin/qmax tensors for a learnable node's weight, in the
    (possibly transposed) layout used during training
    (weight_transform/utils.py:29-51)."""
    from ..quant.platform import effective_setting
    qw_param = effective_setting(args)["qw_params"]
    weight_range = clip_val[node.input[1]]
    qp = compute_qparams(qw_param, weight_range[0], weight_range[1])
    return qp, bool(qw_param.get("per_channel", False))


def acti_qparams_for_node(graph, node, clip_val, args):
    """Activation quant params at the node's (post-relu) output
    (brecq.py:96-110)."""
    from ..quant.platform import effective_setting
    qi_param = effective_setting(args)["qi_params"]
    out_node = following_relu(graph, node) if follow_relu(graph, node) else node
    acti_range = clip_val[out_node.output[0]]
    qp = compute_qparams(qi_param, acti_range[0], acti_range[1])
    return qp


def quantized_input_name(graph_q: GraphIR, tensor_name: str) -> str:
    """The reference reads the DQ output when the tensor was quantized
    (adaround.py:46-51)."""
    dq = tensor_name + DQ_SUFFIX
    if dq in graph_q.output_map:
        return dq
    return tensor_name


class ActivationProvider:
    """Materializes activation tensors over the rank's sample shard by
    jitted prefix replay — the TPU ActivationCache
    (forward_net.py:23-189).  update_weight() refreshes executor params
    without recompiling, giving the reference's incremental reuse
    (adaround.py:40-45) for free."""

    def __init__(self, graph: GraphIR, args, st: int, ed: int,
                 batch_size: Optional[int] = None,
                 indices: Optional[np.ndarray] = None):
        self.graph = graph
        self.ex = Executor(graph)
        self.params = {k: jnp.asarray(v) for k, v in self.ex.init_params().items()}
        self.dataset = CalibDataset(args.input_dir, self.ex.input_shapes(), args.data_num)
        self.st, self.ed = st, ed
        # explicit sample-id list (a ShardPlan's block-strided assignment)
        # overrides the contiguous [st, ed) shard
        self.indices = (np.asarray(indices, np.int64) if indices is not None
                        else np.arange(st, ed, dtype=np.int64))
        self.batch_size = batch_size or getattr(args, "batch_size", 16)
        # replay batches shard over the CLI mesh so the prefix forwards run
        # data-parallel (the reference's per-GPU ActivationCache shards)
        self._sharding = mesh_sharding(args)
        if self._sharding is not None and \
                self.batch_size % self._sharding.mesh.devices.size:
            self._sharding = None
        self._fns: Dict = {}

    def _iter_batches(self):
        for st in range(0, len(self.indices), self.batch_size):
            yield [int(i) for i in self.indices[st:st + self.batch_size]]

    def _place(self, batch):
        if self._sharding is None:
            return batch
        return {k: jax.device_put(v, self._sharding) for k, v in batch.items()}

    def update_weight(self, name: str, value) -> None:
        value = jnp.asarray(np.asarray(value))
        if name in self.params:
            self.params[name] = value
        self.graph.set_initializer(name, np.asarray(value))

    def get(self, tensor_names, relu: bool = False) -> Dict[str, np.ndarray]:
        """Returns {name: (N_shard, *declared_shape)} stacked activations."""
        if isinstance(tensor_names, str):
            tensor_names = [tensor_names]
        key = (tuple(tensor_names), relu)
        if key not in self._fns:
            if relu:
                def tap_tx(name, arr):
                    return jnp.maximum(arr, 0)
                self._fns[key] = self.ex.make_batched(taps=tensor_names,
                                                      tap_transform=tap_tx, outputs=())
            else:
                self._fns[key] = self.ex.make_batched(taps=tensor_names, outputs=())
        fn = self._fns[key]
        chunks = {n: [] for n in tensor_names}
        for idx in self._iter_batches():
            batch = self.dataset.load_batch(idx)
            n_valid = len(idx)
            if n_valid < self.batch_size:
                # pad to the fixed batch shape (no recompile), slice after
                batch = {k: np.concatenate(
                    [v, np.repeat(v[-1:], self.batch_size - n_valid, axis=0)], axis=0)
                    for k, v in batch.items()}
            _, taps = fn(self.params, self._place(batch))
            for n in tensor_names:
                chunks[n].append(taps[n][:n_valid])
        # stay on device: these feed the on-device reconstruction loop
        return {n: jnp.concatenate(v, axis=0) for n, v in chunks.items()}

    def channel_mean(self, tensor_names, spatial_axes=True) -> Dict[str, np.ndarray]:
        """Per-channel mean over samples (and spatial dims) — the Bias
        Correction statistic, reduced on device."""
        if isinstance(tensor_names, str):
            tensor_names = [tensor_names]
        key = ("chmean", tuple(tensor_names), spatial_axes)
        if key not in self._fns:
            def tap_tx(name, arr):
                # arr: declared shape (1, C, ...) per sample
                if arr.ndim > 2:
                    axes = (0,) + tuple(range(2, arr.ndim))
                    return jnp.mean(arr, axis=axes)
                return jnp.mean(arr, axis=0)
            self._fns[key] = self.ex.make_batched(taps=tensor_names,
                                                  tap_transform=tap_tx, outputs=())
        fn = self._fns[key]
        acc = None  # device-resident running sums; ONE packed fetch per pass
        count = 0
        for idx in self._iter_batches():
            batch = self.dataset.load_batch(idx)
            n_valid = len(idx)
            if n_valid < self.batch_size:
                # pad to the fixed batch shape (single compile per pass)
                batch = {k: np.concatenate(
                    [v, np.repeat(v[-1:], self.batch_size - n_valid, axis=0)], axis=0)
                    for k, v in batch.items()}
            _, taps = fn(self.params, self._place(batch))
            upd = [jnp.sum(taps[n][:n_valid], axis=0).ravel() for n in tensor_names]
            upd = jnp.concatenate(upd) if len(upd) > 1 else upd[0]
            acc = upd if acc is None else acc + upd
            count += n_valid
        # a blocking device_get per (tensor, batch) cost ~15-25 ms each over
        # the remote relay (53-conv BC measured 11 s/node); the packed
        # device-side accumulator fetches once per pass instead
        flat = np.asarray(jax.device_get(acc), np.float64)
        sums, off = {}, 0
        for n in tensor_names:
            size = int(np.prod(taps[n].shape[1:])) if taps[n].ndim > 1 else 1
            sums[n] = flat[off:off + size]
            off += size
        if jax.process_count() > 1:
            # multi-host: reduce the sufficient statistics across processes
            # so every rank derives the SAME mean from ALL shards (the
            # reference instead runs rank 0 only and broadcasts via the
            # filesystem, weight_trans_base.py:22-29 — this is both
            # rank-identical and full-data)
            from ..parallel import allreduce_sum_arrays
            order = list(tensor_names)
            reduced = allreduce_sum_arrays(
                [sums[n] for n in order] + [np.float64(count)])
            sums = dict(zip(order, reduced[:-1]))
            count = float(reduced[-1])
        return {n: sums[n] / count for n in tensor_names}


class SegmentedActivationProvider:
    """Topo-ordered activation provider with O(1) total full-net forwards.

    The reference's ActivationCache evaluates each node at most once per
    reconstruction sweep, caching live tensors per-sample in host RAM with
    ref-count eviction (forward_net.py:23-189).  ActivationProvider above
    instead replays the full jitted prefix per request — O(L) full-net
    forwards over L learnable layers.  This class restores the reference's
    asymptotics TPU-style: it keeps a *frontier* — every tensor still live
    at the current topological cut, stacked over the rank's sample shard —
    and serves each request by running one jitted, vmapped segment from
    the cut to the requested tensor, carrying the live set forward.  Each
    graph node therefore executes exactly once per sweep, and weight
    updates behind the cut are reflected in later segments exactly like
    the reference's incremental q-cache (adaround.py:40-46).

    Memory policy: after each advance, the frontier (list of per-batch
    chunks) stays on device if it fits DIPOORLET_TPU_ACT_BUDGET_GB
    (default 4 GiB), else it is offloaded to host RAM and streamed back
    one batch at a time, bounding HBM at one batch of frontier + the
    segment's live-set peak + the requested taps.

    Requests must be topologically non-decreasing (all drivers iterate
    nodes in topo order); a behind-the-cut request is served from the
    frontier if the tensor is still live, else raises."""

    DEFAULT_BUDGET_GB = 4.0

    def __init__(self, graph: GraphIR, args, st: int, ed: int,
                 batch_size: Optional[int] = None,
                 indices: Optional[np.ndarray] = None):
        self.graph = graph
        self.ex = Executor(graph)
        self.params = {k: jnp.asarray(v) for k, v in self.ex.init_params().items()}
        self.dataset = CalibDataset(args.input_dir, self.ex.input_shapes(), args.data_num)
        self.st, self.ed = st, ed
        self.indices = (np.asarray(indices, np.int64) if indices is not None
                        else np.arange(st, ed, dtype=np.int64))
        self.n = len(self.indices)
        self.batch_size = batch_size or getattr(args, "batch_size", 16)
        self._sharding = mesh_sharding(args)
        if self._sharding is not None and \
                self.batch_size % self._sharding.mesh.devices.size:
            self._sharding = None
        self.budget_bytes = int(float(os.environ.get(
            "DIPOORLET_TPU_ACT_BUDGET_GB", str(self.DEFAULT_BUDGET_GB))) * 2 ** 30)
        self.host_frontier = False
        self.steps_run = 0  # diagnostics: step-evaluations (per batch chunk)

        self._ppos = self.ex.producer_pos()
        self._last_use: Dict[str, int] = {}
        for i, step in enumerate(self.ex.steps):
            for idx, name in enumerate(step.inputs):
                if name and idx not in step.static_idx:
                    self._last_use[name] = i
        self.pos = 0
        self._fns: Dict = {}

        # initial frontier = the network inputs, padded to full batches,
        # STACKED as (n_batches, B, *shape) host arrays (uploaded with the
        # first segment).  The stacked layout lets every segment run ALL
        # batches in one lax.map dispatch — over the remote relay the
        # per-batch dispatch loop (~30-40 ms each) dominated BC/AdaRound's
        # non-training wall-clock.
        chunks: Dict[str, list] = {name: [] for name in self.dataset.input_shapes}
        for bst in range(0, self.n, self.batch_size):
            idx = [int(i) for i in self.indices[bst:bst + self.batch_size]]
            batch = self.dataset.load_batch(idx)
            if len(idx) < self.batch_size:
                batch = {k: np.concatenate(
                    [v, np.repeat(v[-1:], self.batch_size - len(idx), axis=0)], axis=0)
                    for k, v in batch.items()}
            for k in chunks:
                chunks[k].append(np.asarray(batch[k]))
        self.n_batches = len(next(iter(chunks.values())))
        self.frontier: Dict = {k: np.stack(v) for k, v in chunks.items()}

    def update_weight(self, name: str, value) -> None:
        value = jnp.asarray(np.asarray(value))
        if name in self.params:
            self.params[name] = value
        self.graph.set_initializer(name, np.asarray(value))

    def sweep_equivalents(self) -> float:
        """Step-evaluations so far, in units of full-net forwards."""
        total = len(self.ex.steps) * self.n_batches
        return self.steps_run / total if total else 0.0

    def get(self, tensor_names, relu: bool = False) -> Dict[str, jnp.ndarray]:
        """Returns {name: (N_shard, *declared_shape)} stacked activations."""
        if isinstance(tensor_names, str):
            tensor_names = [tensor_names]
        missing = [n for n in tensor_names if n not in self._ppos]
        if missing:
            raise KeyError(f"unknown tensors {missing}")
        stop = max(self._ppos[n] for n in tensor_names) + 1
        if stop <= self.pos:
            return self._serve_from_frontier(tensor_names, relu)
        return self._advance(stop, tuple(tensor_names), "relu" if relu else None)

    def peek_channel_sum(self, name):
        """(per-channel sum of per-sample channel means as float64, n_shard)
        of `name`, computed by running the cut->producer segment WITHOUT
        committing the frontier — the BiasCorrection statistic.  The caller
        updates the node's bias and then calls commit_past(name), which
        re-runs the same segment with the NEW params (the reference's
        recompute semantics, bias_correction.py:46-51); the whole BC phase
        is then O(1) full-net sweeps (2x segment evaluations) instead of
        one full stats pass per node."""
        stop = self._ppos[name] + 1
        if stop <= self.pos:
            means = self._serve_from_frontier([name], False)[name]
            means = (jnp.mean(means, axis=tuple(range(2, means.ndim)))
                     if means.ndim > 2 else means)
        else:
            tap_out, _, _ = self._run_segment(stop, (name,), "chmean")
            means = self._flatten(tap_out[name])
        s = jnp.sum(means, axis=0)
        return np.asarray(jax.device_get(s), np.float64), self.n

    def commit_past(self, name) -> None:
        """Advance the replay cut just past `name`'s producer, re-running
        the segment under the CURRENT params (see peek_channel_sum)."""
        stop = self._ppos[name] + 1
        if stop <= self.pos:
            return
        self._advance(stop, (), None)

    # ------------------------------------------------------------------
    def _place_stack(self, a):
        """Place one stacked (n_batches, B, *shape) frontier array."""
        if isinstance(a, np.ndarray):
            if self._sharding is not None:
                from ..parallel import batched_data_sharding
                return jax.device_put(
                    a, batched_data_sharding(self._sharding.mesh))
            return jnp.asarray(a)
        return a

    def _flatten(self, a):
        """(n_batches, B, ...) -> (n_shard, ...): drop the batch padding."""
        return jnp.reshape(a, (-1,) + tuple(a.shape[2:]))[: self.n]

    def _serve_from_frontier(self, names, relu):
        out = {}
        for n in names:
            if n not in self.frontier:
                raise RuntimeError(
                    f"tensor '{n}' is behind the replay cut and already evicted; "
                    f"request activations in topological order (or use "
                    f"ActivationProvider)")
            a = self._flatten(self._place_stack(self.frontier[n]))
            out[n] = jnp.maximum(a, 0) if relu else a
        return out

    _TAP_KINDS = {
        None: None,
        "relu": lambda name, a: jnp.maximum(a, 0),
        # per-sample per-channel mean (BC statistic; sample shape (1, C, ...))
        "chmean": lambda name, a: (
            jnp.mean(a, axis=(0,) + tuple(range(2, a.ndim))) if a.ndim > 2
            else jnp.mean(a, axis=0)),
    }

    def _run_segment(self, stop, taps, tap_kind):
        """Execute steps[pos:stop] over ALL batches in ONE dispatch
        (lax.map over the stacked frontier); returns (stacked_taps,
        stacked_keeps, keeps) without mutating the frontier."""
        start = self.pos
        live = set(self.frontier)
        for step in self.ex.steps[start:stop]:
            live.update(o for o in step.outputs if o)
        keeps = tuple(sorted(n for n in live if self._last_use.get(n, -1) >= stop))
        tap_tx = self._TAP_KINDS[tap_kind]
        key = (start, stop, taps, tap_kind, keeps)
        if key not in self._fns:
            inner = self.ex.make_segment_batched(start, stop, taps, tap_tx,
                                                 keeps, jit=False)

            def whole(params, fstack):
                # lax.map = sequential scan over the batch-stack: one
                # dispatch, peak memory of one batch's live set
                return jax.lax.map(lambda fb: inner(params, fb), fstack)

            self._fns[key] = jax.jit(whole)
        fn = self._fns[key]
        fstack = {k: self._place_stack(v) for k, v in self.frontier.items()}
        tap_out, keep_out = fn(self.params, fstack)
        self.steps_run += (stop - start) * self.n_batches
        return tap_out, keep_out, keeps

    def _advance(self, stop, taps, tap_kind):
        tap_out, keep_out, _ = self._run_segment(stop, taps, tap_kind)

        frontier_bytes = sum(v.nbytes for v in keep_out.values())
        self.host_frontier = frontier_bytes > self.budget_bytes
        if self.host_frontier:
            self.frontier = {n: np.asarray(v)
                             for n, v in jax.device_get(keep_out).items()}
        else:
            self.frontier = keep_out
        self.pos = stop
        return {n: self._flatten(tap_out[n]) for n in taps}


def make_activation_provider(graph: GraphIR, args, st: int, ed: int,
                             batch_size: Optional[int] = None,
                             indices: Optional[np.ndarray] = None):
    """Segmented (single-sweep) provider by default;
    DIPOORLET_TPU_SEGMENTED=0 falls back to full prefix replays."""
    if os.environ.get("DIPOORLET_TPU_SEGMENTED", "1") == "1":
        return SegmentedActivationProvider(graph, args, st, ed, batch_size,
                                           indices=indices)
    return ActivationProvider(graph, args, st, ed, batch_size, indices=indices)


def shard_bounds(args):
    rank = getattr(args, "rank", 0)
    world = getattr(args, "world_size", 1)
    per = args.data_num // world
    st = rank * per
    ed = st + per
    return st, min(ed, args.data_num)


def mesh_sharding(args):
    """NamedSharding over the CLI-built data mesh, or None single-chip."""
    mesh = getattr(args, "mesh", None)
    if mesh is None:
        return None
    from ..parallel import data_sharding
    return data_sharding(mesh)

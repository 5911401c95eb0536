"""On-device activation statistics (the calibration hot path).

Reference hot loop: ORT forward with *every* tensor promoted to a graph
output, then host-numpy .max()/.min()/np.histogram per tensor per sample
(/root/reference/dipoorlet/forward_net.py:192-342).  Here the statistics
are computed INSIDE the traced forward via tap transforms, so only tiny
per-tensor stats ever leave the device:

  * minmax  -> (min, max) scalars per tensor per batch
  * hist    -> (bins,) int32 histogram of |x| per tensor per batch
  * octav   -> 20-step OCTAV fixed point as an on-device lax.while_loop
               (forward_net.py:323-330), one scalar per tensor per sample

Cross-batch combination is associative (min/max/sum), cross-shard
combination mirrors utils.py:326-345 (min/max for minmax, rank-mean of
clip values for hist/mse)."""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..runtime.executor import Executor


def _per_sample_minmax(name, x):
    return jnp.min(x), jnp.max(x)


def make_octav_transform(dynamic_sym: bool, allow_pallas: bool = None):
    if allow_pallas is None:
        # probe-once: compile+run the kernel on a tiny tensor, check
        # numerics vs the XLA fixed point, cache the outcome per backend
        # (calib/autotune.py).  DIPOORLET_TPU_PALLAS=1|0 force-overrides.
        from .autotune import pallas_octav_enabled
        allow_pallas = pallas_octav_enabled()

    def octav(name, x):
        if allow_pallas:
            from .kernels import octav_fits_vmem, octav_pallas, use_pallas
            if use_pallas() and octav_fits_vmem(x.shape):
                return octav_pallas(x, dynamic_sym)
        xf = x.astype(jnp.float32).ravel()
        abs_x = jnp.abs(xf)
        data_min = jnp.min(xf)
        data_max = jnp.max(xf)
        nnz = jnp.maximum(jnp.sum(abs_x > 0), 1)
        s0 = jnp.sum(abs_x) / nnz
        if dynamic_sym:
            unsigned = jnp.where(jnp.abs(data_min) < 1e-6, 4.0, 1.0)
        else:
            unsigned = jnp.float32(1.0)
        coef = 1.0 / (4.0 ** 8) / 3.0 / unsigned

        def cond(carry):
            s, prev, it = carry
            return jnp.logical_and(it < 20, jnp.abs(s - prev) >= 1e-6)

        def body(carry):
            s, _, it = carry
            gt = abs_x > s
            num = jnp.sum(jnp.where(gt, abs_x, 0.0))
            den = coef * jnp.sum(~gt) + jnp.sum(gt)
            s_next = num / jnp.maximum(den, 1e-30)
            return s_next, s, it + 1

        s_fin, _, _ = jax.lax.while_loop(cond, body, (s0, s0 + 1.0, jnp.int32(0)))
        return s_fin, data_min, data_max

    return octav


def matmul_histogram(idx, bins: int):
    """Exact histogram of int32 bucket indices in [0, bins) as an MXU matmul.

    TPU scatter-add serializes on index conflicts, so `.at[idx].add(1)` over
    millions of activations costs ~1s/batch; instead the index is split into
    (hi, lo) digits and the counts become one int8 matmul
    `onehot(hi)^T @ onehot(lo) -> (HI, LO) int32` — exact (s8 x s8 -> s32
    accumulation) and rides the systolic array.  Binning itself stays
    arithmetic (idx = floor(|x| * bins / amax)): the only difference vs
    np.histogram's edge division is float32 rounding at exact bin edges,
    invisible to the percentile walk."""
    lo_n = min(32, bins)
    hi_n = -(-bins // lo_n)
    hi = (idx // lo_n)[:, None] == jnp.arange(hi_n, dtype=jnp.int32)
    lo = (idx % lo_n)[:, None] == jnp.arange(lo_n, dtype=jnp.int32)
    h = jnp.dot(hi.astype(jnp.int8).T, lo.astype(jnp.int8),
                preferred_element_type=jnp.int32)
    return h.reshape(-1)[:bins]


class StatsRunner:
    """Batched, jitted statistics forward over a GraphIR.

    With a mesh, full batches are sharded over the 'data' axis and the
    stats forward runs SPMD (XLA reduces on device over ICI); trailing
    partial batches run replicated."""

    def __init__(self, executor: Executor, tensor_names: Optional[Sequence[str]] = None,
                 mesh=None, compute_dtype=None, tap_chunk: Optional[int] = None,
                 data_cache: Optional[dict] = None):
        self.ex = executor
        self.tensor_names = list(tensor_names) if tensor_names is not None \
            else self.ex.all_tensor_names()
        self.mesh = mesh
        # bf16 forwards halve HBM traffic; statistics stay f32. Opt-in:
        # ranges differ from f32 by bf16 rounding (~0.4%).
        self.compute_dtype = compute_dtype
        # memory/compile bound for transformer-scale graphs: at most this
        # many tensors are tapped per compiled pass; the dataset's device
        # cache is shared across chunks so extra passes cost compute, not
        # transfer.  The TPU analogue of the reference's ActivationCache
        # stats path (forward_net.py:345-456), which bounds memory by
        # re-forwarding per node.
        self.tap_chunk = tap_chunk
        self._subrunners = None
        self._fns = {}
        # pallas-hist bookkeeping: which bin counts built a Pallas step, and
        # which were force-reverted to XLA after a runtime failure
        self._hist_is_pallas = {}
        self._hist_force_xla = set()
        self._data_cache = data_cache if data_cache is not None else {}
        self._dev_params = None  # (source dict, id token, device copy)
        # introspection: the sharding actually applied to calibration data
        # on the last pass (None = replicated/single-device). CLI-level
        # tests assert on this to prove production runs shard over the mesh.
        self.last_data_sharding = None

    def _sub_runners(self):
        if not self.tap_chunk or len(self.tensor_names) <= self.tap_chunk:
            return None
        if self._subrunners is None:
            c = int(self.tap_chunk)
            self._subrunners = [
                StatsRunner(self.ex, self.tensor_names[i:i + c], mesh=self.mesh,
                            compute_dtype=self.compute_dtype,
                            data_cache=self._data_cache)
                for i in range(0, len(self.tensor_names), c)]
        return self._subrunners

    def _mesh_shards(self) -> int:
        if self.mesh is None:
            return 1
        return int(np.prod(list(self.mesh.shape.values())))

    def _cast_params(self, params):
        if self.compute_dtype is None:
            return params
        dt = self.compute_dtype
        return {k: (v.astype(dt) if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
                for k, v in params.items()}

    def _device_params(self, params):
        """Upload params once per distinct host dict, not once per pass.

        Re-uploading ResNet-18's ~45 MB of weights every pass cost ~1.5 s
        over the remote device link (~30 MB/s) — 3x the actual pass compute.
        Keyed by array identity: a weight update produces new arrays and
        naturally invalidates the cache; holding the source dict keeps the
        ids stable."""
        token = tuple(id(v) for v in params.values())
        if self._dev_params is not None and self._dev_params[1] == token:
            return self._dev_params[2]
        dev = jax.device_put(self._cast_params(params))
        self._dev_params = (params, token, dev)
        return dev

    def _cast_batch(self, batch):
        if self.compute_dtype is None:
            return batch
        dt = self.compute_dtype
        # inputs DECLARED integer (token ids -> Gather indices) must keep
        # their raw-f32 values: bf16 has 8 mantissa bits, so ids >= 256
        # round — some past the vocab boundary, making the embedding
        # Gather out-of-bounds (observed: NaN on every tensor of a
        # t5-small at vocab 32128; bert at 30522 was silently gathering
        # wrong rows)
        from ..onnx_ir.helper import ONNX_TO_NP
        import jax.numpy as jnp

        def _castable(name):
            want = ONNX_TO_NP.get(self.ex.graph.get_value_type(name))
            return want is None or not jnp.issubdtype(jnp.dtype(want), jnp.integer)

        return {k: (np.asarray(v).astype(dt) if _castable(k) else np.asarray(v))
                for k, v in batch.items()}

    def _place(self, batch):
        if self.mesh is None:
            return batch
        n = next(iter(batch.values())).shape[0]
        if n % self._mesh_shards() == 0:
            from ..parallel.mesh import data_sharding, shard_batch
            self.last_data_sharding = data_sharding(self.mesh)
            return shard_batch(batch, self.mesh)
        return batch

    def _carry_fn(self, kind, transform, combine, accumulate):
        """jitted step(params, batch, valid, carry) -> carry.

        `transform(name, x)` produces per-sample per-tensor stats inside the
        trace; `combine(taps, valid)` stacks them into a few dense arrays;
        `accumulate(carry, update)` folds them into the device-resident
        cross-batch carry.  The pass makes ZERO host syncs until the final
        single device_get — per-batch result fetches are the dominant cost
        over a remote device link.  `valid` masks padded samples so partial
        trailing batches never trigger a recompile."""
        key = kind
        if key not in self._fns:
            names = self.tensor_names

            def single(params, inputs):
                _, taps = self.ex.forward(params, inputs, taps=names,
                                          tap_transform=transform, outputs=())
                return taps

            vm = jax.vmap(single, in_axes=(None, 0))

            def step_raw(params, batch, valid, carry):
                return accumulate(carry, combine(vm(params, batch), valid))

            self._fns[key] = (jax.jit(step_raw), step_raw)
        return key

    # datasets up to this many bytes are uploaded once and scanned on device
    DEVICE_RESIDENT_BYTES = 2 << 30

    def _dataset_device_cache(self, dataset, batch_size, start, end):
        """Upload the shard once as {name: (NB, B, *shape)} + valid (NB, B).

        With a mesh, the batch axis of the cached stack is sharded over the
        'data' axis, so every subsequent pass runs SPMD straight from the
        per-chip HBM shards."""
        # the dataset's identity MUST be part of the key: a runner reused
        # across datasets (bench fresh-seed reps; any tool swapping calib
        # dirs) would otherwise silently serve the FIRST dataset's device
        # buffers for every later one
        src = getattr(dataset, "input_dir", None) or id(dataset)
        key = ("data", src, batch_size, start, end)
        if key not in self._data_cache:
            sharding = None
            if self.mesh is not None and batch_size % self._mesh_shards() == 0:
                from ..parallel.mesh import batched_data_sharding
                sharding = batched_data_sharding(self.mesh)
                self.last_data_sharding = sharding
            chunks = {name: [] for name in dataset.input_shapes}
            valids = []
            n_total = 0
            for batch, valid, n_valid in self._batches(dataset, batch_size, start, end,
                                                       place=False):
                for name in chunks:
                    chunks[name].append(np.asarray(batch[name]))
                valids.append(np.asarray(valid))
                n_total += n_valid
            data = {name: jax.device_put(np.stack(v), sharding)
                    for name, v in chunks.items()}
            valid = jax.device_put(np.stack(valids).astype(np.float32), sharding)
            self._data_cache[key] = (data, valid, n_total)
        return self._data_cache[key]

    def _scan_fn(self, kind):
        key = (kind, "scan")
        if key not in self._fns:
            _, step_raw = self._fns[kind]

            @jax.jit
            def pass_fn(params, data, valids, carry0):
                def body(carry, xs):
                    return step_raw(params, xs[0], xs[1], carry), None
                carry, _ = jax.lax.scan(body, carry0, (data, valids))
                return carry
            self._fns[key] = pass_fn
        return self._fns[key]

    def _run_pass(self, kind, params, dataset, batch_size, start, end, carry0,
                  fetch=True):
        """Drive a stats pass.  Small shards are uploaded once and scanned
        entirely on device (one dispatch + one fetch); large shards stream
        per batch into a device-resident carry.  With fetch=False the carry
        is returned still on device (no host sync) so a downstream pass can
        consume it without a relay round-trip."""
        import time
        from . import autotune
        params = self._device_params(params)
        end_ = dataset.num if end is None else end
        n_total = max(0, end_ - start)
        shard_bytes = n_total * sum(
            4 * int(np.prod(s)) for s in dataset.input_shapes.values())
        # The whole-pass lax.scan amortizes per-batch dispatch (~30 ms each
        # over the remote relay) into one call, but its compile has shown
        # multi-minute tails on the remote-compile service.  Probe-once:
        # the FIRST real scan compile is the probe — timed, and its outcome
        # (ok / failed / over budget) cached per backend so every later run
        # takes the best path with no env vars (autotune.py).
        use_scan = autotune.cached_decision("scan_calib")
        if 0 < shard_bytes <= self.DEVICE_RESIDENT_BYTES:
            data, valids, n_cached = self._dataset_device_cache(dataset, batch_size,
                                                                start, end)
            if use_scan or use_scan is None:
                already_compiled = (kind, "scan", "compiled") in self._fns
                t0 = time.time()
                try:
                    pass_fn = self._scan_fn(kind)
                    carry = pass_fn(params, data, valids, jax.device_put(carry0))
                    jax.block_until_ready(carry)
                except Exception as e:
                    if use_scan is None:
                        autotune.record("scan_calib", False, time.time() - t0,
                                        f"{type(e).__name__}: {e}"[:200])
                        self._fns.pop((kind, "scan"), None)
                    else:
                        raise
                else:
                    if use_scan is None and not already_compiled:
                        dt = time.time() - t0
                        autotune.record("scan_calib", dt <= autotune.scan_budget(), dt)
                    self._fns[(kind, "scan", "compiled")] = True
                    return (jax.device_get(carry) if fetch else carry), n_cached
            # default: device-resident batches through the per-batch jitted
            # step — same compiled program as the streaming path (no new
            # compile), but the dataset is uploaded ONCE and every pass after
            # the first reads it straight from HBM (host->device transfer was
            # the steady-state bottleneck over the remote device link)
            step = self._fns[kind][0]
            carry = jax.device_put(carry0)
            for i in range(valids.shape[0]):
                carry = step(params, {k: v[i] for k, v in data.items()},
                             valids[i], carry)
            return (jax.device_get(carry) if fetch else carry), n_cached
        step = self._fns[kind][0]
        carry = jax.device_put(carry0)
        n_total = 0
        for batch, valid, n_valid in self._batches(dataset, batch_size, start, end):
            carry = step(params, batch, valid, carry)
            n_total += n_valid
        return (jax.device_get(carry) if fetch else carry), n_total

    @staticmethod
    def _pad_batch(batch, batch_size):
        """Pad to batch_size with repeats of the last sample; returns
        (padded_batch, valid_mask)."""
        n = next(iter(batch.values())).shape[0]
        valid = np.zeros(batch_size, np.float32)
        valid[:n] = 1.0
        if n == batch_size:
            return batch, valid
        out = {}
        for k, v in batch.items():
            pad = np.repeat(v[-1:], batch_size - n, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
        return out, valid

    def _batches(self, dataset, batch_size, start, end, place=True):
        # stream_batches overlaps batch N+1's disk reads with batch N's
        # device compute (C++ double-buffered prefetcher) — this is the
        # hot path for shards over DEVICE_RESIDENT_BYTES, where data
        # streams through instead of living in HBM.
        stream = getattr(dataset, "stream_batches", None)
        if stream is not None:
            it = stream(batch_size, start, end)
        else:
            it = ((idx, dataset.load_batch(idx))
                  for idx in dataset.iter_batches(batch_size, start, end))
        for idx, raw in it:
            batch, valid = self._pad_batch(raw, batch_size)
            batch = self._cast_batch(self._stack(batch))
            if place:
                batch = self._place(batch)
            yield batch, jnp.asarray(valid), len(idx)

    # -- minmax ------------------------------------------------------------
    _BIG = np.float32(np.finfo(np.float32).max)

    def _ensure_minmax(self):
        names = self.tensor_names
        big = self._BIG

        def combine(taps, valid):
            mins = jnp.stack([jnp.min(jnp.where(valid > 0, taps[n][0], big))
                              for n in names])
            maxs = jnp.stack([jnp.max(jnp.where(valid > 0, taps[n][1], -big))
                              for n in names])
            return mins, maxs

        def accumulate(carry, update):
            return (jnp.minimum(carry[0], update[0]), jnp.maximum(carry[1], update[1]))

        return self._carry_fn("minmax", _per_sample_minmax, combine, accumulate)

    def _minmax_carry0(self):
        n = len(self.tensor_names)
        return (np.full(n, self._BIG, np.float32), np.full(n, -self._BIG, np.float32))

    def run_minmax(self, params, dataset, batch_size=32, start=0, end=None):
        """Returns {name: {'min': scalar, 'max': scalar}} reduced over samples."""
        subs = self._sub_runners()
        if subs:
            out = {}
            for r in subs:
                out.update(r.run_minmax(params, dataset, batch_size, start, end))
            self.last_data_sharding = subs[-1].last_data_sharding
            return out
        names = self.tensor_names
        kind = self._ensure_minmax()
        (lo, hi), _ = self._run_pass(kind, params, dataset, batch_size, start, end,
                                     self._minmax_carry0())
        return {n: {"min": float(lo[i]), "max": float(hi[i])} for i, n in enumerate(names)}

    # -- histogram ---------------------------------------------------------
    def _ensure_hist(self, bins):
        """Histogram step keyed only by bin count: the per-tensor binning
        scales ride in the carry as a traced (T,) array, so a new range set
        (re-calibration after a weight transform, or the fused minmax→hist
        pass) never forces a recompile."""
        from . import autotune, kernels
        names = self.tensor_names
        kind = f"hist{bins}"
        if kind not in self._fns:
            # the Pallas kernel does its own on-chip masking/accumulation and
            # runs un-vmapped over the whole batch; SPMD sharded batches stay
            # on the XLA formulation (pallas_call is not shard_map-aware here).
            # An explicit DIPOORLET_TPU_PALLAS_HIST=1|0 wins outright (so CPU
            # tests can exercise the kernel under interpret mode); otherwise
            # the probe decides on non-CPU backends.
            decided = autotune.cached_decision("pallas_hist", str(bins))
            if decided is None:
                decided = kernels.use_pallas() and autotune.pallas_hist_enabled(bins)
            use_pl = (decided and (self.mesh is None or self.mesh.size == 1)
                      and bins not in self._hist_force_xla)
            self._hist_is_pallas[bins] = bool(use_pl)

            def binned_idx(params_, inputs, scales):
                _, taps = self.ex.forward(params_, inputs, taps=names, outputs=())
                out = []
                for i, n in enumerate(names):
                    absx = jnp.abs(taps[n].astype(jnp.float32).ravel())
                    out.append(jnp.clip((absx * scales[i]).astype(jnp.int32),
                                        0, bins - 1))
                return out

            n_names = len(names)

            if use_pl:
                vm_idx = jax.vmap(binned_idx, in_axes=(None, 0, None))

                def step_raw(params_, batch, valid, carry):
                    # one VMEM-resident kernel per tensor over the flattened
                    # (batch x elems) indices; padded samples are marked -1
                    # which the kernel counts nowhere (calib/kernels.py)
                    acc_hi, acc_lo, scales = carry
                    idxs = vm_idx(params_, batch, scales)  # [(B, n_i), ...]
                    vmask = valid[:, None] > 0
                    update = jnp.stack([
                        kernels.histogram_pallas(
                            jnp.where(vmask, ix, -1).ravel(), bins)
                        for ix in idxs])
                    acc = acc_lo + update
                    hi_inc = acc >> 16
                    return (acc_hi + hi_inc, acc - (hi_inc << 16), scales)
            else:
                def fused_hist(params_, inputs, scales):
                    return jnp.concatenate(
                        [matmul_histogram(ix, bins)
                         for ix in binned_idx(params_, inputs, scales)])

                vm = jax.vmap(fused_hist, in_axes=(None, 0, None))

                def step_raw(params_, batch, valid, carry):
                    # TPU jit has no int64, so the cross-batch accumulator is
                    # a (hi, lo) int32 pair: multiples of 2^16 fold into `hi`
                    # every step, giving 2^47 exact counts per bin (a single
                    # int32 bin saturates at ~2.1e9 — a 150K-element tensor
                    # over ~14K samples).  Requires per-BATCH counts < 2^31,
                    # which any practical (batch_size x tensor) satisfies.
                    acc_hi, acc_lo, scales = carry
                    per_sample = vm(params_, batch, scales)  # (B, T*bins)
                    update = jnp.sum(
                        per_sample * valid[:, None].astype(per_sample.dtype),
                        axis=0)
                    acc = acc_lo + update.reshape(n_names, bins)
                    hi_inc = acc >> 16
                    return (acc_hi + hi_inc, acc - (hi_inc << 16), scales)

            self._fns[kind] = (jax.jit(step_raw), step_raw)
        return kind

    def _run_hist_pass(self, bins, params, dataset, batch_size, start, end,
                       carry0, fetch=True):
        """_run_pass for the histogram step, with a one-shot runtime
        fallback: a Pallas kernel that probed green can still fail at a NEW
        input length (each tensor size is its own Mosaic compile, and the
        remote compile service has shown transient HTTP-500s) — production
        calibration must degrade to the XLA matmul-histogram, not die."""
        kind = self._ensure_hist(bins)
        try:
            return self._run_pass(kind, params, dataset, batch_size, start, end,
                                  carry0, fetch=fetch)
        except Exception as e:
            if not self._hist_is_pallas.get(bins):
                raise
            from ..utils.logging import logger
            msg = f"{type(e).__name__}: {e}"[:120]
            logger.warning(
                "Pallas histogram kernel failed at runtime (%s); rebuilding "
                "this pass on the XLA matmul-histogram formulation", msg)
            # session-only fallback: the remote Mosaic compile service has
            # shown TRANSIENT failures (all failing lengths re-probed clean),
            # so don't poison the persistent probe record — the next process
            # retries the kernel and degrades gracefully again if needed
            self._hist_force_xla.add(bins)
            for key in [k for k in self._fns
                        if (k if isinstance(k, str) else k[0]) == f"hist{bins}"]:
                del self._fns[key]
            kind = self._ensure_hist(bins)
            return self._run_pass(kind, params, dataset, batch_size, start, end,
                                  carry0, fetch=fetch)

    def _hist_carry0(self, bins, scales):
        z = np.zeros((len(self.tensor_names), bins), dtype=np.int32)
        return (z, z.copy(), scales)

    def _hist_result(self, carry):
        acc_hi, acc_lo, _ = carry
        acc = (np.asarray(acc_hi, dtype=np.int64) << 16) + np.asarray(acc_lo, np.int64)
        return {n: acc[i] for i, n in enumerate(self.tensor_names)}

    def run_hist(self, params, dataset, stats_min_max, bins, batch_size=32, start=0, end=None):
        """Returns {name: (bins,) int64 summed histogram} (per-shard)."""
        subs = self._sub_runners()
        if subs:
            out = {}
            for r in subs:
                out.update(r.run_hist(params, dataset, stats_min_max, bins,
                                      batch_size, start, end))
            self.last_data_sharding = subs[-1].last_data_sharding
            return out
        names = self.tensor_names
        amax = np.array([max(stats_min_max[n]["max"], -stats_min_max[n]["min"])
                         for n in names], np.float32)
        scales = np.where(amax > 0, bins / amax, 0.0).astype(np.float32)
        carry, _ = self._run_hist_pass(bins, params, dataset, batch_size, start,
                                       end, self._hist_carry0(bins, scales))
        return self._hist_result(carry)

    def run_minmax_hist(self, params, dataset, bins, batch_size=32, start=0, end=None):
        """Fused two-phase calibration: the minmax pass and the |x|-histogram
        pass in one call with a SINGLE host sync at the very end.

        The reference needs two separate full passes with the ranges
        round-tripping through host numpy between them
        (forward_net.py:240-281: forward_get_minmax then forward_get_hist).
        Here the minmax carry stays on device, the binning scales are derived
        from it with on-device arithmetic, and the histogram pass consumes
        them as a traced carry element — over a remote device link this
        halves the blocking round-trips of `-A hist` / `-A kl` calibration.

        Returns (stats_min_max_dict, hists_dict)."""
        subs = self._sub_runners()
        if subs:
            stats, hists = {}, {}
            for r in subs:
                s, h = r.run_minmax_hist(params, dataset, bins, batch_size, start, end)
                stats.update(s)
                hists.update(h)
            self.last_data_sharding = subs[-1].last_data_sharding
            return stats, hists
        names = self.tensor_names
        mm_kind = self._ensure_minmax()
        (lo, hi), _ = self._run_pass(mm_kind, params, dataset, batch_size, start, end,
                                     self._minmax_carry0(), fetch=False)
        amax = jnp.maximum(jnp.asarray(hi), -jnp.asarray(lo))
        # NOTE: binning scales here are computed with on-device f32 division;
        # run_hist derives them in host numpy f32.  On backends where the
        # divide differs by 1 ULP a value sitting exactly on a bin edge can
        # shift one bin vs the two-pass API (within the <=1-bin drift
        # documented in docs/PARITY.md); CPU is bit-identical (tested).
        scales = jnp.where(amax > 0, bins / amax, 0.0).astype(jnp.float32)
        z = jnp.zeros((len(names), bins), dtype=jnp.int32)
        carry0 = (z, z, scales)
        (acc_hi, acc_lo, _), _ = self._run_hist_pass(bins, params, dataset,
                                                     batch_size, start, end,
                                                     carry0, fetch=False)
        # pack the four result arrays into two before the fetch: each leaf of
        # a device_get is its own blocking round-trip over the remote relay
        # (~10-15 ms apiece, measured in the round-3 profiler trace)
        t = len(names)
        ranges, acc = jax.device_get((
            jnp.concatenate([jnp.asarray(lo), jnp.asarray(hi)]),
            jnp.concatenate([acc_hi, acc_lo], axis=0)))
        lo, hi = ranges[:t], ranges[t:]
        stats = {n: {"min": float(lo[i]), "max": float(hi[i])} for i, n in enumerate(names)}
        return stats, self._hist_result((acc[:t], acc[t:], None))

    # -- OCTAV -------------------------------------------------------------
    def run_octav(self, params, dataset, dynamic_sym, batch_size=32, start=0, end=None):
        """Returns {name: {'s_sum':, 'count':, 'min':, 'max':}} per tensor."""
        subs = self._sub_runners()
        if subs:
            out = {}
            for r in subs:
                out.update(r.run_octav(params, dataset, dynamic_sym,
                                       batch_size, start, end))
            self.last_data_sharding = subs[-1].last_data_sharding
            return out
        names = self.tensor_names
        big = np.float32(np.finfo(np.float32).max)

        def combine(taps, valid):
            s_sum = jnp.stack([jnp.sum(taps[n][0] * valid) for n in names])
            mins = jnp.stack([jnp.min(jnp.where(valid > 0, taps[n][1], big))
                              for n in names])
            maxs = jnp.stack([jnp.max(jnp.where(valid > 0, taps[n][2], -big))
                              for n in names])
            return s_sum, mins, maxs

        def accumulate(carry, update):
            return (carry[0] + update[0],
                    jnp.minimum(carry[1], update[1]),
                    jnp.maximum(carry[2], update[2]))

        kind = self._carry_fn(f"octav{int(dynamic_sym)}",
                              make_octav_transform(dynamic_sym), combine, accumulate)
        carry0 = (np.zeros(len(names), np.float32),
                  np.full(len(names), big, np.float32),
                  np.full(len(names), -big, np.float32))
        (s_sum, lo, hi), count = self._run_pass(kind, params, dataset, batch_size,
                                                start, end, carry0)
        return {n: {"s_sum": float(s_sum[i]), "count": count,
                    "min": float(lo[i]), "max": float(hi[i])}
                for i, n in enumerate(names)}

    def memory_analysis(self, params, dataset, bins=2048, batch_size=32):
        """XLA's compiled memory analysis of the histogram stats step (the
        widest calibration program): argument/output/temp bytes per chunk.
        The HBM-budget evidence for transformer-scale models — device
        memory_stats() is unavailable over remote-device relays."""
        subs = self._sub_runners()
        if subs:
            per = [r.memory_analysis(params, dataset, bins, batch_size) for r in subs]
            return {
                "chunks": len(per),
                "params_bytes": per[0]["params_bytes"],
                "batch_bytes": per[0]["batch_bytes"],
                "max_temp_bytes": max(p["max_temp_bytes"] for p in per),
                "peak_step_bytes": max(p["peak_step_bytes"] for p in per),
            }
        scales = np.zeros(len(self.tensor_names), np.float32)
        kind = self._ensure_hist(bins)
        step = self._fns[kind][0]
        p_abs = jax.tree.map(
            lambda v: jax.ShapeDtypeStruct(np.asarray(v).shape, np.asarray(v).dtype),
            self._cast_params(params))
        batch_abs = {n: jax.ShapeDtypeStruct((batch_size,) + tuple(s), np.float32)
                     for n, s in dataset.input_shapes.items()}
        valid_abs = jax.ShapeDtypeStruct((batch_size,), np.float32)
        carry_abs = jax.tree.map(
            lambda v: jax.ShapeDtypeStruct(np.asarray(v).shape, np.asarray(v).dtype),
            self._hist_carry0(bins, scales))
        mem = step.lower(p_abs, batch_abs, valid_abs, carry_abs).compile() \
                  .memory_analysis()
        params_bytes = sum(np.asarray(v).nbytes for v in params.values())
        batch_bytes = sum(int(np.prod(s)) * 4 * batch_size
                          for s in dataset.input_shapes.values())
        temp = int(getattr(mem, "temp_size_in_bytes", 0))
        arg = int(getattr(mem, "argument_size_in_bytes", 0))
        out = int(getattr(mem, "output_size_in_bytes", 0))
        return {
            "chunks": 1,
            "params_bytes": params_bytes,
            "batch_bytes": batch_bytes,
            "max_temp_bytes": temp,
            "peak_step_bytes": arg + out + temp,
        }

    # -- raw tensor collection (ActivationCache analogue) -------------------
    def collect(self, params, dataset, taps, batch_size=8, start=0, end=None):
        """Materialize the given tensors for all samples: {name: (N, *shape)}.
        The TPU analogue of ActivationCache (forward_net.py:23-189) — a
        jitted prefix replay instead of per-node ORT sessions."""
        key = ("collect", tuple(taps))
        if key not in self._fns:
            self._fns[key] = self.ex.make_batched(taps=taps, outputs=())
        fn = self._fns[key]
        chunks = {name: [] for name in taps}
        for idx in dataset.iter_batches(batch_size, start, end):
            batch = self._place(self._stack(dataset.load_batch(idx)))
            _, out = fn(params, batch)
            for name in taps:
                chunks[name].append(np.asarray(jax.device_get(out[name])))
        return {name: np.concatenate(v, axis=0) for name, v in chunks.items()}

    def _stack(self, batch: Dict[str, np.ndarray]):
        """Dataset batches are (B, *declared_shape); vmap maps over axis 0."""
        return batch

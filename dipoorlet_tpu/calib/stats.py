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


def make_octav_transform(dynamic_sym: bool):
    def octav(name, x):
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


def make_hist_transform(amax_map: Dict[str, float], bins: int):
    """Histogram of |x| over (0, data_max) matching np.histogram semantics
    (values == data_max fall in the last bin; all |x| <= data_max by
    construction since data_max is the pass-1 max)."""
    edges_map = {name: np.linspace(0.0, amax if amax > 0 else 1.0, bins + 1)[1:-1]
                 for name, amax in amax_map.items()}

    def hist(name, x):
        absx = jnp.abs(x.astype(jnp.float32).ravel())
        # np.histogram bin assignment: searchsorted over interior edges
        # (right-closed last bin comes out naturally)
        edges = jnp.asarray(edges_map[name], dtype=jnp.float32)
        idx = jnp.searchsorted(edges, absx, side="right").astype(jnp.int32)
        return jnp.zeros((bins,), jnp.int32).at[idx].add(1)

    return hist


class StatsRunner:
    """Batched, jitted statistics forward over a GraphIR.

    With a mesh, full batches are sharded over the 'data' axis and the
    stats forward runs SPMD (XLA reduces on device over ICI); trailing
    partial batches run replicated."""

    def __init__(self, executor: Executor, tensor_names: Optional[Sequence[str]] = None,
                 mesh=None):
        self.ex = executor
        self.tensor_names = list(tensor_names) if tensor_names is not None \
            else self.ex.all_tensor_names()
        self.mesh = mesh
        self._fns = {}

    def _place(self, batch):
        if self.mesh is None:
            return batch
        n = next(iter(batch.values())).shape[0]
        n_shards = int(np.prod(list(self.mesh.shape.values())))
        if n % n_shards == 0:
            from ..parallel.mesh import shard_batch
            return shard_batch(batch, self.mesh)
        return batch

    def _batched(self, kind, transform):
        key = kind
        if key not in self._fns:
            self._fns[key] = self.ex.make_batched(
                taps=self.tensor_names, tap_transform=transform, outputs=())
        return self._fns[key]

    # -- minmax ------------------------------------------------------------
    def run_minmax(self, params, dataset, batch_size=32, start=0, end=None):
        """Returns {name: {'min': scalar, 'max': scalar}} reduced over samples."""
        fn = self._batched("minmax", _per_sample_minmax)
        acc = {}
        for idx in dataset.iter_batches(batch_size, start, end):
            batch = self._place(self._stack(dataset.load_batch(idx)))
            _, taps = fn(params, batch)
            taps = jax.device_get(taps)
            for name, (mn, mx) in taps.items():
                a = acc.setdefault(name, [np.inf, -np.inf])
                a[0] = min(a[0], float(np.min(mn)))
                a[1] = max(a[1], float(np.max(mx)))
        return {name: {"min": v[0], "max": v[1]} for name, v in acc.items()}

    # -- histogram ---------------------------------------------------------
    def run_hist(self, params, dataset, stats_min_max, bins, batch_size=32, start=0, end=None):
        """Returns {name: (bins,) int64 summed histogram} (per-shard)."""
        amax_map = {name: float(max(stats_min_max[name]["max"], -stats_min_max[name]["min"]))
                    for name in self.tensor_names}
        fn = self._batched(f"hist{bins}", make_hist_transform(amax_map, bins))
        acc = {}
        for idx in dataset.iter_batches(batch_size, start, end):
            batch = self._place(self._stack(dataset.load_batch(idx)))
            _, taps = fn(params, batch)
            for name, h in taps.items():
                hsum = np.asarray(jax.device_get(jnp.sum(h, axis=0)), dtype=np.int64)
                if name in acc:
                    acc[name] += hsum
                else:
                    acc[name] = hsum
        return acc

    # -- OCTAV -------------------------------------------------------------
    def run_octav(self, params, dataset, dynamic_sym, batch_size=32, start=0, end=None):
        """Returns {name: {'optimal_s': [per-sample], 'min': m, 'max': M}}."""
        fn = self._batched(f"octav{int(dynamic_sym)}", make_octav_transform(dynamic_sym))
        acc = {}
        for idx in dataset.iter_batches(batch_size, start, end):
            batch = self._place(self._stack(dataset.load_batch(idx)))
            _, taps = fn(params, batch)
            taps = jax.device_get(taps)
            for name, (s, mn, mx) in taps.items():
                a = acc.setdefault(name, {"s_sum": 0.0, "count": 0, "min": np.inf, "max": -np.inf})
                a["s_sum"] += float(np.sum(s))
                a["count"] += int(np.size(s))
                a["min"] = min(a["min"], float(np.min(mn)))
                a["max"] = max(a["max"], float(np.max(mx)))
        return acc

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

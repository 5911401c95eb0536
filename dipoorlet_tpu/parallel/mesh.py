"""Device-mesh utilities: the SPMD replacement for the reference's
torch.distributed/NCCL + rank-file runtime (SURVEY §2.2).

  * calibration batches are sharded over the mesh's 'data' axis — one
    jitted stats forward runs data-parallel, XLA inserting the ICI
    all-reduces for the on-device stat reductions (so single-controller
    runs produce globally-reduced stats with NO separate merge step);
  * reconstruction (AdaRound/BRECQ) shards the cached activation batch
    the same way; the gradient psum appears in the backward pass exactly
    where DDP's allreduce sat (reference adaround.py:121);
  * multi-host (one process per host) keeps the reference's per-shard
    clip semantics and merges them with collectives over DCN
    (reduce_clip_val_collective), replacing the rank-file JSON merge
    (reference utils.py:326-345)."""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axes=("data",), shape=None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def default_data_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """The production mesh: a 1-D 'data' mesh over this process's local
    devices, or None on a single chip.

    This is what makes `python -m dipoorlet_tpu` multi-chip by default —
    the reference achieves the same with one torch.distributed process per
    GPU (reference __main__.py:57-64); here a single controller shards the
    calibration batch over all local chips and XLA inserts the ICI
    reductions.  Multi-host runs keep one process per host: each process
    meshes its own chips and cross-process merge stays on the collective
    path (reduce_clip_val_collective)."""
    devices = jax.local_devices()
    if len(devices) < min_devices:
        return None
    return Mesh(np.asarray(devices), ("data",))


def global_data_mesh(bs_local: Optional[int] = None) -> Optional[Mesh]:
    """A 'data' mesh spanning ALL processes' devices — the SPMD fabric for
    multi-host reconstruction (the reference wraps reconstruction in
    DistributedDataParallel so every rank's gradients allreduce,
    adaround.py:121; here ONE jitted program over this mesh gets the same
    cross-process psum from XLA, riding ICI/DCN).

    `bs_local` is each process's slice of the global batch; when it does
    not divide the per-process device count, the mesh falls back to one
    device per process so the batch still shards evenly.  Returns None
    single-process."""
    if jax.process_count() == 1:
        return None
    n_local = len(jax.local_devices())
    if bs_local is not None and n_local > 1 and bs_local % n_local:
        by_proc = {}
        for d in jax.devices():
            by_proc.setdefault(d.process_index, d)
        devices = [by_proc[p] for p in sorted(by_proc)]
        return Mesh(np.asarray(devices), ("data",))
    return Mesh(np.asarray(jax.devices()), ("data",))


def assert_rank_identical(graph, tag: str) -> None:
    """Enforce the reference's multi-host invariant — "model ... must be
    exactly the same on every GPU" (weight_trans_base.py:16-18) — by
    comparing a crc32 checksum of every initializer across processes.
    No-op single-process; raises on divergence instead of silently
    shipping rank 0's variant."""
    if jax.process_count() == 1:
        return
    import zlib
    from jax.experimental import multihost_utils
    crc = 0
    for name in sorted(graph.initializer):
        arr = np.ascontiguousarray(graph.initializer[name])
        crc = zlib.crc32(arr.tobytes(), zlib.crc32(name.encode(), crc))
    crcs = np.asarray(multihost_utils.process_allgather(jnp.uint32(crc)))
    if not (crcs == crcs[0]).all():
        raise RuntimeError(
            f"{tag}: weight divergence across processes (initializer crcs "
            f"{[hex(int(c)) for c in crcs]}); the multi-host invariant "
            f"(reference weight_trans_base.py:16-18) is broken")


def allreduce_sum_arrays(arrays):
    """Element-wise sum of a list of equal-shape float arrays across
    processes (flattened into ONE allgather round-trip).  Identity
    single-process.

    The per-rank payload transits the collective as float32 (JAX
    downcasts f64 device arrays unless jax_enable_x64 is on), but the
    cross-rank SUM itself is done on host in np.float64 so the
    accumulated BC/BN sufficient statistics don't lose precision as the
    process count grows."""
    if jax.process_count() == 1:
        return [np.asarray(a) for a in arrays]
    from jax.experimental import multihost_utils
    flat = np.concatenate([np.asarray(a, np.float32).ravel() for a in arrays])
    gathered = multihost_utils.process_allgather(jnp.asarray(flat))  # (P, N) f32
    summed = np.asarray(gathered, np.float64).sum(axis=0)
    out, off = [], 0
    for a in arrays:
        a = np.asarray(a)
        out.append(summed[off:off + a.size].reshape(a.shape))
        off += a.size
    return out


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def batched_data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for (n_batches, batch, ...) stacked layouts: the scan/step
    axis stays replicated, the batch axis shards over the mesh."""
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data"):
    """Place a {name: (B, ...)} batch with B sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def pad_to_multiple(batch: Dict[str, np.ndarray], multiple: int):
    """Pad the batch dim so it divides the mesh axis; returns (batch, n_valid)."""
    n = next(iter(batch.values())).shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = multiple - rem
    out = {}
    for k, v in batch.items():
        out[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
    return out, n


def reduce_clip_val_collective(local_clip: Dict[str, list], act_quant: str):
    """Merge per-process clip values across hosts with collectives,
    keeping the reference's exact semantics (utils.py:331-344): global
    min/max for minmax, arithmetic process-mean for hist/mse.

    No-op when running single-process."""
    if jax.process_count() == 1:
        return local_clip
    from jax.experimental import multihost_utils

    names = sorted(local_clip)
    lo = np.asarray([float(np.min(local_clip[n][0])) for n in names], dtype=np.float64)
    hi = np.asarray([float(np.max(local_clip[n][1])) for n in names], dtype=np.float64)
    gathered_lo = multihost_utils.process_allgather(jnp.asarray(lo))  # (P, T)
    gathered_hi = multihost_utils.process_allgather(jnp.asarray(hi))
    if act_quant == "minmax":
        lo_r = np.min(np.asarray(gathered_lo), axis=0)
        hi_r = np.max(np.asarray(gathered_hi), axis=0)
    else:
        lo_r = np.mean(np.asarray(gathered_lo), axis=0)
        hi_r = np.mean(np.asarray(gathered_hi), axis=0)
    return {n: [np.float64(lo_r[i]), np.float64(hi_r[i])] for i, n in enumerate(names)}

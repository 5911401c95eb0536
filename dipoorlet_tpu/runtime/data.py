"""Calibration data pipeline.

Format parity with the reference (forward_net.py:459-464): raw float32
`.bin` files laid out as  input_dir/<input_name>/<idx>.bin .

The TPU path loads whole batches at once (one host->device transfer per
batch) instead of the reference's one-sample-at-a-time feed."""
from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np


class CalibDataset:
    """Random-access batched view over the .bin calibration directory."""

    def __init__(self, input_dir: str, input_shapes: Dict[str, Sequence[int]], num_samples: int):
        self.input_dir = input_dir
        self.input_shapes = {k: tuple(v) for k, v in input_shapes.items()}
        self.num = num_samples

    def __len__(self):
        return self.num

    def load_sample(self, idx: int) -> Dict[str, np.ndarray]:
        out = {}
        for name, shape in self.input_shapes.items():
            arr = np.fromfile(os.path.join(self.input_dir, name, f"{idx}.bin"), dtype=np.float32)
            out[name] = arr.reshape(shape)
        return out

    def load_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Returns dict name -> (B, *shape) stacked batch.

        Uses the native C++ threaded loader (runtime/native_loader.py) when
        available; falls back to per-sample numpy reads."""
        from .native_loader import load_batch_native
        batches = {}
        for name, shape in self.input_shapes.items():
            arr = load_batch_native(self.input_dir, name, shape, indices)
            if arr is None:
                arr = np.empty((len(indices),) + shape, dtype=np.float32)
                for i, idx in enumerate(indices):
                    arr[i] = np.fromfile(
                        os.path.join(self.input_dir, name, f"{idx}.bin"),
                        dtype=np.float32).reshape(shape)
            batches[name] = arr
        return batches

    def iter_batches(self, batch_size: int, start: int = 0, end: int = None):
        end = self.num if end is None else end
        for st in range(start, end, batch_size):
            yield list(range(st, min(st + batch_size, end)))

    def stream_batches(self, batch_size: int, start: int = 0, end: int = None):
        """Yield (indices, {name: (B, *shape)}) batches with the NEXT
        batch's disk reads overlapped with the caller's compute.

        This is the large-dataset path (shards over the device-resident
        budget stream per batch, stats.py): the C++ double-buffered
        prefetcher (native/dataloader.cpp dl_prefetch_*) reads batch N+1
        on its own threads while JAX dispatches batch N.  Falls back to
        synchronous load_batch when the native loader is unavailable.
        Reference analogue: the per-sample streaming loop at
        forward_net.py:207-235, which never overlaps IO with compute."""
        end = self.num if end is None else end
        indices = list(range(start, end))
        if not indices:
            return
        from .native_loader import NativePrefetcher, get_lib
        if get_lib() is None:
            for idx in self.iter_batches(batch_size, start, end):
                yield idx, self.load_batch(idx)
            return
        prefetchers = {
            name: NativePrefetcher(self.input_dir, name, shape, indices, batch_size)
            for name, shape in self.input_shapes.items()}
        try:
            for off in range(0, len(indices), batch_size):
                chunk = indices[off:off + batch_size]
                batch = {}
                for name, pf in prefetchers.items():
                    arr = next(pf)
                    if arr.shape[0] != len(chunk):
                        raise IOError(
                            f"prefetcher for {name} returned {arr.shape[0]} "
                            f"samples, expected {len(chunk)}")
                    batch[name] = arr
                yield chunk, batch
        finally:
            for pf in prefetchers.values():
                pf.close()


def save_sample(input_dir: str, name: str, idx: int, arr: np.ndarray):
    d = os.path.join(input_dir, name)
    os.makedirs(d, exist_ok=True)
    arr.astype(np.float32).tofile(os.path.join(d, f"{idx}.bin"))


def make_synthetic_dataset(input_dir: str, input_shapes: Dict[str, Sequence[int]],
                           num_samples: int, seed: int = 0) -> CalibDataset:
    """Generate a random calibration set (for tests/benchmarks)."""
    rng = np.random.RandomState(seed)
    for name, shape in input_shapes.items():
        for idx in range(num_samples):
            save_sample(input_dir, name, idx, rng.randn(*shape).astype(np.float32))
    return CalibDataset(input_dir, input_shapes, num_samples)

"""Calibration data pipeline.

Format parity with the reference (forward_net.py:459-464): raw float32
`.bin` files laid out as  input_dir/<input_name>/<idx>.bin .

The TPU path loads whole batches at once (one host->device transfer per
batch) instead of the reference's one-sample-at-a-time feed."""
from __future__ import annotations

import os
from typing import Dict, Iterator, Sequence

import numpy as np


def input_data_generator(input_dir: str, input_name_list: Sequence[str],
                         data_st_idx: int, data_ed_idx: int) -> Iterator[Dict[str, np.ndarray]]:
    for idx in range(data_st_idx, data_ed_idx):
        data = {}
        for name in input_name_list:
            data[name] = np.fromfile(os.path.join(input_dir, name, f"{idx}.bin"), dtype=np.float32)
        yield data


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

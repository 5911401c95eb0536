"""Large-dataset streaming calibration path.

Shards over StatsRunner.DEVICE_RESIDENT_BYTES stream per batch through a
device-resident carry instead of living in HBM (stats.py _run_pass final
branch) — the analogue of the reference's per-sample streaming loop
(forward_net.py:207-235).  These tests force the budget to zero so the
streaming branch runs on an ordinary small dataset and assert it matches
the device-resident path bit-for-bit, and exercise the C++
double-buffered prefetcher (native/dataloader.cpp dl_prefetch_*) that
feeds it.
"""
import numpy as np
import pytest

from dipoorlet_tpu.calib import tensor_calibration
from dipoorlet_tpu.calib.stats import StatsRunner
from dipoorlet_tpu import onnx_ir as oir
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph
from dipoorlet_tpu.runtime.data import CalibDataset, make_synthetic_dataset


class Args:
    def __init__(self, **kw):
        self.skip_layers = []
        self.deploy = "trt"
        self.batch_size = 4
        self.bins = 128
        self.threshold = 0.99999
        self.rank = 0
        self.world_size = 1
        for k, v in kw.items():
            setattr(self, k, v)


@pytest.fixture(scope="module")
def model_and_data(tmp_path_factory):
    rng = np.random.RandomState(1)
    w1 = oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.3, "w1")
    w2 = oir.array_to_tensor(rng.randn(6, 4, 3, 3).astype(np.float32) * 0.3, "w2")
    conv = dict(kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                dilations=[1, 1], group=1)
    nodes = [
        oir.make_node("Conv", ["x", "w1"], ["c1"], name="conv1", **conv),
        oir.make_node("Relu", ["c1"], ["r1"], name="relu1"),
        oir.make_node("Conv", ["r1", "w2"], ["y"], name="conv2", **conv),
    ]
    graph = oir.make_graph(
        nodes, "g",
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 8, 8])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 6, 8, 8])],
        initializer=[w1, w2])
    g = GraphIR(oir.make_model(graph))
    simplify_graph(g)
    data_dir = str(tmp_path_factory.mktemp("stream_calib"))
    make_synthetic_dataset(data_dir, {"x": [1, 3, 8, 8]}, 11, seed=9)
    return g, data_dir


def _calibrate(g, data_dir, algo):
    act, weight = tensor_calibration(
        g, Args(act_quant=algo, input_dir=data_dir, data_num=11))
    return act


@pytest.mark.parametrize("algo", ["minmax", "hist", "mse"])
def test_streaming_branch_matches_device_resident(model_and_data, monkeypatch, algo):
    g, data_dir = model_and_data
    resident = _calibrate(g, data_dir, algo)
    # budget 0 -> every shard takes the streaming branch (stats.py
    # _run_pass final else), now fed by CalibDataset.stream_batches
    monkeypatch.setattr(StatsRunner, "DEVICE_RESIDENT_BYTES", 0)
    streamed = _calibrate(g, data_dir, algo)
    assert resident.keys() == streamed.keys()
    for name in resident:
        np.testing.assert_array_equal(
            np.asarray(resident[name], np.float64),
            np.asarray(streamed[name], np.float64),
            err_msg=f"{algo}:{name}")


def test_stream_batches_prefetcher_yields_identical_data(tmp_path):
    """stream_batches (native double-buffered prefetcher) must deliver the
    same bytes and chunking as the synchronous load_batch path, including
    the short final batch and multi-input lockstep."""
    shapes = {"a": [2, 3], "b": [5]}
    make_synthetic_dataset(str(tmp_path), shapes, 7, seed=2)
    ds = CalibDataset(str(tmp_path), shapes, 7)
    seen = list(ds.stream_batches(3))
    assert [idx for idx, _ in seen] == [[0, 1, 2], [3, 4, 5], [6]]
    for idx, batch in seen:
        want = ds.load_batch(idx)
        assert set(batch) == set(want)
        for name in want:
            np.testing.assert_array_equal(batch[name], want[name])


def test_stream_batches_empty_range(tmp_path):
    shapes = {"a": [2]}
    make_synthetic_dataset(str(tmp_path), shapes, 3, seed=0)
    ds = CalibDataset(str(tmp_path), shapes, 3)
    assert list(ds.stream_batches(2, start=2, end=2)) == []

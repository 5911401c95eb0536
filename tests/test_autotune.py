"""Probe-once fast-path gating (calib/autotune.py).

The verdict on round 1: the Pallas OCTAV kernel and the whole-pass
lax.scan calibration driver were env-var opt-ins.  Now the first real
use probes (compile + numerics check) and caches the outcome per
backend; these tests pin the cache to a temp file and assert the
decision lifecycle and that scan/non-scan paths agree bit-for-bit."""
import json
import os

import numpy as np
import pytest

from dipoorlet_tpu.calib import autotune
from dipoorlet_tpu.calib.stats import StatsRunner
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu.runtime.data import CalibDataset, make_synthetic_dataset
from dipoorlet_tpu import onnx_ir as oir


@pytest.fixture()
def isolated_cache(tmp_path, monkeypatch):
    path = str(tmp_path / "autotune.json")
    monkeypatch.setenv("DIPOORLET_TPU_AUTOTUNE_CACHE", path)
    monkeypatch.delenv("DIPOORLET_TPU_PALLAS", raising=False)
    monkeypatch.delenv("DIPOORLET_TPU_SCAN_CALIB", raising=False)
    saved = dict(autotune._mem_cache)
    autotune._mem_cache.clear()
    yield path
    autotune._mem_cache.clear()
    autotune._mem_cache.update(saved)


def test_env_override_beats_probe(isolated_cache, monkeypatch):
    monkeypatch.setenv("DIPOORLET_TPU_PALLAS", "1")
    assert autotune.cached_decision("pallas_octav") is True
    monkeypatch.setenv("DIPOORLET_TPU_PALLAS", "0")
    assert autotune.cached_decision("pallas_octav") is False


def test_undecided_then_recorded(isolated_cache):
    assert autotune.cached_decision("scan_calib") is None
    autotune.record("scan_calib", True, 1.5)
    assert autotune.cached_decision("scan_calib") is True
    # persisted: a fresh in-memory view reloads from disk
    autotune._mem_cache.clear()
    assert autotune.cached_decision("scan_calib") is True
    rec = json.load(open(isolated_cache))
    (key,) = rec.keys()
    assert key.startswith("scan_calib:cpu:")
    assert rec[key]["probe_seconds"] == 1.5


def test_pallas_probe_on_cpu_disables_and_caches(isolated_cache):
    assert autotune.pallas_octav_enabled() is False
    rec = json.load(open(isolated_cache))
    (key,) = rec.keys()
    assert rec[key]["note"] == "cpu backend"


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    rng = np.random.RandomState(0)
    w = oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.3, "w")
    nodes = [
        oir.make_node("Conv", ["x", "w"], ["c"], name="conv",
                      kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                      dilations=[1, 1], group=1),
        oir.make_node("Relu", ["c"], ["y"], name="relu"),
    ]
    graph = oir.make_graph(nodes, "g",
                           [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 6, 6])],
                           [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 4, 6, 6])])
    graph.initializer = [w]
    g = GraphIR(oir.make_model(graph))
    simplify_graph(g)
    data_dir = str(tmp_path_factory.mktemp("auto_calib"))
    make_synthetic_dataset(data_dir, {"x": [1, 3, 6, 6]}, 8, seed=3)
    return g, data_dir


def test_first_pass_probes_scan_and_matches_loop(isolated_cache, tiny):
    g, data_dir = tiny
    ex = Executor(g)
    params = ex.init_params()
    ds = CalibDataset(data_dir, ex.input_shapes(), 8)

    # undecided -> the first pass compiles the scan as the probe
    runner = StatsRunner(ex)
    assert autotune.cached_decision("scan_calib") is None
    scan_mm = runner.run_minmax(params, ds, batch_size=4)
    assert autotune.cached_decision("scan_calib") is True  # CPU compiles fast

    # forced per-batch loop must agree bit-for-bit
    os.environ["DIPOORLET_TPU_SCAN_CALIB"] = "0"
    try:
        loop_mm = StatsRunner(Executor(g)).run_minmax(params, ds, batch_size=4)
    finally:
        del os.environ["DIPOORLET_TPU_SCAN_CALIB"]
    assert scan_mm == loop_mm


def test_failed_scan_probe_falls_back(isolated_cache, tiny, monkeypatch):
    g, data_dir = tiny
    ex = Executor(g)
    params = ex.init_params()
    ds = CalibDataset(data_dir, ex.input_shapes(), 8)
    runner = StatsRunner(ex)

    def boom(*a, **k):
        raise RuntimeError("synthetic compile failure")

    monkeypatch.setattr(StatsRunner, "_scan_fn", boom)
    mm = runner.run_minmax(params, ds, batch_size=4)
    assert autotune.cached_decision("scan_calib") is False
    assert set(mm) == set(ex.all_tensor_names())
    # a later runner honours the cached False without re-probing
    monkeypatch.undo()
    mm2 = StatsRunner(Executor(g)).run_minmax(params, ds, batch_size=4)
    assert mm2 == mm


def test_hist_cfg_malformed_env_falls_back(monkeypatch):
    """A malformed DIPOORLET_TPU_PALLAS_HIST_CFG must fall back to the
    default instead of crashing the stats pass (advisor round-4 finding);
    resolution also happens OUTSIDE jit, so changed env applies per-call."""
    from dipoorlet_tpu.calib.kernels import _hist_cfg
    monkeypatch.setenv("DIPOORLET_TPU_PALLAS_HIST_CFG", "garbage")
    assert _hist_cfg(2048) == ("i8", None)
    monkeypatch.setenv("DIPOORLET_TPU_PALLAS_HIST_CFG", "notavariant:64")
    assert _hist_cfg(2048) == ("i8", None)
    monkeypatch.setenv("DIPOORLET_TPU_PALLAS_HIST_CFG", "bf16:zz")
    assert _hist_cfg(2048) == ("i8", None)
    monkeypatch.setenv("DIPOORLET_TPU_PALLAS_HIST_CFG", "bf16:64")
    assert _hist_cfg(2048) == ("bf16", 64)


def test_histogram_pallas_env_cfg_applies_per_call(monkeypatch):
    """Counts stay exact through the default (env-resolved) path for two
    different env configs within one process — the config is NOT baked
    into the first trace."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from dipoorlet_tpu.calib.kernels import histogram_pallas
    rng = np.random.RandomState(42)
    idx = rng.randint(0, 512, 4000).astype(np.int32)
    ref = np.bincount(idx, minlength=512)
    for cfg in ("i8:16", "i8:64"):
        monkeypatch.setenv("DIPOORLET_TPU_PALLAS_HIST_CFG", cfg)
        with pltpu.force_tpu_interpret_mode():
            h = np.asarray(histogram_pallas(jnp.asarray(idx), 512))
        np.testing.assert_array_equal(h, ref)

"""Pallas kernel correctness tests (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def octav_numpy(x, dynamic_sym=False):
    abs_x = np.abs(x).ravel()
    data_min, data_max = x.min(), x.max()
    unsigned = 4 if (dynamic_sym and abs(data_min) < 1e-6) else 1
    s_n = abs_x.sum() / max((abs_x > 0).sum(), 1)
    for _ in range(20):
        gt = abs_x > s_n
        s_next = abs_x[gt].sum() / (1 / 4**8 / 3 / unsigned * (~gt).sum() + gt.sum())
        if abs(s_next - s_n) < 1e-6:
            break
        s_n = s_next
    return s_n, data_min, data_max


@pytest.mark.parametrize("n", [100, 1024, 5000])
def test_octav_pallas_interpret(n):
    from dipoorlet_tpu.calib.kernels import octav_pallas
    rng = np.random.RandomState(n)
    x = (rng.randn(n) * 2).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        s, mn, mx = octav_pallas(jnp.asarray(x))
    s_ref, mn_ref, mx_ref = octav_numpy(x)
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-4)
    np.testing.assert_allclose(float(mn), mn_ref, rtol=1e-6)
    np.testing.assert_allclose(float(mx), mx_ref, rtol=1e-6)


def test_octav_pallas_relu_range():
    from dipoorlet_tpu.calib.kernels import octav_pallas
    rng = np.random.RandomState(0)
    x = np.abs(rng.randn(2000)).astype(np.float32)
    x[0] = 0.0
    with pltpu.force_tpu_interpret_mode():
        s, mn, mx = octav_pallas(jnp.asarray(x), dynamic_sym=True)
    s_ref, mn_ref, mx_ref = octav_numpy(x, dynamic_sym=True)
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-4)


@pytest.mark.parametrize("variant", ["i8", "i16", "bf16"])
@pytest.mark.parametrize("n,bins", [(500, 128), (8192, 2048), (9000, 2048),
                                    (40000, 2048), (64, 7)])
def test_histogram_pallas_exact(n, bins, variant):
    """Bit-exact counts vs np.bincount; -1 sentinel entries count nowhere.
    Both one-hot dtypes (int8 MXU / bf16 packed) must agree exactly."""
    from dipoorlet_tpu.calib.kernels import histogram_pallas
    rng = np.random.RandomState(n + bins)
    idx = rng.randint(0, bins, n).astype(np.int32)
    idx[rng.rand(n) < 0.1] = -1
    with pltpu.force_tpu_interpret_mode():
        h = np.asarray(histogram_pallas(jnp.asarray(idx), bins, variant=variant))
    ref = np.bincount(idx[idx >= 0], minlength=bins)
    np.testing.assert_array_equal(h, ref)


def test_histogram_pallas_matches_matmul_histogram():
    """Drop-in contract with the XLA formulation: identical integer counts."""
    from dipoorlet_tpu.calib.kernels import histogram_pallas
    from dipoorlet_tpu.calib.stats import matmul_histogram
    rng = np.random.RandomState(0)
    bins = 2048
    idx = jnp.asarray(rng.randint(0, bins, 20000).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        h_pl = np.asarray(histogram_pallas(idx, bins))
    h_mx = np.asarray(jax.jit(lambda v: matmul_histogram(v, bins))(idx))
    np.testing.assert_array_equal(h_pl, h_mx)


def test_run_hist_pallas_formulation_matches_xla(tmp_path, monkeypatch):
    """StatsRunner's Pallas step (forced via env on CPU, under interpret
    mode) must produce the same summed histograms as the XLA step —
    including masked partial-batch samples."""
    from dipoorlet_tpu import onnx_ir as oir
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.graph.passes import simplify_graph
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset, make_synthetic_dataset
    from dipoorlet_tpu.calib.stats import StatsRunner

    rng = np.random.RandomState(1)
    w = oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.3, "w")
    nodes = [oir.make_node("Conv", ["x", "w"], ["c"], name="conv",
                           kernel_shape=[3, 3], pads=[1, 1, 1, 1],
                           strides=[1, 1], dilations=[1, 1], group=1),
             oir.make_node("Relu", ["c"], ["y"], name="relu")]
    graph = oir.make_graph(
        nodes, "g",
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 6, 6])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 4, 6, 6])])
    graph.initializer = [w]
    g = GraphIR(oir.make_model(graph))
    simplify_graph(g)
    data_dir = str(tmp_path / "calib")
    make_synthetic_dataset(data_dir, {"x": [1, 3, 6, 6]}, 10, seed=3)
    ex = Executor(g)
    params = ex.init_params()
    ds = CalibDataset(data_dir, ex.input_shapes(), 10)
    bins = 128

    def run(env):
        monkeypatch.setenv("DIPOORLET_TPU_PALLAS_HIST", env)
        r = StatsRunner(ex)
        mm = r.run_minmax(params, ds, batch_size=4)  # 10 -> partial last batch
        return r.run_hist(params, ds, mm, bins, batch_size=4)

    with pltpu.force_tpu_interpret_mode():
        h_pl = run("1")
    h_xla = run("0")
    assert set(h_pl) == set(h_xla)
    for name in h_pl:
        np.testing.assert_array_equal(h_pl[name], h_xla[name])


def test_run_hist_falls_back_when_kernel_fails(tmp_path, monkeypatch):
    """A Pallas kernel that probed green can still fail at a new input
    length (fresh Mosaic compile, transient remote-compile failures): the
    hist pass must rebuild on the XLA formulation and continue, recording
    the auto-disable, not crash production calibration."""
    from dipoorlet_tpu import onnx_ir as oir
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.graph.passes import simplify_graph
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset, make_synthetic_dataset
    from dipoorlet_tpu.calib import stats as stats_mod
    from dipoorlet_tpu.calib.stats import StatsRunner

    rng = np.random.RandomState(1)
    w = oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.3, "w")
    nodes = [oir.make_node("Conv", ["x", "w"], ["y"], name="conv",
                           kernel_shape=[3, 3], pads=[1, 1, 1, 1],
                           strides=[1, 1], dilations=[1, 1], group=1)]
    graph = oir.make_graph(
        nodes, "g",
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 6, 6])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 4, 6, 6])],
        initializer=[w])
    g = GraphIR(oir.make_model(graph))
    simplify_graph(g)
    data_dir = str(tmp_path / "calib")
    make_synthetic_dataset(data_dir, {"x": [1, 3, 6, 6]}, 8, seed=3)
    ex = Executor(g)
    params = ex.init_params()
    ds = CalibDataset(data_dir, ex.input_shapes(), 8)
    monkeypatch.setenv("DIPOORLET_TPU_PALLAS_HIST", "1")  # force pallas step
    monkeypatch.setenv("DIPOORLET_TPU_AUTOTUNE_CACHE",
                       str(tmp_path / "autotune.json"))

    def boom(*a, **kw):
        raise RuntimeError("simulated Mosaic HTTP 500")

    monkeypatch.setattr("dipoorlet_tpu.calib.kernels.histogram_pallas", boom)
    r = StatsRunner(ex)
    mm = r.run_minmax(params, ds, batch_size=4)
    h_fallback = r.run_hist(params, ds, mm, 64, batch_size=4)
    assert r._hist_force_xla == {64}

    monkeypatch.setenv("DIPOORLET_TPU_PALLAS_HIST", "0")
    r2 = StatsRunner(ex)
    h_xla = r2.run_hist(params, ds, mm, 64, batch_size=4)
    for name in h_xla:
        np.testing.assert_array_equal(h_fallback[name], h_xla[name])

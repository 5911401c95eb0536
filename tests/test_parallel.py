"""SPMD tests on the 8-device virtual CPU mesh: sharded calibration
equals unsharded, and data-parallel reconstruction runs with the batch
sharded over the mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dipoorlet_tpu import onnx_ir as oir
from dipoorlet_tpu.calib.stats import StatsRunner
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph
from dipoorlet_tpu.parallel import get_mesh, reduce_clip_val_collective, shard_batch
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu.runtime.data import make_synthetic_dataset, CalibDataset


def _model():
    rng = np.random.RandomState(0)
    w = oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.4, "w")
    nodes = [
        oir.make_node("Conv", ["x", "w"], ["c"], name="conv", kernel_shape=[3, 3],
                      pads=[1, 1, 1, 1], strides=[1, 1], dilations=[1, 1], group=1),
        oir.make_node("Relu", ["c"], ["y"], name="relu"),
    ]
    g = oir.make_graph(nodes, "g",
                       [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 8, 8])],
                       [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 4, 8, 8])],
                       initializer=[w])
    gi = GraphIR(oir.make_model(g))
    simplify_graph(gi)
    return gi


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_stats_match_unsharded(tmp_path):
    g = _model()
    ex = Executor(g)
    params = ex.init_params()
    data_dir = str(tmp_path / "d")
    make_synthetic_dataset(data_dir, {"x": [1, 3, 8, 8]}, 16, seed=5)
    ds = CalibDataset(data_dir, ex.input_shapes(), 16)

    plain = StatsRunner(ex)
    ref = plain.run_minmax(params, ds, batch_size=8)

    mesh = get_mesh(8, axes=("data",))
    sharded = StatsRunner(ex, mesh=mesh)
    got = sharded.run_minmax(params, ds, batch_size=8)
    for name in ref:
        np.testing.assert_allclose(got[name]["min"], ref[name]["min"], rtol=1e-6)
        np.testing.assert_allclose(got[name]["max"], ref[name]["max"], rtol=1e-6)

    stats = ref
    h_ref = plain.run_hist(params, ds, stats, 64, batch_size=8)
    h_got = sharded.run_hist(params, ds, stats, 64, batch_size=8)
    for name in h_ref:
        np.testing.assert_array_equal(h_got[name], h_ref[name])


def test_fused_minmax_hist_matches_two_pass(tmp_path):
    """run_minmax_hist (single host sync) must equal run_minmax + run_hist."""
    g = _model()
    ex = Executor(g)
    params = ex.init_params()
    data_dir = str(tmp_path / "d")
    make_synthetic_dataset(data_dir, {"x": [1, 3, 8, 8]}, 12, seed=9)
    ds = CalibDataset(data_dir, ex.input_shapes(), 12)

    runner = StatsRunner(ex)
    stats_ref = runner.run_minmax(params, ds, batch_size=8)
    h_ref = runner.run_hist(params, ds, stats_ref, 64, batch_size=8)
    stats_got, h_got = runner.run_minmax_hist(params, ds, 64, batch_size=8)
    for name in stats_ref:
        np.testing.assert_allclose(stats_got[name]["min"], stats_ref[name]["min"], rtol=1e-6)
        np.testing.assert_allclose(stats_got[name]["max"], stats_ref[name]["max"], rtol=1e-6)
        np.testing.assert_array_equal(h_got[name], h_ref[name])


def test_sharded_reconstruction_step():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dipoorlet_tpu.quant import compute_qparams, platform_setting_table
    from dipoorlet_tpu.wtrans.reconstruct import LayerSpec, learn_block, node_signature

    g = _model()
    node = [n for n in g.graph.node if n.name == "conv"][0]
    w = jnp.asarray(g.get_initializer("w"))
    wr = np.asarray(w).reshape(4, -1)
    qp = compute_qparams(platform_setting_table["trt"]["qw_params"],
                         wr.min(-1), wr.max(-1))
    spec = LayerSpec(node_sig=node_signature(node), weight=w, bias=None, qp=qp,
                     per_channel=True, transposed=False, relu=True, acti_qp=None)
    mesh = get_mesh(8, axes=("data",))
    sh = NamedSharding(mesh, P("data"))
    rng = np.random.RandomState(1)
    q_in = rng.randn(16, 3, 8, 8).astype(np.float32)
    fp_out = np.maximum(rng.randn(16, 4, 8, 8), 0).astype(np.float32)
    masks = learn_block([spec], q_in, fp_out, batch_size=16, max_epoch=2,
                        total_iter=2, data_sharding=sh)
    assert np.asarray(masks[0]).shape == w.shape


def test_collective_reduce_single_process_noop():
    clip = {"a": [np.float64(-1.0), np.float64(2.0)]}
    out = reduce_clip_val_collective(clip, "minmax")
    assert out["a"][0] == -1.0 and out["a"][1] == 2.0

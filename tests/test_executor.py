"""End-to-end forward parity: GraphIR + Executor vs the original torch model.

Mirrors the reference's reliance on ORT numerical fidelity
(/root/reference/dipoorlet/forward_net.py) — here validated against torch."""
import numpy as np
import pytest
import torch

from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.runtime import Executor
from torch_export import MODEL_ZOO, export


@pytest.fixture(scope="module", params=["resnet18", "mobilenet_v2", "regnet_600m", "resnet50"])
def model_pair(request, tmp_path_factory):
    name = request.param
    torch.manual_seed(0)
    tm = MODEL_ZOO[name](num_classes=16)
    tm.eval()
    path = str(tmp_path_factory.mktemp("onnx") / f"{name}.onnx")
    export(tm, torch.randn(1, 3, 32, 32), path)
    graph = GraphIR.load(path)
    return name, tm, graph


def test_forward_parity(model_pair, rng):
    name, tm, graph = model_pair
    ex = Executor(graph)
    params = ex.init_params()
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    out, _ = ex.forward(params, {"input": x})
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(out["output"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_batched_vmap_forward(model_pair, rng):
    name, tm, graph = model_pair
    ex = Executor(graph)
    params = ex.init_params()
    xb = rng.randn(4, 1, 3, 32, 32).astype(np.float32)
    f = ex.make_batched()
    out, _ = f(params, {"input": xb})
    with torch.no_grad():
        ref = tm(torch.from_numpy(xb.reshape(4, 3, 32, 32))).numpy()
    got = np.asarray(out["output"]).reshape(ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_taps_collect_intermediates(model_pair, rng):
    name, tm, graph = model_pair
    ex = Executor(graph)
    params = ex.init_params()
    names = ex.all_tensor_names()
    assert len(names) > 10
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    _, taps = ex.forward(params, {"input": x}, taps=names[:5])
    assert len(taps) == 5


def test_tap_transform_stats(model_pair, rng):
    name, tm, graph = model_pair
    ex = Executor(graph)
    params = ex.init_params()
    names = ex.all_tensor_names()
    import jax.numpy as jnp

    def minmax(_, arr):
        return jnp.min(arr), jnp.max(arr)

    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    _, taps = ex.forward(params, {"input": x}, taps=names, tap_transform=minmax)
    assert all(np.isfinite(float(v[0])) for v in taps.values())


def test_shapes_inferred(model_pair):
    name, tm, graph = model_pair
    ex = Executor(graph)
    for t in ex.all_tensor_names():
        shape = graph.get_tensor_shape(t)
        assert shape is not None and all(isinstance(s, int) for s in shape)

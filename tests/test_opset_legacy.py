"""Legacy-opset op semantics: attribute-form Clip/Pad/Squeeze/Upsample and
opset<13 Softmax flattening (the reference converts models to opset 13 via
onnx.version_converter at __main__.py:99-100; we execute both forms)."""
import numpy as np

from dipoorlet_tpu import onnx_ir as oir
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph
from dipoorlet_tpu.runtime import Executor


def _run_model(nodes, inputs, outputs, inits, feed, opset=9):
    g = oir.make_graph(nodes, "g", inputs, outputs, initializer=inits)
    model = oir.make_model(g, opset_imports=[oir.make_opsetid("", opset)])
    gi = GraphIR(model)
    simplify_graph(gi)
    ex = Executor(gi)
    out, _ = ex.forward(ex.init_params(), feed)
    return {k: np.asarray(v) for k, v in out.items()}


def test_clip_attrs_opset6(rng):
    x = rng.randn(2, 8).astype(np.float32) * 5
    out = _run_model(
        [oir.make_node("Clip", ["x"], ["y"], name="c", min=-1.0, max=2.0)],
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [2, 8])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [2, 8])],
        [], {"x": x})
    np.testing.assert_allclose(out["y"], np.clip(x, -1, 2))


def test_pad_attrs_opset2(rng):
    x = rng.randn(1, 2, 4, 4).astype(np.float32)
    out = _run_model(
        [oir.make_node("Pad", ["x"], ["y"], name="p",
                       pads=[0, 0, 1, 1, 0, 0, 1, 1], mode="constant")],
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 2, 4, 4])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 2, 6, 6])],
        [], {"x": x})
    assert out["y"].shape == (1, 2, 6, 6)
    np.testing.assert_allclose(out["y"][:, :, 1:5, 1:5], x)


def test_squeeze_attr_opset11(rng):
    x = rng.randn(1, 3, 1, 5).astype(np.float32)
    out = _run_model(
        [oir.make_node("Squeeze", ["x"], ["y"], name="s", axes=[0, 2])],
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 3, 1, 5])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [3, 5])],
        [], {"x": x})
    assert out["y"].shape == (3, 5)


def test_softmax_legacy_flatten(rng):
    # opset<13 Softmax flattens to 2D at axis (default 1)
    x = rng.randn(2, 3, 4).astype(np.float32)
    out = _run_model(
        [oir.make_node("Softmax", ["x"], ["y"], name="sm")],
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [2, 3, 4])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [2, 3, 4])],
        [], {"x": x}, opset=11)
    flat = x.reshape(2, 12)
    e = np.exp(flat - flat.max(1, keepdims=True))
    ref = (e / e.sum(1, keepdims=True)).reshape(2, 3, 4)
    np.testing.assert_allclose(out["y"], ref, rtol=1e-5)


def test_upsample_opset9(rng):
    x = rng.randn(1, 2, 3, 3).astype(np.float32)
    scales = oir.array_to_tensor(np.array([1, 1, 2, 2], np.float32), "scales")
    out = _run_model(
        [oir.make_node("Upsample", ["x", "scales"], ["y"], name="up", mode="nearest")],
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 2, 3, 3])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 2, 6, 6])],
        [scales], {"x": x}, opset=9)
    np.testing.assert_allclose(out["y"], np.repeat(np.repeat(x, 2, 2), 2, 3))

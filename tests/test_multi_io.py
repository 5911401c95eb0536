"""Multi-input / multi-output model support through the full pipeline
(the reference's input_data_generator iterates all input names,
forward_net.py:459-464)."""
import json
import os

import numpy as np
import pytest

from dipoorlet_tpu import onnx_ir as oir
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph
from dipoorlet_tpu.runtime.data import make_synthetic_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    ws = tmp_path_factory.mktemp("mio")
    rng = np.random.RandomState(0)
    inits = [
        oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.4, "w1"),
        oir.array_to_tensor(rng.randn(4, 3, 3, 3).astype(np.float32) * 0.4, "w2"),
    ]
    nodes = [
        oir.make_node("Conv", ["a", "w1"], ["c1"], name="conv_a",
                      kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                      dilations=[1, 1], group=1),
        oir.make_node("Conv", ["b", "w2"], ["c2"], name="conv_b",
                      kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                      dilations=[1, 1], group=1),
        oir.make_node("Add", ["c1", "c2"], ["s"], name="add"),
        oir.make_node("Relu", ["s"], ["out1"], name="relu"),
        oir.make_node("GlobalAveragePool", ["s"], ["out2"], name="gap"),
    ]
    g = oir.make_graph(
        nodes, "mio",
        [oir.make_tensor_value_info("a", oir.DataType.FLOAT, [1, 3, 8, 8]),
         oir.make_tensor_value_info("b", oir.DataType.FLOAT, [1, 3, 8, 8])],
        [oir.make_tensor_value_info("out1", oir.DataType.FLOAT, [1, 4, 8, 8]),
         oir.make_tensor_value_info("out2", oir.DataType.FLOAT, [1, 4, 1, 1])],
        initializer=inits)
    gi = GraphIR(oir.make_model(g))
    simplify_graph(gi)
    model_path = str(ws / "mio.onnx")
    gi.output_dir = ""
    from dipoorlet_tpu.onnx_ir import save_model
    save_model(gi.model, model_path)
    make_synthetic_dataset(str(ws / "data"), {"a": [1, 3, 8, 8], "b": [1, 3, 8, 8]},
                           8, seed=4)
    return ws, model_path


def test_multi_io_pipeline(env):
    ws, model_path = env
    from dipoorlet_tpu.__main__ import main
    out = str(ws / "out")
    main(["-M", model_path, "-I", str(ws / "data"), "-O", out, "-N", "8",
          "-A", "minmax", "-D", "trt", "--batch_size", "4", "--cpu"])
    blob = json.load(open(os.path.join(out, "trt_clip_val.json")))["blob_range"]
    assert "a" in blob and "b" in blob
    model_cos = json.load(open(os.path.join(out, "model_res.json.rank0")))
    assert set(model_cos) == {"out1", "out2"}
    # out2 is "single" (4 elements): concat-then-cos path
    assert model_cos["out2"][0] == model_cos["out2"][1]
    assert model_cos["out1"][0] > 0.99

"""ONNX subgraph control flow (If / Loop / Scan) executed as XLA control
flow (runtime/control_flow.py) — the reference gets these through
onnxruntime (forward_net.py:195-201); here they compile into the same
traced program (lax.cond / lax.scan) under the documented static-shape
contract."""
import numpy as np
import pytest

from dipoorlet_tpu import onnx_ir as oir
from dipoorlet_tpu.graph import GraphIR
from dipoorlet_tpu.graph.passes import simplify_graph
from dipoorlet_tpu.runtime import Executor
from dipoorlet_tpu.runtime.data import make_synthetic_dataset

F = oir.DataType.FLOAT


def _vi(name, shape, dtype=F):
    return oir.make_tensor_value_info(name, dtype, shape)


def _if_model():
    """y = if sum(x) > 0: x*w + 1 else: x - w   (both branches capture x
    and the outer initializer w)."""
    then_g = oir.make_graph(
        [oir.make_node("Mul", ["x", "w"], ["tm"], name="t_mul"),
         oir.make_node("Add", ["tm", "one"], ["then_out"], name="t_add")],
        "then", [], [_vi("then_out", [1, 4])])
    else_g = oir.make_graph(
        [oir.make_node("Sub", ["x", "w"], ["else_out"], name="e_sub")],
        "else", [], [_vi("else_out", [1, 4])])
    nodes = [
        oir.make_node("ReduceSum", ["x"], ["s"], name="rsum", keepdims=0),
        oir.make_node("Greater", ["s", "zero"], ["cond"], name="gt"),
        oir.make_node("If", ["cond"], ["y"], name="ifnode",
                      then_branch=then_g, else_branch=else_g),
    ]
    inits = [
        oir.array_to_tensor(np.asarray([2.0, 3.0, 4.0, 5.0], np.float32)
                            .reshape(1, 4), "w"),
        oir.array_to_tensor(np.float32(1.0), "one"),
        oir.array_to_tensor(np.float32(0.0), "zero"),
    ]
    g = oir.make_graph(nodes, "ifg", [_vi("x", [1, 4])], [_vi("y", [1, 4])],
                       initializer=inits)
    return GraphIR(oir.make_model(g))


def test_if_both_branches(rng):
    g = _if_model()
    simplify_graph(g)
    ex = Executor(g)
    params = ex.init_params()
    w = np.asarray([[2.0, 3.0, 4.0, 5.0]], np.float32)
    x_pos = np.abs(rng.randn(1, 4)).astype(np.float32)
    x_neg = -x_pos
    out, _ = ex.forward(params, {"x": x_pos})
    np.testing.assert_allclose(np.asarray(out["y"]), x_pos * w + 1, rtol=1e-6)
    out, _ = ex.forward(params, {"x": x_neg})
    np.testing.assert_allclose(np.asarray(out["y"]), x_neg - w, rtol=1e-6)


def test_if_under_vmap_batching(rng):
    """Per-sample conds batch through lax.cond's select lowering."""
    g = _if_model()
    simplify_graph(g)
    ex = Executor(g)
    params = ex.init_params()
    fn = ex.make_batched(outputs=["y"])
    xs = rng.randn(6, 1, 4).astype(np.float32)
    out, _ = fn(params, {"x": xs})
    w = np.asarray([[2.0, 3.0, 4.0, 5.0]], np.float32)
    want = np.where(xs.sum(axis=(1, 2), keepdims=True).reshape(6, 1, 1) > 0,
                    xs * w + 1, xs - w)
    np.testing.assert_allclose(np.asarray(out["y"]), want, rtol=1e-5)


def _loop_model(m=4):
    """state_{i+1} = state_i * 0.5 + x; scan output collects state_i + i."""
    body = oir.make_graph(
        [oir.make_node("Mul", ["st_in", "half"], ["sh"], name="b_mul"),
         oir.make_node("Add", ["sh", "x"], ["st_out"], name="b_add"),
         oir.make_node("Cast", ["iter"], ["it_f"], name="b_cast", to=int(F)),
         oir.make_node("Add", ["st_in", "it_f"], ["probe"], name="b_probe"),
         oir.make_node("Identity", ["cond_in"], ["cond_out"], name="b_cond")],
        "body",
        [_vi("iter", [], oir.DataType.INT64), _vi("cond_in", [], oir.DataType.BOOL),
         _vi("st_in", [1, 3])],
        [_vi("cond_out", [], oir.DataType.BOOL), _vi("st_out", [1, 3]),
         _vi("probe", [1, 3])])
    nodes = [oir.make_node("Loop", ["m", "cond0", "st0"], ["y", "probes"],
                           name="loop", body=body)]
    inits = [
        oir.array_to_tensor(np.int64(m), "m"),
        oir.array_to_tensor(np.asarray(True), "cond0"),
        oir.array_to_tensor(np.zeros((1, 3), np.float32), "st0"),
        oir.array_to_tensor(np.float32(0.5), "half"),
    ]
    g = oir.make_graph(nodes, "loopg", [_vi("x", [1, 3])],
                       [_vi("y", [1, 3]), _vi("probes", [m, 1, 3])],
                       initializer=inits)
    return GraphIR(oir.make_model(g))


def test_loop_static_trip_count(rng):
    m = 4
    g = _loop_model(m)
    simplify_graph(g)
    ex = Executor(g)
    params = ex.init_params()
    x = rng.randn(1, 3).astype(np.float32)
    out, _ = ex.forward(params, {"x": x})
    st = np.zeros((1, 3), np.float32)
    probes = []
    for i in range(m):
        probes.append(st + np.float32(i))
        st = st * 0.5 + x
    np.testing.assert_allclose(np.asarray(out["y"]), st, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["probes"]), np.stack(probes),
                               rtol=1e-6)


def _scan_model(t=5):
    """Scan computing a running sum state and emitting each partial sum."""
    body = oir.make_graph(
        [oir.make_node("Add", ["acc_in", "xe"], ["acc_out"], name="s_add"),
         oir.make_node("Identity", ["acc_out"], ["ye"], name="s_out")],
        "sbody", [_vi("acc_in", [3]), _vi("xe", [3])],
        [_vi("acc_out", [3]), _vi("ye", [3])])
    nodes = [oir.make_node("Scan", ["acc0", "xs"], ["accN", "ys"],
                           name="scan", body=body, num_scan_inputs=1)]
    inits = [oir.array_to_tensor(np.zeros(3, np.float32), "acc0")]
    g = oir.make_graph(nodes, "scang", [_vi("xs", [t, 3])],
                       [_vi("accN", [3]), _vi("ys", [t, 3])],
                       initializer=inits)
    return GraphIR(oir.make_model(g))


def test_scan_running_sum(rng):
    t = 5
    g = _scan_model(t)
    simplify_graph(g)
    ex = Executor(g)
    params = ex.init_params()
    xs = rng.randn(t, 3).astype(np.float32)
    out, _ = ex.forward(params, {"xs": xs})
    want = np.cumsum(xs, axis=0)
    np.testing.assert_allclose(np.asarray(out["accN"]), want[-1], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["ys"]), want, rtol=1e-5)


def test_control_flow_calibrates_through_cli(tmp_path):
    """A graph containing an If node runs the full production pipeline
    (calibration taps the top-level tensors around the subgraph)."""
    import json
    import os
    from dipoorlet_tpu.__main__ import main
    g = _if_model()
    g.update_model()
    g.output_dir = str(tmp_path)
    path = g.save_onnx_model("ifmodel")
    make_synthetic_dataset(str(tmp_path / "data"), {"x": [1, 4]}, 8, seed=2)
    out = str(tmp_path / "out")
    main(["-M", path, "-I", str(tmp_path / "data"), "-O", out, "-N", "8",
          "-A", "minmax", "-D", "trt", "--batch_size", "4", "--cpu"])
    blob = json.load(open(os.path.join(out, "trt_clip_val.json")))["blob_range"]
    assert "y" in blob and "x" in blob


def test_subgraph_roundtrips_through_save(tmp_path):
    """GraphProto attributes survive our protobuf codec round-trip."""
    g = _if_model()
    g.update_model()
    g.output_dir = str(tmp_path)
    path = g.save_onnx_model("ifmodel_rt")
    g2 = GraphIR.load(path)
    ex = Executor(g2)
    x = np.ones((1, 4), np.float32)
    out, _ = ex.forward(ex.init_params(), {"x": x})
    w = np.asarray([[2.0, 3.0, 4.0, 5.0]], np.float32)
    np.testing.assert_allclose(np.asarray(out["y"]), x * w + 1, rtol=1e-6)


def test_torchscript_if_export_parity(tmp_path, rng):
    """A REAL torch.jit.script export with data-dependent branching (emits
    ReduceSum/Greater/Cast/If) runs with torch parity on both branches."""
    import torch
    import torch.nn as nn
    from torch_export import _install_onnx_stub
    _install_onnx_stub()

    class Branchy(nn.Module):
        def __init__(self):
            super().__init__()
            self.a = nn.Linear(8, 8)
            self.b = nn.Linear(8, 8)

        def forward(self, x):
            if bool(x.sum() > 0):
                y = self.a(x)
            else:
                y = self.b(x)
            return y

    torch.manual_seed(0)
    m = torch.jit.script(Branchy())
    path = str(tmp_path / "branchy.onnx")
    torch.onnx.export(m, (torch.randn(1, 8),), path, opset_version=13,
                      dynamo=False, input_names=["input"],
                      output_names=["output"])
    g = GraphIR.load(path)
    assert any(n.op_type == "If" for n in g.graph.node)
    ex = Executor(g)
    params = ex.init_params()
    base = np.abs(rng.randn(1, 8)).astype(np.float32)
    for x in (base, -base):
        with torch.no_grad():
            ref = m(torch.from_numpy(x)).numpy()
        out, _ = ex.forward(params, {"input": x})
        np.testing.assert_allclose(np.asarray(out["output"]), ref,
                                   rtol=1e-5, atol=1e-6)


def test_identity_capture_rename_into_subgraph(rng):
    """Identity elision renames a tensor that an If subgraph CAPTURES;
    simplify must rewrite the captured name inside the subgraph or both
    shape inference and the runtime capture lookup miss it (advisor
    round-4 finding)."""
    then_g = oir.make_graph(
        [oir.make_node("Mul", ["xi", "w"], ["then_out"], name="t_mul")],
        "then", [], [_vi("then_out", [1, 4])])
    else_g = oir.make_graph(
        [oir.make_node("Sub", ["xi", "w"], ["else_out"], name="e_sub")],
        "else", [], [_vi("else_out", [1, 4])])
    nodes = [
        oir.make_node("Identity", ["x"], ["xi"], name="idn"),
        oir.make_node("ReduceSum", ["xi"], ["s"], name="rsum", keepdims=0),
        oir.make_node("Greater", ["s", "zero"], ["cond"], name="gt"),
        oir.make_node("If", ["cond"], ["y"], name="ifnode",
                      then_branch=then_g, else_branch=else_g),
    ]
    inits = [
        oir.array_to_tensor(np.asarray([2.0, 3.0, 4.0, 5.0], np.float32)
                            .reshape(1, 4), "w"),
        oir.array_to_tensor(np.float32(0.0), "zero"),
    ]
    g = GraphIR(oir.make_model(oir.make_graph(
        nodes, "idcap", [_vi("x", [1, 4])], [_vi("y", [1, 4])],
        initializer=inits)))
    simplify_graph(g)  # raised "missing shape ... feeding control-flow" pre-fix
    ex = Executor(g)
    params = ex.init_params()
    w = np.asarray([[2.0, 3.0, 4.0, 5.0]], np.float32)
    x = np.abs(rng.randn(1, 4)).astype(np.float32)
    out, _ = ex.forward(params, {"x": x})
    np.testing.assert_allclose(np.asarray(out["y"]), x * w, rtol=1e-6)
    out, _ = ex.forward(params, {"x": -x})
    np.testing.assert_allclose(np.asarray(out["y"]), -x - w, rtol=1e-6)


def test_subgraph_shadow_name_no_spurious_topo_edge(rng):
    """A subgraph-INTERNAL tensor may legally shadow the name of an outer
    node's output (ONNX scoping); it must not create a dependency edge.
    Pre-fix, topo_sort raised a spurious-cycle error here because the If
    appeared to depend on 'shadow', which is produced downstream of it."""
    then_g = oir.make_graph(
        [oir.make_node("Mul", ["x", "w"], ["shadow"], name="t_mul"),
         oir.make_node("Add", ["shadow", "w"], ["then_out"], name="t_add")],
        "then", [], [_vi("then_out", [1, 4])])
    else_g = oir.make_graph(
        [oir.make_node("Sub", ["x", "w"], ["else_out"], name="e_sub")],
        "else", [], [_vi("else_out", [1, 4])])
    nodes = [
        oir.make_node("ReduceSum", ["x"], ["s"], name="rsum", keepdims=0),
        oir.make_node("Greater", ["s", "zero"], ["cond"], name="gt"),
        oir.make_node("If", ["cond"], ["y"], name="ifnode",
                      then_branch=then_g, else_branch=else_g),
        oir.make_node("Relu", ["y"], ["shadow"], name="outer_relu"),
    ]
    inits = [
        oir.array_to_tensor(np.asarray([2.0, 3.0, 4.0, 5.0], np.float32)
                            .reshape(1, 4), "w"),
        oir.array_to_tensor(np.float32(0.0), "zero"),
    ]
    g = GraphIR(oir.make_model(oir.make_graph(
        nodes, "shadowg", [_vi("x", [1, 4])], [_vi("shadow", [1, 4])],
        initializer=inits)))
    order = g.topo_sort()  # pre-fix: ValueError "unreachable inputs or a cycle"
    names = [n.name for n in order]
    assert names.index("ifnode") < names.index("outer_relu")
    simplify_graph(g)
    ex = Executor(g)
    x = np.abs(rng.randn(1, 4)).astype(np.float32)
    out, _ = ex.forward(ex.init_params(), {"x": x})
    w = np.asarray([[2.0, 3.0, 4.0, 5.0]], np.float32)
    np.testing.assert_allclose(np.asarray(out["shadow"]),
                               np.maximum(x * w + w, 0), rtol=1e-6)


def test_loop_early_exit_refused():
    """A Loop whose body COMPUTES cond_out (genuine early exit) must fail
    loudly at build time: lax.scan over the static trip count would
    silently run all M iterations and differ from ORT."""
    body = oir.make_graph(
        [oir.make_node("Mul", ["st_in", "half"], ["st_out"], name="b_mul"),
         oir.make_node("Cast", ["iter"], ["it_f"], name="b_cast", to=int(F)),
         oir.make_node("Less", ["it_f", "lim"], ["cond_out"], name="b_less")],
        "body",
        [_vi("iter", [], oir.DataType.INT64),
         _vi("cond_in", [], oir.DataType.BOOL), _vi("st_in", [1, 3])],
        [_vi("cond_out", [], oir.DataType.BOOL), _vi("st_out", [1, 3])])
    nodes = [oir.make_node("Loop", ["m", "cond0", "st0"], ["y"],
                           name="loop", body=body)]
    inits = [
        oir.array_to_tensor(np.int64(4), "m"),
        oir.array_to_tensor(np.asarray(True), "cond0"),
        oir.array_to_tensor(np.ones((1, 3), np.float32), "st0"),
        oir.array_to_tensor(np.float32(0.5), "half"),
        oir.array_to_tensor(np.float32(2.0), "lim"),
    ]
    g = GraphIR(oir.make_model(oir.make_graph(
        nodes, "earlyexit", [], [_vi("y", [1, 3])], initializer=inits)))
    with pytest.raises(NotImplementedError, match="cond_out"):
        simplify_graph(g)

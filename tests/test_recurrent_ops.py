"""LSTM/GRU op parity vs torch reference cells (weight-layout mapped)."""
import numpy as np
import jax.numpy as jnp
import torch

from dipoorlet_tpu.ops import OP_REGISTRY, OpContext


def _torch_lstm_to_onnx(cell):
    """torch gate order ifgo -> ONNX iofc."""
    wi, wf, wg, wo = torch.chunk(cell.weight_ih_l0, 4, dim=0)
    ri, rf, rg, ro = torch.chunk(cell.weight_hh_l0, 4, dim=0)
    w = torch.cat([wi, wo, wf, wg])[None]
    r = torch.cat([ri, ro, rf, rg])[None]
    bwi, bwf, bwg, bwo = torch.chunk(cell.bias_ih_l0, 4)
    bri, brf, brg, bro = torch.chunk(cell.bias_hh_l0, 4)
    b = torch.cat([bwi, bwo, bwf, bwg, bri, bro, brf, brg])[None]
    return (w.detach().numpy(), r.detach().numpy(), b.detach().numpy())


def test_lstm_matches_torch():
    torch.manual_seed(0)
    t, bsz, inp, hid = 5, 3, 4, 6
    cell = torch.nn.LSTM(inp, hid)
    x = torch.randn(t, bsz, inp)
    with torch.no_grad():
        y_t, (h_t, c_t) = cell(x)
    w, r, b = _torch_lstm_to_onnx(cell)
    y, y_h, y_c = OP_REGISTRY["LSTM"](OpContext({"hidden_size": hid}),
                                      jnp.asarray(x.numpy()), jnp.asarray(w),
                                      jnp.asarray(r), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y)[:, 0], y_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_h)[0], h_t.numpy()[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_c)[0], c_t.numpy()[0], atol=1e-5)


def test_lstm_bidirectional_initial_state():
    torch.manual_seed(1)
    t, bsz, inp, hid = 4, 2, 3, 5
    cell = torch.nn.LSTM(inp, hid, bidirectional=True)
    x = torch.randn(t, bsz, inp)
    h0 = torch.randn(2, bsz, hid)
    c0 = torch.randn(2, bsz, hid)
    with torch.no_grad():
        y_t, (h_t, c_t) = cell(x, (h0, c0))
    # direction 0 = forward, 1 = reverse; torch suffixes _reverse
    ws, rs, bs = [], [], []
    for sfx in ("", "_reverse"):
        wi, wf, wg, wo = torch.chunk(getattr(cell, f"weight_ih_l0{sfx}"), 4, dim=0)
        ri, rf, rg, ro = torch.chunk(getattr(cell, f"weight_hh_l0{sfx}"), 4, dim=0)
        ws.append(torch.cat([wi, wo, wf, wg]))
        rs.append(torch.cat([ri, ro, rf, rg]))
        bwi, bwf, bwg, bwo = torch.chunk(getattr(cell, f"bias_ih_l0{sfx}"), 4)
        bri, brf, brg, bro = torch.chunk(getattr(cell, f"bias_hh_l0{sfx}"), 4)
        bs.append(torch.cat([bwi, bwo, bwf, bwg, bri, bro, brf, brg]))
    w = torch.stack(ws).detach().numpy()
    r = torch.stack(rs).detach().numpy()
    b = torch.stack(bs).detach().numpy()
    y, y_h, y_c = OP_REGISTRY["LSTM"](
        OpContext({"hidden_size": hid, "direction": "bidirectional"}),
        jnp.asarray(x.numpy()), jnp.asarray(w), jnp.asarray(r), jnp.asarray(b),
        None, jnp.asarray(h0.numpy()), jnp.asarray(c0.numpy()))
    # torch y is (T, B, 2H) = concat(fwd, rev); ours (T, 2, B, H)
    y = np.asarray(y)
    np.testing.assert_allclose(y[:, 0], y_t.numpy()[..., :hid], atol=1e-5)
    np.testing.assert_allclose(y[:, 1], y_t.numpy()[..., hid:], atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_h), h_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_c), c_t.numpy(), atol=1e-5)


def test_gru_matches_torch_linear_before_reset():
    """torch GRU == ONNX GRU with linear_before_reset=1 (gate map rzn->zrh)."""
    torch.manual_seed(2)
    t, bsz, inp, hid = 6, 2, 3, 4
    cell = torch.nn.GRU(inp, hid)
    x = torch.randn(t, bsz, inp)
    with torch.no_grad():
        y_t, h_t = cell(x)
    wr, wz, wn = torch.chunk(cell.weight_ih_l0, 3, dim=0)
    rr, rz, rn = torch.chunk(cell.weight_hh_l0, 3, dim=0)
    bwr, bwz, bwn = torch.chunk(cell.bias_ih_l0, 3)
    brr, brz, brn = torch.chunk(cell.bias_hh_l0, 3)
    w = torch.cat([wz, wr, wn])[None].detach().numpy()
    r = torch.cat([rz, rr, rn])[None].detach().numpy()
    b = torch.cat([bwz, bwr, bwn, brz, brr, brn])[None].detach().numpy()
    y, y_h = OP_REGISTRY["GRU"](
        OpContext({"hidden_size": hid, "linear_before_reset": 1}),
        jnp.asarray(x.numpy()), jnp.asarray(w), jnp.asarray(r), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y)[:, 0], y_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_h)[0], h_t.numpy()[0], atol=1e-5)


def test_gru_lbr0_matches_numpy_loop():
    rng = np.random.RandomState(3)
    t, bsz, inp, hid = 4, 2, 3, 4
    x = rng.randn(t, bsz, inp).astype(np.float32)
    w = rng.randn(1, 3 * hid, inp).astype(np.float32) * 0.5
    r = rng.randn(1, 3 * hid, hid).astype(np.float32) * 0.5
    b = rng.randn(1, 6 * hid).astype(np.float32) * 0.1

    def sig(v):
        return 1 / (1 + np.exp(-v))

    wz, wr_, wh = np.split(w[0], 3)
    rz, rr_, rh = np.split(r[0], 3)
    bz, br, bh_w, *_rest = None, None, None
    bs = np.split(b[0], 6)
    h = np.zeros((bsz, hid), np.float32)
    ys = []
    for ti in range(t):
        xt = x[ti]
        z = sig(xt @ wz.T + h @ rz.T + bs[0] + bs[3])
        rg = sig(xt @ wr_.T + h @ rr_.T + bs[1] + bs[4])
        hh = np.tanh(xt @ wh.T + bs[2] + (rg * h) @ rh.T + bs[5])
        h = (1 - z) * hh + z * h
        ys.append(h.copy())
    y, y_h = OP_REGISTRY["GRU"](OpContext({"hidden_size": hid}),
                                jnp.asarray(x), jnp.asarray(w), jnp.asarray(r),
                                jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y)[:, 0], np.stack(ys), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_h)[0], ys[-1], atol=1e-5)


def test_lstm_in_graph_executes():
    """An LSTM node inside a GraphIR executes + calibrates (shape inference
    via abstract eval)."""
    from dipoorlet_tpu import onnx_ir as oir
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.graph.passes import simplify_graph
    from dipoorlet_tpu.runtime import Executor
    rng = np.random.RandomState(4)
    hid, inp, t = 4, 3, 5
    inits = [
        oir.array_to_tensor(rng.randn(1, 4 * hid, inp).astype(np.float32) * 0.4, "W"),
        oir.array_to_tensor(rng.randn(1, 4 * hid, hid).astype(np.float32) * 0.4, "R"),
        oir.array_to_tensor(rng.randn(1, 8 * hid).astype(np.float32) * 0.1, "B"),
    ]
    nodes = [
        oir.make_node("LSTM", ["x", "W", "R", "B"], ["y", "y_h", "y_c"],
                      name="lstm", hidden_size=hid),
        oir.make_node("Squeeze", ["y_h"], ["feat"], name="sq", axes=[0]),
    ]
    graph = oir.make_graph(
        nodes, "g", [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [t, 1, inp])],
        [oir.make_tensor_value_info("feat", oir.DataType.FLOAT, [1, hid])],
        initializer=inits)
    g = GraphIR(oir.make_model(graph))
    simplify_graph(g)
    ex = Executor(g)
    out, _ = ex.forward(ex.init_params(), {"x": rng.randn(t, 1, inp).astype(np.float32)})
    assert out["feat"].shape == (1, hid)


def test_rnn_layout1_raises():
    """layout=1 (batch-major) is out of contract and must raise, not
    silently misinterpret the tensor as seq-major (round-4 advisor fix)."""
    import pytest
    x = jnp.zeros((2, 3, 4))
    w = jnp.zeros((1, 16, 4)); r = jnp.zeros((1, 16, 4))
    with pytest.raises(NotImplementedError, match="layout"):
        OP_REGISTRY["LSTM"](OpContext({"hidden_size": 4, "layout": 1}), x, w, r)
    wg = jnp.zeros((1, 12, 4)); rg = jnp.zeros((1, 12, 4))
    with pytest.raises(NotImplementedError, match="layout"):
        OP_REGISTRY["GRU"](OpContext({"hidden_size": 4, "layout": 1}), x, wg, rg)

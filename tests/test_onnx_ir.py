"""Codec round-trip tests for the standalone ONNX IR."""
import numpy as np

from dipoorlet_tpu import onnx_ir as oir


def _tiny_model():
    w = oir.array_to_tensor(np.arange(12, dtype=np.float32).reshape(3, 4), "w")
    nodes = [
        oir.make_node("MatMul", ["x", "w"], ["y"], name="mm"),
        oir.make_node("Relu", ["y"], ["z"], name="act"),
    ]
    graph = oir.make_graph(
        nodes, "g",
        [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [2, 3])],
        [oir.make_tensor_value_info("z", oir.DataType.FLOAT, [2, 4])],
        initializer=[w],
    )
    return oir.make_model(graph)


def test_roundtrip_structure():
    m = _tiny_model()
    data = m.encode()
    m2 = oir.load_model_from_string(data)
    assert m2.ir_version == m.ir_version
    assert [n.op_type for n in m2.graph.node] == ["MatMul", "Relu"]
    assert m2.graph.node[0].input == ["x", "w"]
    assert m2.graph.input[0].name == "x"
    dims = [d.dim_value for d in m2.graph.input[0].type.tensor_type.shape.dim]
    assert dims == [2, 3]
    assert m2.opset_import[0].version == 13


def test_tensor_roundtrip_dtypes():
    for dtype in [np.float32, np.float64, np.int64, np.int32, np.int8, np.uint8, np.bool_, np.float16]:
        arr = (np.random.RandomState(0).randn(3, 5) * 10).astype(dtype)
        t = oir.array_to_tensor(arr, "t")
        back = oir.tensor_to_array(oir.TensorProto.decode(t.encode()))
        assert back.dtype == arr.dtype
        assert np.array_equal(back, arr)


def test_attribute_kinds():
    n = oir.make_node("X", ["a"], ["b"], name="n", f_attr=1.5, i_attr=7,
                      s_attr="hello", ints_attr=[1, 2, 3], floats_attr=[1.0, 2.5])
    n2 = oir.NodeProto.decode(n.encode())
    attrs = {a.name: oir.get_attribute_value(a) for a in n2.attribute}
    assert attrs["f_attr"] == 1.5
    assert attrs["i_attr"] == 7
    assert attrs["s_attr"] == b"hello"
    assert attrs["ints_attr"] == [1, 2, 3]
    assert attrs["floats_attr"] == [1.0, 2.5]


def test_negative_int_attr():
    n = oir.make_node("X", [], ["o"], axis=-1)
    n2 = oir.NodeProto.decode(n.encode())
    assert oir.get_attribute_value(n2.attribute[0]) == -1


def test_unknown_fields_preserved():
    # encode a message with an extra unknown field; decode+reencode keeps it
    from dipoorlet_tpu.onnx_ir.wire import encode_tag, encode_bytes, WT_LEN
    m = _tiny_model()
    raw = bytearray(m.encode())
    extra = bytearray()
    encode_tag(99, WT_LEN, extra)
    encode_bytes(b"mystery", extra)
    raw += extra
    m2 = oir.load_model_from_string(bytes(raw))
    assert bytes(extra) in m2.encode()


def test_structural_copy_shares_payloads_and_isolates_structure():
    """Message.copy(): byte-identical encoding, SHARED immutable tensor
    payloads (the zero-copy clone contract), and structural isolation —
    mutating the copy's node/initializer lists must not touch the
    original."""
    m = _tiny_model()
    c = m.copy()
    assert c.encode() == m.encode()
    # payload bytes shared (not duplicated)
    assert c.graph.initializer[0].raw_data is m.graph.initializer[0].raw_data
    # structure isolated: edit the copy only
    c.graph.node[0].input[0] = "renamed"
    c.graph.initializer.append(
        oir.array_to_tensor(np.zeros(2, dtype=np.float32), "extra"))
    assert m.graph.node[0].input[0] == "x"
    assert len(m.graph.initializer) == 1
    # unknown fields survive the copy
    raw = bytearray(m.encode())
    raw += bytes([0x78, 0x2A])  # unknown varint field 15
    m2 = oir.load_model_from_string(bytes(raw))
    assert m2.copy().encode() == m2.encode()

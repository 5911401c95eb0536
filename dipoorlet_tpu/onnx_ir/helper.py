"""Builder / numpy conversion helpers for the ONNX IR (equivalent surface to
onnx.helper + onnx.numpy_helper as used by the reference, e.g.
/root/reference/dipoorlet/quantize.py:197-239, utils.py:131-159)."""
from __future__ import annotations

import numpy as np

from .proto import (
    AttributeProto,
    AttrType,
    DataType,
    Dimension,
    GraphProto,
    ModelProto,
    NodeProto,
    OperatorSetIdProto,
    TensorProto,
    TensorShapeProto,
    TensorTypeProto,
    TypeProto,
    ValueInfoProto,
)

NP_TO_ONNX = {
    np.dtype(np.float32): DataType.FLOAT,
    np.dtype(np.uint8): DataType.UINT8,
    np.dtype(np.int8): DataType.INT8,
    np.dtype(np.uint16): DataType.UINT16,
    np.dtype(np.int16): DataType.INT16,
    np.dtype(np.int32): DataType.INT32,
    np.dtype(np.int64): DataType.INT64,
    np.dtype(np.bool_): DataType.BOOL,
    np.dtype(np.float16): DataType.FLOAT16,
    np.dtype(np.float64): DataType.DOUBLE,
    np.dtype(np.uint32): DataType.UINT32,
    np.dtype(np.uint64): DataType.UINT64,
}

ONNX_TO_NP = {v: k for k, v in NP_TO_ONNX.items()}
# bfloat16 stored as uint16 payloads in numpy-land
ONNX_TO_NP[DataType.BFLOAT16] = np.dtype(np.uint16)


def tensor_to_array(tensor: TensorProto, base_dir: str = "") -> np.ndarray:
    """onnx.numpy_helper.to_array equivalent (incl. external data)."""
    dt = tensor.data_type
    shape = tuple(tensor.dims)
    np_dtype = ONNX_TO_NP.get(dt)
    if np_dtype is None:
        raise ValueError(f"unsupported tensor data_type {dt} for {tensor.name!r}")
    if tensor.data_location == 1:  # EXTERNAL
        info = {e.key: e.value for e in tensor.external_data}
        location = info.get("location")
        if location is None:
            raise ValueError(f"external tensor {tensor.name!r} missing location")
        import os
        path = os.path.join(base_dir, location)
        offset = int(info.get("offset", 0) or 0)
        length = info.get("length")
        with open(path, "rb") as f:
            f.seek(offset)
            data = f.read(int(length)) if length else f.read()
        return np.frombuffer(data, dtype=np_dtype).reshape(shape)
    if tensor.raw_data:
        # zero-copy read-only view over the proto's bytes: initializers are
        # replaced wholesale via GraphIR.set_initializer, never mutated in
        # place (a write raises "assignment destination is read-only"), and
        # prepare_initializer runs on every clone/load — copying here cost
        # ~14 s of pure memcpy per 124M-param pipeline (profiled 2026-08-21)
        arr = np.frombuffer(tensor.raw_data, dtype=np_dtype)
        return arr.reshape(shape)
    if dt == DataType.FLOAT and tensor.float_data:
        return np.asarray(tensor.float_data, dtype=np.float32).reshape(shape)
    if dt == DataType.DOUBLE and tensor.double_data:
        return np.asarray(tensor.double_data, dtype=np.float64).reshape(shape)
    if dt == DataType.INT64 and tensor.int64_data:
        return np.asarray(tensor.int64_data, dtype=np.int64).reshape(shape)
    if dt in (DataType.INT32, DataType.INT16, DataType.INT8, DataType.UINT16,
              DataType.UINT8, DataType.BOOL, DataType.FLOAT16) and tensor.int32_data:
        arr = np.asarray(tensor.int32_data, dtype=np.int32)
        if dt == DataType.FLOAT16:
            return arr.astype(np.uint16).view(np.float16).reshape(shape)
        return arr.astype(np_dtype).reshape(shape)
    if dt in (DataType.UINT32, DataType.UINT64) and tensor.uint64_data:
        return np.asarray(tensor.uint64_data, dtype=np.uint64).astype(np_dtype).reshape(shape)
    # empty tensor
    return np.zeros(shape, dtype=np_dtype)


def array_to_tensor(arr: np.ndarray, name: str = "") -> TensorProto:
    """onnx.numpy_helper.from_array equivalent (always raw_data)."""
    arr = np.asarray(arr)
    if arr.dtype not in NP_TO_ONNX:
        if arr.dtype == np.dtype(np.int64) or np.issubdtype(arr.dtype, np.integer):
            arr = arr.astype(np.int64)
        elif np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(np.float32)
        else:
            raise ValueError(f"unsupported numpy dtype {arr.dtype}")
    t = TensorProto()
    t.name = name
    t.dims = list(arr.shape)
    t.data_type = NP_TO_ONNX[arr.dtype]
    t.raw_data = np.ascontiguousarray(arr).tobytes()
    return t


def make_attribute(name: str, value) -> AttributeProto:
    a = AttributeProto()
    a.name = name
    if isinstance(value, bool):
        a.type, a.i = AttrType.INT, int(value)
    elif isinstance(value, (int, np.integer)):
        a.type, a.i = AttrType.INT, int(value)
    elif isinstance(value, (float, np.floating)):
        a.type, a.f = AttrType.FLOAT, float(value)
    elif isinstance(value, str):
        a.type, a.s = AttrType.STRING, value.encode("utf-8")
    elif isinstance(value, bytes):
        a.type, a.s = AttrType.STRING, value
    elif isinstance(value, TensorProto):
        a.type, a.t = AttrType.TENSOR, value
    elif isinstance(value, GraphProto):
        a.type, a.g = AttrType.GRAPH, value
    elif isinstance(value, np.ndarray):
        a.type, a.t = AttrType.TENSOR, array_to_tensor(value)
    elif isinstance(value, (list, tuple)):
        if len(value) == 0:
            a.type = AttrType.INTS
        elif all(isinstance(v, (int, np.integer)) for v in value):
            a.type, a.ints = AttrType.INTS, [int(v) for v in value]
        elif all(isinstance(v, (int, float, np.integer, np.floating)) for v in value):
            a.type, a.floats = AttrType.FLOATS, [float(v) for v in value]
        elif all(isinstance(v, (str, bytes)) for v in value):
            a.type = AttrType.STRINGS
            a.strings = [v.encode("utf-8") if isinstance(v, str) else v for v in value]
        else:
            raise ValueError(f"unsupported attribute list {name}={value!r}")
    else:
        raise ValueError(f"unsupported attribute {name}={value!r}")
    return a


def get_attribute_value(attr: AttributeProto):
    t = attr.type
    if t == AttrType.FLOAT:
        return attr.f
    if t == AttrType.INT:
        return attr.i
    if t == AttrType.STRING:
        return attr.s
    if t == AttrType.TENSOR:
        return attr.t
    if t == AttrType.GRAPH:
        return attr.g
    if t == AttrType.FLOATS:
        return list(attr.floats)
    if t == AttrType.INTS:
        return list(attr.ints)
    if t == AttrType.STRINGS:
        return list(attr.strings)
    if t == AttrType.TENSORS:
        return list(attr.tensors)
    raise ValueError(f"unsupported attribute type {t}")


def make_node(op_type: str, inputs, outputs, name: str = "", domain: str = "", **attrs) -> NodeProto:
    n = NodeProto()
    n.op_type = op_type
    n.input = list(inputs)
    n.output = list(outputs)
    n.name = name
    n.domain = domain
    for k, v in attrs.items():
        if v is None:
            continue
        n.attribute.append(make_attribute(k, v))
    return n


def make_tensor_value_info(name: str, elem_type: int, shape) -> ValueInfoProto:
    vi = ValueInfoProto()
    vi.name = name
    tt = TensorTypeProto()
    tt.elem_type = elem_type
    sp = TensorShapeProto()
    if shape is not None:
        for d in shape:
            dim = Dimension()
            if isinstance(d, str):
                dim.dim_param = d
            else:
                dim.dim_value = int(d)
            sp.dim.append(dim)
    tt.shape = sp
    tp = TypeProto()
    tp.tensor_type = tt
    vi.type = tp
    return vi


def make_graph(nodes, name, inputs, outputs, initializer=None, value_info=None) -> GraphProto:
    g = GraphProto()
    g.node = list(nodes)
    g.name = name
    g.input = list(inputs)
    g.output = list(outputs)
    g.initializer = list(initializer) if initializer else []
    g.value_info = list(value_info) if value_info else []
    return g


def make_model(graph: GraphProto, producer_name: str = "dipoorlet_tpu",
               opset_imports=None, ir_version: int = 8) -> ModelProto:
    m = ModelProto()
    m.ir_version = ir_version
    m.producer_name = producer_name
    m.graph = graph
    if opset_imports is None:
        ops = OperatorSetIdProto()
        ops.domain = ""
        ops.version = 13
        opset_imports = [ops]
    m.opset_import = list(opset_imports)
    return m


def make_opsetid(domain: str, version: int) -> OperatorSetIdProto:
    o = OperatorSetIdProto()
    o.domain = domain
    o.version = version
    return o

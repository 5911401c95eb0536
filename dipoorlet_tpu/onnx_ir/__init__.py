"""Standalone ONNX IR: pure-Python protobuf codec + builder helpers.

Replaces the `onnx` pip dependency of the reference implementation."""
from .proto import (  # noqa: F401
    AttributeProto,
    AttrType,
    DataType,
    Dimension,
    FunctionProto,
    GraphProto,
    Message,
    ModelProto,
    NodeProto,
    OperatorSetIdProto,
    StringStringEntryProto,
    TensorProto,
    TensorShapeProto,
    TensorTypeProto,
    TypeProto,
    ValueInfoProto,
    load_model,
    load_model_from_string,
    save_model,
)
from .helper import (  # noqa: F401
    array_to_tensor,
    get_attribute_value,
    make_attribute,
    make_graph,
    make_model,
    make_node,
    make_opsetid,
    make_tensor_value_info,
    tensor_to_array,
)

"""Declarative protobuf messages covering the subset of onnx.proto that
Dipoorlet-class PTQ tooling needs (models, graphs, nodes, tensors,
attributes, value infos, functions, external-data entries).

Replaces the `onnx` pip package used throughout the reference
(/root/reference/dipoorlet/utils.py, quantize.py).  Messages round-trip
unknown fields so foreign models survive load → edit → save unchanged.
"""
from __future__ import annotations

from .wire import (
    WT_FIXED32,
    WT_FIXED64,
    WT_LEN,
    WT_VARINT,
    decode_bytes,
    decode_double,
    decode_fixed32,
    decode_fixed64,
    decode_float,
    decode_tag,
    decode_varint,
    encode_bytes,
    encode_double,
    encode_float,
    encode_tag,
    encode_varint,
    skip_field,
    varint_to_int64,
)

import struct


class Field:
    __slots__ = ("number", "name", "kind", "repeated", "message_cls", "default")

    def __init__(self, number, name, kind, repeated=False, message_cls=None, default=None):
        self.number = number
        self.name = name
        self.kind = kind  # int64 | int32 | float | double | string | bytes | message
        self.repeated = repeated
        self.message_cls = message_cls
        self.default = default


_SCALAR_DEFAULTS = {
    "int64": 0,
    "int32": 0,
    "uint64": 0,
    "float": 0.0,
    "double": 0.0,
    "string": "",
    "bytes": b"",
}


class Message:
    """Base class. Subclasses define FIELDS = [Field, ...]."""

    FIELDS: list = []

    def __init__(self, **kwargs):
        cls = type(self)
        for f in cls.FIELDS:
            if f.repeated:
                setattr(self, f.name, [])
            elif f.kind == "message":
                setattr(self, f.name, None)
            else:
                setattr(self, f.name, f.default if f.default is not None else _SCALAR_DEFAULTS[f.kind])
        self._unknown = b""
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- decoding -----------------------------------------------------------
    @classmethod
    def decode(cls, buf):
        msg = cls()
        by_number = cls._field_map()
        unknown = bytearray()
        pos = 0
        n = len(buf)
        while pos < n:
            tag_start = pos
            fnum, wt, pos = decode_tag(buf, pos)
            f = by_number.get(fnum)
            if f is None:
                pos = skip_field(buf, pos, wt)
                unknown += buf[tag_start:pos]
                continue
            pos = msg._decode_field(f, wt, buf, pos)
        if unknown:
            msg._unknown = bytes(unknown)
        return msg

    def _decode_field(self, f, wt, buf, pos):
        kind = f.kind
        if kind == "message":
            data, pos = decode_bytes(buf, pos)
            sub = f.message_cls.decode(data)
            if f.repeated:
                getattr(self, f.name).append(sub)
            else:
                setattr(self, f.name, sub)
            return pos
        if kind in ("int64", "int32", "uint64"):
            if wt == WT_LEN:  # packed repeated
                data, pos = decode_bytes(buf, pos)
                p = 0
                vals = getattr(self, f.name)
                while p < len(data):
                    v, p = decode_varint(data, p)
                    vals.append(varint_to_int64(v) if kind != "uint64" else v)
                return pos
            v, pos = decode_varint(buf, pos)
            if kind != "uint64":
                v = varint_to_int64(v)
            if f.repeated:
                getattr(self, f.name).append(v)
            else:
                setattr(self, f.name, v)
            return pos
        if kind == "float":
            if wt == WT_LEN:  # packed
                data, pos = decode_bytes(buf, pos)
                vals = getattr(self, f.name)
                vals.extend(struct.unpack(f"<{len(data) // 4}f", data))
                return pos
            v, _ = decode_float(buf, pos)
            pos += 4
            if f.repeated:
                getattr(self, f.name).append(v)
            else:
                setattr(self, f.name, v)
            return pos
        if kind == "double":
            if wt == WT_LEN:
                data, pos = decode_bytes(buf, pos)
                vals = getattr(self, f.name)
                vals.extend(struct.unpack(f"<{len(data) // 8}d", data))
                return pos
            v, _ = decode_double(buf, pos)
            pos += 8
            if f.repeated:
                getattr(self, f.name).append(v)
            else:
                setattr(self, f.name, v)
            return pos
        if kind == "string":
            data, pos = decode_bytes(buf, pos)
            s = bytes(data).decode("utf-8", errors="surrogateescape")
            if f.repeated:
                getattr(self, f.name).append(s)
            else:
                setattr(self, f.name, s)
            return pos
        if kind == "bytes":
            data, pos = decode_bytes(buf, pos)
            b = bytes(data)
            if f.repeated:
                getattr(self, f.name).append(b)
            else:
                setattr(self, f.name, b)
            return pos
        raise ValueError(f"unsupported field kind {kind}")

    # -- copying ------------------------------------------------------------
    def copy(self):
        """Structural deep copy that SHARES immutable leaves (bytes, str,
        scalars).  Tensor payloads (TensorProto.raw_data) are bytes and
        therefore safe to share; this turns cloning a 475 MB model from
        an encode+decode round-trip into a structure-only walk (the hot
        path of GraphIR.clone on transformer-scale graphs)."""
        cls = type(self)
        new = cls.__new__(cls)
        for f in cls.FIELDS:
            val = getattr(self, f.name)
            if f.kind == "message":
                if f.repeated:
                    setattr(new, f.name, [v.copy() for v in val])
                else:
                    setattr(new, f.name, val.copy() if val is not None else None)
            elif f.repeated:
                setattr(new, f.name, list(val))
            else:
                setattr(new, f.name, val)
        new._unknown = self._unknown
        return new

    # -- encoding -----------------------------------------------------------
    def encode(self) -> bytes:
        out = bytearray()
        for f in type(self).FIELDS:
            val = getattr(self, f.name)
            if f.repeated:
                if not val:
                    continue
                self._encode_repeated(f, val, out)
            else:
                self._encode_single(f, val, out)
        if self._unknown:
            out += self._unknown
        return bytes(out)

    def _encode_single(self, f, val, out):
        kind = f.kind
        if kind == "message":
            if val is None:
                return
            encode_tag(f.number, WT_LEN, out)
            encode_bytes(val.encode(), out)
            return
        default = f.default if f.default is not None else _SCALAR_DEFAULTS[kind]
        if val == default:
            return
        if kind in ("int64", "int32", "uint64"):
            encode_tag(f.number, WT_VARINT, out)
            encode_varint(val, out)
        elif kind == "float":
            encode_tag(f.number, WT_FIXED32, out)
            encode_float(val, out)
        elif kind == "double":
            encode_tag(f.number, WT_FIXED64, out)
            encode_double(val, out)
        elif kind == "string":
            encode_tag(f.number, WT_LEN, out)
            encode_bytes(val.encode("utf-8", errors="surrogateescape"), out)
        elif kind == "bytes":
            encode_tag(f.number, WT_LEN, out)
            encode_bytes(val, out)
        else:
            raise ValueError(kind)

    def _encode_repeated(self, f, vals, out):
        kind = f.kind
        if kind == "message":
            for v in vals:
                encode_tag(f.number, WT_LEN, out)
                encode_bytes(v.encode(), out)
        elif kind in ("int64", "int32", "uint64"):
            # packed encoding
            body = bytearray()
            for v in vals:
                encode_varint(int(v), body)
            encode_tag(f.number, WT_LEN, out)
            encode_bytes(bytes(body), out)
        elif kind == "float":
            encode_tag(f.number, WT_LEN, out)
            encode_bytes(struct.pack(f"<{len(vals)}f", *vals), out)
        elif kind == "double":
            encode_tag(f.number, WT_LEN, out)
            encode_bytes(struct.pack(f"<{len(vals)}d", *vals), out)
        elif kind == "string":
            for v in vals:
                encode_tag(f.number, WT_LEN, out)
                encode_bytes(v.encode("utf-8", errors="surrogateescape"), out)
        elif kind == "bytes":
            for v in vals:
                encode_tag(f.number, WT_LEN, out)
                encode_bytes(v, out)
        else:
            raise ValueError(kind)

    @classmethod
    def _field_map(cls):
        fm = cls.__dict__.get("_FIELD_MAP")
        if fm is None:
            fm = {f.number: f for f in cls.FIELDS}
            cls._FIELD_MAP = fm
        return fm

    def __repr__(self):
        parts = []
        for f in type(self).FIELDS:
            v = getattr(self, f.name)
            if v in (None, [], "", b"", 0, 0.0):
                continue
            r = repr(v)
            if len(r) > 60:
                r = r[:57] + "..."
            parts.append(f"{f.name}={r}")
        return f"{type(self).__name__}({', '.join(parts)})"


# ---------------------------------------------------------------------------
# ONNX data type enum (TensorProto.DataType)
# ---------------------------------------------------------------------------
class DataType:
    UNDEFINED = 0
    FLOAT = 1
    UINT8 = 2
    INT8 = 3
    UINT16 = 4
    INT16 = 5
    INT32 = 6
    INT64 = 7
    STRING = 8
    BOOL = 9
    FLOAT16 = 10
    DOUBLE = 11
    UINT32 = 12
    UINT64 = 13
    COMPLEX64 = 14
    COMPLEX128 = 15
    BFLOAT16 = 16


class AttrType:
    UNDEFINED = 0
    FLOAT = 1
    INT = 2
    STRING = 3
    TENSOR = 4
    GRAPH = 5
    FLOATS = 6
    INTS = 7
    STRINGS = 8
    TENSORS = 9
    GRAPHS = 10
    SPARSE_TENSOR = 11
    SPARSE_TENSORS = 12
    TYPE_PROTO = 13
    TYPE_PROTOS = 14


# ---------------------------------------------------------------------------
# Message definitions (field numbers match onnx.proto3)
# ---------------------------------------------------------------------------
class StringStringEntryProto(Message):
    FIELDS = [
        Field(1, "key", "string"),
        Field(2, "value", "string"),
    ]


class TensorProto(Message):
    FIELDS = [
        Field(1, "dims", "int64", repeated=True),
        Field(2, "data_type", "int32"),
        Field(4, "float_data", "float", repeated=True),
        Field(5, "int32_data", "int32", repeated=True),
        Field(6, "string_data", "bytes", repeated=True),
        Field(7, "int64_data", "int64", repeated=True),
        Field(8, "name", "string"),
        Field(9, "raw_data", "bytes"),
        Field(10, "double_data", "double", repeated=True),
        Field(11, "uint64_data", "uint64", repeated=True),
        Field(12, "doc_string", "string"),
        Field(13, "external_data", "message", repeated=True, message_cls=StringStringEntryProto),
        Field(14, "data_location", "int32"),
    ]


class Dimension(Message):
    # onnx uses a oneof {dim_value, dim_param}; an absent dim_value reads as 0,
    # matching the reference's `[x.dim_value for x in ...dim]` (utils.py:91).
    FIELDS = [
        Field(1, "dim_value", "int64"),
        Field(2, "dim_param", "string"),
        Field(3, "denotation", "string"),
    ]


class TensorShapeProto(Message):
    FIELDS = [
        Field(1, "dim", "message", repeated=True, message_cls=Dimension),
    ]


class TensorTypeProto(Message):
    FIELDS = [
        Field(1, "elem_type", "int32"),
        Field(2, "shape", "message", message_cls=TensorShapeProto),
    ]


class TypeProto(Message):
    FIELDS = [
        Field(1, "tensor_type", "message", message_cls=TensorTypeProto),
        Field(6, "denotation", "string"),
    ]


class ValueInfoProto(Message):
    FIELDS = [
        Field(1, "name", "string"),
        Field(2, "type", "message", message_cls=TypeProto),
        Field(3, "doc_string", "string"),
    ]


class AttributeProto(Message):
    FIELDS: list = []  # set below (self-referential via GraphProto)


class NodeProto(Message):
    FIELDS = [
        Field(1, "input", "string", repeated=True),
        Field(2, "output", "string", repeated=True),
        Field(3, "name", "string"),
        Field(4, "op_type", "string"),
        Field(5, "attribute", "message", repeated=True, message_cls=AttributeProto),
        Field(6, "doc_string", "string"),
        Field(7, "domain", "string"),
    ]


class GraphProto(Message):
    FIELDS = [
        Field(1, "node", "message", repeated=True, message_cls=NodeProto),
        Field(2, "name", "string"),
        Field(5, "initializer", "message", repeated=True, message_cls=TensorProto),
        Field(10, "doc_string", "string"),
        Field(11, "input", "message", repeated=True, message_cls=ValueInfoProto),
        Field(12, "output", "message", repeated=True, message_cls=ValueInfoProto),
        Field(13, "value_info", "message", repeated=True, message_cls=ValueInfoProto),
    ]


AttributeProto.FIELDS = [
    Field(1, "name", "string"),
    Field(2, "f", "float"),
    Field(3, "i", "int64"),
    Field(4, "s", "bytes"),
    Field(5, "t", "message", message_cls=TensorProto),
    Field(6, "g", "message", message_cls=GraphProto),
    Field(7, "floats", "float", repeated=True),
    Field(8, "ints", "int64", repeated=True),
    Field(9, "strings", "bytes", repeated=True),
    Field(10, "tensors", "message", repeated=True, message_cls=TensorProto),
    Field(11, "graphs", "message", repeated=True, message_cls=GraphProto),
    Field(13, "doc_string", "string"),
    Field(20, "type", "int32"),
    Field(21, "ref_attr_name", "string"),
]


class OperatorSetIdProto(Message):
    FIELDS = [
        Field(1, "domain", "string"),
        Field(2, "version", "int64"),
    ]


class FunctionProto(Message):
    FIELDS = [
        Field(1, "name", "string"),
        Field(4, "input", "string", repeated=True),
        Field(5, "output", "string", repeated=True),
        Field(6, "attribute", "string", repeated=True),
        Field(7, "node", "message", repeated=True, message_cls=NodeProto),
        Field(8, "doc_string", "string"),
        Field(9, "opset_import", "message", repeated=True, message_cls=OperatorSetIdProto),
        Field(10, "domain", "string"),
    ]


class ModelProto(Message):
    FIELDS = [
        Field(1, "ir_version", "int64"),
        Field(2, "producer_name", "string"),
        Field(3, "producer_version", "string"),
        Field(4, "domain", "string"),
        Field(5, "model_version", "int64"),
        Field(6, "doc_string", "string"),
        Field(7, "graph", "message", message_cls=GraphProto),
        Field(8, "opset_import", "message", repeated=True, message_cls=OperatorSetIdProto),
        Field(14, "metadata_props", "message", repeated=True, message_cls=StringStringEntryProto),
        Field(25, "functions", "message", repeated=True, message_cls=FunctionProto),
    ]


def load_model(path) -> ModelProto:
    with open(path, "rb") as f:
        return ModelProto.decode(f.read())


def load_model_from_string(data: bytes) -> ModelProto:
    return ModelProto.decode(data)


def save_model(model: ModelProto, path) -> None:
    with open(path, "wb") as f:
        f.write(model.encode())

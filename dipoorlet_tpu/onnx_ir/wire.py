"""Protobuf wire-format primitives (pure Python, zero dependencies).

The reference framework leans on the `onnx` pip package for all model IO
(/root/reference/dipoorlet/utils.py:9-12).  This TPU build ships its own
wire-level protobuf codec instead, so the framework is fully standalone:
no protobuf runtime, no onnx package, no C extensions required to parse
or emit ONNX models.

Only the four wire types used by onnx.proto are implemented:
  0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32.
"""
from __future__ import annotations

import struct

WT_VARINT = 0
WT_FIXED64 = 1
WT_LEN = 2
WT_FIXED32 = 5

_u64 = struct.Struct("<Q")
_u32 = struct.Struct("<I")
_f32 = struct.Struct("<f")
_f64 = struct.Struct("<d")


def encode_varint(value: int, out: bytearray) -> None:
    if value < 0:
        # Negative int64 values occupy 10 bytes (two's complement).
        value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_varint(buf, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def varint_to_int64(value: int) -> int:
    """Reinterpret an unsigned varint as a signed 64-bit integer."""
    if value >= 1 << 63:
        value -= 1 << 64
    return value


def encode_tag(field_number: int, wire_type: int, out: bytearray) -> None:
    encode_varint((field_number << 3) | wire_type, out)


def decode_tag(buf, pos: int):
    key, pos = decode_varint(buf, pos)
    return key >> 3, key & 0x07, pos


def encode_bytes(data: bytes, out: bytearray) -> None:
    encode_varint(len(data), out)
    out += data


def decode_bytes(buf, pos: int):
    n, pos = decode_varint(buf, pos)
    end = pos + n
    if end > len(buf):
        raise ValueError("truncated length-delimited field")
    return buf[pos:end], end


def skip_field(buf, pos: int, wire_type: int) -> int:
    if wire_type == WT_VARINT:
        _, pos = decode_varint(buf, pos)
    elif wire_type == WT_FIXED64:
        pos += 8
    elif wire_type == WT_LEN:
        n, pos = decode_varint(buf, pos)
        pos += n
    elif wire_type == WT_FIXED32:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    if pos > len(buf):
        raise ValueError("truncated field while skipping")
    return pos


def encode_float(value: float, out: bytearray) -> None:
    out += _f32.pack(value)


def encode_double(value: float, out: bytearray) -> None:
    out += _f64.pack(value)


def decode_float(buf, pos: int):
    return _f32.unpack_from(buf, pos)[0], pos + 4


def decode_double(buf, pos: int):
    return _f64.unpack_from(buf, pos)[0], pos + 8


def decode_fixed32(buf, pos: int):
    return _u32.unpack_from(buf, pos)[0], pos + 4


def decode_fixed64(buf, pos: int):
    return _u64.unpack_from(buf, pos)[0], pos + 8

"""Minimal ONNX reader: extract initializer tensors without the onnx package.

The reference's primary model interchange format is ONNX (its ONNX Runtime /
OpenVINO backends and the temporal exporter all speak it). This image ships
no ``onnx`` package, but an ONNX file is plain protobuf — and all we need
for checkpoint loading are the *initializers* (weights), whose names in
torch-exported models preserve the state-dict naming
(``model.0.conv.weight`` …). This module hand-decodes exactly that subset of
the wire format:

    ModelProto.graph (field 7) -> GraphProto.initializer (field 5, repeated)
    TensorProto: dims(1, varint repeated), data_type(2, varint),
                 name(8, bytes), float_data(4, packed), int64_data(7),
                 raw_data(9, bytes)

Anything else (nodes, shapes, opsets) is skipped by generic field skipping.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ONNX TensorProto.DataType -> numpy
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _to_signed64(v: int) -> int:
    """Protobuf encodes int64 as 64-bit two's complement varints; fold the
    unsigned decode back to signed so e.g. -1 doesn't arrive as 2**64-1."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _read_field_header(buf: bytes, pos: int) -> Tuple[int, int, int]:
    key, pos = _read_varint(buf, pos)
    return key >> 3, key & 0x7, pos


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:  # varint
        _, pos = _read_varint(buf, pos)
        return pos
    if wire_type == 1:  # fixed64
        return pos + 8
    if wire_type == 2:  # length-delimited
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wire_type == 5:  # fixed32
        return pos + 4
    raise ValueError(f"unsupported protobuf wire type {wire_type}")


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    pos = 0
    dims: List[int] = []
    dtype_code = 1
    name = ""
    raw = b""
    float_data: List[float] = []
    int64_data: List[int] = []
    n = len(buf)
    while pos < n:
        field, wt, pos = _read_field_header(buf, pos)
        if field == 1 and wt == 0:  # dims (unpacked)
            v, pos = _read_varint(buf, pos)
            dims.append(_to_signed64(v))
        elif field == 1 and wt == 2:  # dims (packed)
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                dims.append(_to_signed64(v))
        elif field == 2 and wt == 0:  # data_type
            dtype_code, pos = _read_varint(buf, pos)
        elif field == 4 and wt == 2:  # float_data (packed)
            ln, pos = _read_varint(buf, pos)
            float_data.extend(
                struct.unpack(f"<{ln // 4}f", buf[pos : pos + ln])
            )
            pos += ln
        elif field == 4 and wt == 5:  # float_data (unpacked)
            float_data.append(struct.unpack("<f", buf[pos : pos + 4])[0])
            pos += 4
        elif field == 7 and wt == 2:  # int64_data (packed)
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                int64_data.append(_to_signed64(v))
        elif field == 7 and wt == 0:  # int64_data (unpacked)
            v, pos = _read_varint(buf, pos)
            int64_data.append(_to_signed64(v))
        elif field == 8 and wt == 2:  # name
            ln, pos = _read_varint(buf, pos)
            name = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        elif field == 9 and wt == 2:  # raw_data
            ln, pos = _read_varint(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
        else:
            pos = _skip_field(buf, pos, wt)
    np_dtype = _DTYPES.get(dtype_code)
    if np_dtype is None:
        raise ValueError(f"tensor '{name}': unsupported ONNX dtype {dtype_code}")
    if raw:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif float_data:
        arr = np.asarray(float_data, dtype=np.float32)
    elif int64_data:
        arr = np.asarray(int64_data, dtype=np.int64)
    else:
        arr = np.zeros(0, dtype=np_dtype)
    return name, arr.reshape(dims) if dims else arr


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_delimited(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


_NP_TO_ONNX = {np.dtype(np.float32): 1, np.dtype(np.float16): 10,
               np.dtype(np.int64): 7, np.dtype(np.int32): 6,
               np.dtype(np.int8): 3, np.dtype(np.uint8): 2}


def write_onnx_initializers(path: str, tensors: Dict[str, np.ndarray]) -> None:
    """Serialize {name: array} as a minimal .onnx file (initializers only —
    a weights container, not an executable graph). Round-trips through
    ``read_onnx_initializers`` and standard ONNX tooling can read the
    initializers too."""
    inits = b""
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        dt = _NP_TO_ONNX.get(arr.dtype)
        if dt is None:
            arr = arr.astype(np.float32)
            dt = 1
        t = b""
        for d in arr.shape:
            t += _varint(1 << 3) + _varint(d)  # dims, field 1 varint
        t += _varint(2 << 3) + _varint(dt)  # data_type, field 2
        t += _len_delimited(8, name.encode("utf-8"))  # name
        t += _len_delimited(9, arr.tobytes())  # raw_data
        inits += _len_delimited(5, t)  # GraphProto.initializer
    graph = _len_delimited(2, b"weights") + inits  # name + initializers
    model = (
        _varint(1 << 3) + _varint(8)  # ir_version = 8
        + _len_delimited(7, graph)  # graph
    )
    with open(path, "wb") as f:
        f.write(model)


def read_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """Parse an .onnx file and return {initializer name: array}."""
    buf = open(path, "rb").read()
    pos = 0
    out: Dict[str, np.ndarray] = {}
    n = len(buf)
    # ModelProto scan
    while pos < n:
        field, wt, pos = _read_field_header(buf, pos)
        if field == 7 and wt == 2:  # graph
            ln, pos = _read_varint(buf, pos)
            graph = buf[pos : pos + ln]
            pos += ln
            gpos = 0
            gn = len(graph)
            while gpos < gn:
                gfield, gwt, gpos = _read_field_header(graph, gpos)
                if gfield == 5 and gwt == 2:  # initializer
                    tln, gpos = _read_varint(graph, gpos)
                    name, arr = _parse_tensor(graph[gpos : gpos + tln])
                    gpos += tln
                    if name:
                        out[name] = arr
                else:
                    gpos = _skip_field(graph, gpos, gwt)
        else:
            pos = _skip_field(buf, pos, wt)
    return out

"""Minimal OTLP protobuf wire codec (logs + traces export requests).

The stock collector's OTLP/HTTP receiver accepts ``application/x-protobuf``
by default (reference config.yaml:1-7 enables it); this module gives the
in-engine listener the same surface without any generated code or a
protobuf runtime: a hand-rolled proto3 *wire-format* codec (public spec:
protobuf.dev/programming-guides/encoding) driven by declarative schemas
for the OTLP message subset (opentelemetry-proto
logs/v1, trace/v1, common/v1, resource/v1).

Decoding emits the protobuf-JSON mapping (camelCase keys, int64 as
strings, bytes as base64 with the OTLP traceId/spanId hex special-case)
— exactly the dict shape ``otlp.otlp_to_records`` already consumes, so
binary and JSON bodies share one value-mapping path end to end.  The
matching encoder exists for tests and for gRPC-framed payloads (a gRPC
message body is this same encoding behind a 5-byte frame prefix).

Field types:
  "string" / "bytes" / "hex"   length-delimited (hex: traceId/spanId)
  "int64" / "uint64"           varint, JSON string per proto3 JSON
  "fixed64u"                   fixed 64-bit unsigned, JSON string
                               (OTLP's *_unix_nano fields are fixed64)
  "int32" / "uint32" / "enum"  varint, JSON number
  "bool"                       varint 0/1
  "double"                     fixed 64-bit
  "fixed32"                    fixed 32-bit (LogRecord.flags)
  dict                         nested message schema
A trailing "*" on the json name marks a repeated field.
"""

from __future__ import annotations

import base64
import struct
from typing import Any

# ---------------------------------------------------------------------------
# OTLP message schemas: field number -> (jsonName[*], type)
# opentelemetry-proto common/v1/common.proto
# ---------------------------------------------------------------------------

# AnyValue is a oneof and needs bespoke handling (see _decode_any_value);
# this table only records its wire types.
_ANY_VALUE_FIELDS = {
    1: ("stringValue", "string"),
    2: ("boolValue", "bool"),
    3: ("intValue", "int64"),
    4: ("doubleValue", "double"),
    5: ("arrayValue", "array"),
    6: ("kvlistValue", "kvlist"),
    7: ("bytesValue", "bytes"),
}

KEY_VALUE = {1: ("key", "string"), 2: ("value", "anyvalue")}

INSTRUMENTATION_SCOPE = {
    1: ("name", "string"),
    2: ("version", "string"),
    3: ("attributes*", KEY_VALUE),
    4: ("droppedAttributesCount", "uint32"),
}

RESOURCE = {
    1: ("attributes*", KEY_VALUE),
    2: ("droppedAttributesCount", "uint32"),
}

LOG_RECORD = {
    1: ("timeUnixNano", "fixed64u"),
    2: ("severityNumber", "enum"),
    3: ("severityText", "string"),
    5: ("body", "anyvalue"),
    6: ("attributes*", KEY_VALUE),
    7: ("droppedAttributesCount", "uint32"),
    8: ("flags", "fixed32"),
    9: ("traceId", "hex"),
    10: ("spanId", "hex"),
    11: ("observedTimeUnixNano", "fixed64u"),
    12: ("eventName", "string"),
}

SCOPE_LOGS = {
    1: ("scope", INSTRUMENTATION_SCOPE),
    2: ("logRecords*", LOG_RECORD),
    3: ("schemaUrl", "string"),
}

RESOURCE_LOGS = {
    1: ("resource", RESOURCE),
    2: ("scopeLogs*", SCOPE_LOGS),
    3: ("schemaUrl", "string"),
}

EXPORT_LOGS_REQUEST = {1: ("resourceLogs*", RESOURCE_LOGS)}

SPAN_EVENT = {
    1: ("timeUnixNano", "fixed64u"),
    2: ("name", "string"),
    3: ("attributes*", KEY_VALUE),
    4: ("droppedAttributesCount", "uint32"),
}

SPAN_LINK = {
    1: ("traceId", "hex"),
    2: ("spanId", "hex"),
    3: ("traceState", "string"),
    4: ("attributes*", KEY_VALUE),
    5: ("droppedAttributesCount", "uint32"),
}

SPAN_STATUS = {2: ("message", "string"), 3: ("code", "enum")}

SPAN = {
    1: ("traceId", "hex"),
    2: ("spanId", "hex"),
    3: ("traceState", "string"),
    4: ("parentSpanId", "hex"),
    5: ("name", "string"),
    6: ("kind", "enum"),
    7: ("startTimeUnixNano", "fixed64u"),
    8: ("endTimeUnixNano", "fixed64u"),
    9: ("attributes*", KEY_VALUE),
    10: ("droppedAttributesCount", "uint32"),
    11: ("events*", SPAN_EVENT),
    12: ("droppedEventsCount", "uint32"),
    13: ("links*", SPAN_LINK),
    14: ("droppedLinksCount", "uint32"),
    15: ("status", SPAN_STATUS),
}

SCOPE_SPANS = {
    1: ("scope", INSTRUMENTATION_SCOPE),
    2: ("spans*", SPAN),
    3: ("schemaUrl", "string"),
}

RESOURCE_SPANS = {
    1: ("resource", RESOURCE),
    2: ("scopeSpans*", SCOPE_SPANS),
    3: ("schemaUrl", "string"),
}

EXPORT_TRACES_REQUEST = {1: ("resourceSpans*", RESOURCE_SPANS)}

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


class ProtoDecodeError(ValueError):
    """Malformed protobuf wire data (truncated, bad tag, bad UTF-8)."""


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if i >= len(buf):
            raise ProtoDecodeError("truncated varint")
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7
        if shift >= 70:
            raise ProtoDecodeError("varint too long")


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:  # int64 negatives encode as 10-byte two's complement
        v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag_signed(v: int) -> int:
    """Interpret a varint as int64 (two's complement, NOT zigzag —
    OTLP's int64 fields are plain ``int64``, no ``sint64`` in use)."""
    return v - (1 << 64) if v >= 1 << 63 else v


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_scalar(kind: str, wire_type: int, value: Any) -> Any:
    if kind == "string":
        if wire_type != _WT_LEN:
            raise ProtoDecodeError("string field with non-length wire type")
        try:
            return value.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise ProtoDecodeError(f"invalid UTF-8 in string field: {exc}") from exc
    if kind == "bytes":
        if wire_type != _WT_LEN:
            raise ProtoDecodeError("bytes field with non-length wire type")
        return base64.b64encode(value).decode("ascii")
    if kind == "hex":  # OTLP JSON: traceId/spanId are hex, not base64
        if wire_type != _WT_LEN:
            raise ProtoDecodeError("id field with non-length wire type")
        return value.hex()
    if kind == "double":
        if wire_type != _WT_I64:
            raise ProtoDecodeError("double field with non-fixed64 wire type")
        return struct.unpack("<d", value)[0]
    if kind == "fixed64u":
        if wire_type != _WT_I64:
            raise ProtoDecodeError("fixed64 field with non-fixed64 wire type")
        return str(struct.unpack("<Q", value)[0])
    if kind == "fixed32":
        if wire_type != _WT_I32:
            raise ProtoDecodeError("fixed32 field with non-fixed32 wire type")
        return struct.unpack("<I", value)[0]
    if wire_type != _WT_VARINT:
        raise ProtoDecodeError(f"{kind} field with non-varint wire type")
    if kind == "bool":
        return bool(value)
    if kind == "int64":
        return str(_zigzag_signed(value))  # proto3 JSON: 64-bit ints as strings
    if kind == "uint64":
        return str(value)
    if kind in ("int32", "uint32", "enum"):
        return int(value)
    raise ProtoDecodeError(f"unknown scalar kind {kind!r}")


def _read_field(buf: bytes, i: int) -> tuple[int, int, Any, int]:
    """-> (field_number, wire_type, raw value, next index)."""
    tag, i = _read_varint(buf, i)
    field, wire_type = tag >> 3, tag & 7
    if field == 0:
        raise ProtoDecodeError("field number 0")
    if wire_type == _WT_VARINT:
        v, i = _read_varint(buf, i)
        return field, wire_type, v, i
    if wire_type == _WT_I64:
        if i + 8 > len(buf):
            raise ProtoDecodeError("truncated fixed64")
        return field, wire_type, buf[i : i + 8], i + 8
    if wire_type == _WT_I32:
        if i + 4 > len(buf):
            raise ProtoDecodeError("truncated fixed32")
        return field, wire_type, buf[i : i + 4], i + 4
    if wire_type == _WT_LEN:
        n, i = _read_varint(buf, i)
        if i + n > len(buf):
            raise ProtoDecodeError("truncated length-delimited field")
        return field, wire_type, buf[i : i + n], i + n
    raise ProtoDecodeError(f"unsupported wire type {wire_type}")


def _decode_any_value(buf: bytes) -> dict:
    out: dict = {}
    i = 0
    while i < len(buf):
        field, wt, raw, i = _read_field(buf, i)
        spec = _ANY_VALUE_FIELDS.get(field)
        if spec is None:
            continue  # unknown field: skip (forward compat)
        name, kind = spec
        if kind == "array":
            values = []
            j = 0
            while j < len(raw):
                f2, wt2, raw2, j = _read_field(raw, j)
                if f2 == 1 and wt2 == _WT_LEN:
                    values.append(_decode_any_value(raw2))
            out = {name: {"values": values}}
        elif kind == "kvlist":
            values = []
            j = 0
            while j < len(raw):
                f2, wt2, raw2, j = _read_field(raw, j)
                if f2 == 1 and wt2 == _WT_LEN:
                    values.append(_decode_message(raw2, KEY_VALUE))
            out = {name: {"values": values}}
        else:
            out = {name: _decode_scalar(kind, wt, raw)}
    return out


def _decode_message(buf: bytes, schema: dict) -> dict:
    out: dict = {}
    i = 0
    while i < len(buf):
        field, wt, raw, i = _read_field(buf, i)
        spec = schema.get(field)
        if spec is None:
            continue  # unknown field: skip, per proto3 semantics
        name, kind = spec
        repeated = name.endswith("*")
        if repeated:
            name = name[:-1]
        if kind == "anyvalue":
            if wt != _WT_LEN:
                raise ProtoDecodeError("message field with non-length wire type")
            value = _decode_any_value(raw)
        elif isinstance(kind, dict):
            if wt != _WT_LEN:
                raise ProtoDecodeError("message field with non-length wire type")
            value = _decode_message(raw, kind)
        else:
            value = _decode_scalar(kind, wt, raw)
        if repeated:
            out.setdefault(name, []).append(value)
        else:
            out[name] = value
    return out


def decode_export_request(body: bytes, signal: str) -> dict:
    """Binary OTLP export request -> protobuf-JSON dict (the shape
    ``otlp_to_records`` consumes).  ``signal`` is "logs" or "traces"."""
    schema = EXPORT_LOGS_REQUEST if signal == "logs" else EXPORT_TRACES_REQUEST
    return _decode_message(bytes(body), schema)


# ---------------------------------------------------------------------------
# encode (tests + gRPC frame payloads)
# ---------------------------------------------------------------------------


def _tag(out: bytearray, field: int, wire_type: int) -> None:
    _write_varint(out, (field << 3) | wire_type)


def _write_len(out: bytearray, field: int, payload: bytes) -> None:
    _tag(out, field, _WT_LEN)
    _write_varint(out, len(payload))
    out.extend(payload)


def _encode_scalar(out: bytearray, field: int, kind: str, v: Any) -> None:
    if kind == "string":
        _write_len(out, field, str(v).encode("utf-8"))
    elif kind == "bytes":
        _write_len(out, field, base64.b64decode(v) if isinstance(v, str) else bytes(v))
    elif kind == "hex":
        _write_len(out, field, bytes.fromhex(v) if isinstance(v, str) else bytes(v))
    elif kind == "double":
        _tag(out, field, _WT_I64)
        out.extend(struct.pack("<d", float(v)))
    elif kind == "fixed32":
        _tag(out, field, _WT_I32)
        out.extend(struct.pack("<I", int(v)))
    elif kind == "fixed64u":
        _tag(out, field, _WT_I64)
        out.extend(struct.pack("<Q", int(v)))
    elif kind == "bool":
        _tag(out, field, _WT_VARINT)
        _write_varint(out, 1 if v else 0)
    elif kind in ("int64", "uint64", "int32", "uint32", "enum"):
        _tag(out, field, _WT_VARINT)
        _write_varint(out, int(v))
    else:
        raise ValueError(f"unknown scalar kind {kind!r}")


def _encode_any_value(v: dict) -> bytes:
    out = bytearray()
    for field, (name, kind) in _ANY_VALUE_FIELDS.items():
        if name not in v:
            continue
        if kind == "array":
            inner = bytearray()
            for item in v[name].get("values", []):
                _write_len(inner, 1, _encode_any_value(item))
            _write_len(out, field, bytes(inner))
        elif kind == "kvlist":
            inner = bytearray()
            for item in v[name].get("values", []):
                _write_len(inner, 1, _encode_message(item, KEY_VALUE))
            _write_len(out, field, bytes(inner))
        else:
            _encode_scalar(out, field, kind, v[name])
    return bytes(out)


def _encode_message(msg: dict, schema: dict) -> bytes:
    out = bytearray()
    for field, (name, kind) in schema.items():
        repeated = name.endswith("*")
        if repeated:
            name = name[:-1]
        if name not in msg:
            continue
        values = msg[name] if repeated else [msg[name]]
        for v in values:
            if kind == "anyvalue":
                _write_len(out, field, _encode_any_value(v))
            elif isinstance(kind, dict):
                _write_len(out, field, _encode_message(v, kind))
            else:
                _encode_scalar(out, field, kind, v)
    return bytes(out)


def encode_export_request(req: dict, signal: str) -> bytes:
    """Protobuf-JSON dict -> binary OTLP export request body."""
    schema = EXPORT_LOGS_REQUEST if signal == "logs" else EXPORT_TRACES_REQUEST
    return _encode_message(req, schema)

"""gRPC surface tests: framing codec, gRPC-Web over the HTTP listener
(in-sandbox end-to-end), and the native grpcio receiver (skipped where
grpcio is absent — the sandbox image ships without it)."""

from __future__ import annotations

import json
import struct
import urllib.request

import pytest

from opentelemetry_collector_symbolicator_ray.sources.otlp import record_to_otlp
from opentelemetry_collector_symbolicator_ray.sources.otlp_grpc import (
    GRPC_METHOD_SIGNALS,
    GrpcFramingError,
    frame_message,
    grpc_web_response,
    unframe_messages,
)
from opentelemetry_collector_symbolicator_ray.sources.otlp_http import OTLPHttpReceiver
from opentelemetry_collector_symbolicator_ray.sources.otlp_proto import (
    encode_export_request,
)

LOGS_PATH = "/opentelemetry.proto.collector.logs.v1.LogsService/Export"
TRACES_PATH = "/opentelemetry.proto.collector.trace.v1.TraceService/Export"


def rec(i: int) -> dict:
    return {
        "event_name": f"e{i}",
        "attributes": {"k": i},
        "resource_attributes": {"telemetry.sdk.language": "webjs"},
    }


def post(url: str, body: bytes, ctype: str) -> tuple[int, bytes]:
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, resp.read()


# ---- framing codec ----


def test_frame_roundtrip():
    msgs = [b"", b"x", b"hello" * 100]
    body = b"".join(frame_message(m) for m in msgs)
    assert unframe_messages(body) == msgs


def test_frame_header_layout():
    f = frame_message(b"abc")
    assert f[:5] == struct.pack(">BI", 0, 3) and f[5:] == b"abc"


def test_unframe_rejects_malformed():
    for bad in [
        b"\x00\x00\x00",  # truncated header
        b"\x00\x00\x00\x00\x05ab",  # truncated payload
        b"\x01\x00\x00\x00\x01a",  # compressed without negotiation
    ]:
        with pytest.raises(GrpcFramingError):
            unframe_messages(bad)


def test_unframe_stops_at_trailer_frame():
    body = frame_message(b"m") + frame_message(b"grpc-status:0\r\n", 0x80)
    assert unframe_messages(body) == [b"m"]


def test_grpc_web_response_shapes():
    ok = grpc_web_response()
    # empty message frame + trailer frame with status 0
    assert ok.startswith(struct.pack(">BI", 0, 0))
    assert b"grpc-status:0" in ok
    err = grpc_web_response(status=3, message="bad payload")
    assert not err.startswith(struct.pack(">BI", 0, 0))  # trailers-only
    assert b"grpc-status:3" in err and b"grpc-message:bad%20payload" in err


# ---- gRPC-Web over the HTTP listener ----


@pytest.fixture
def receiver(tmp_path):
    r = OTLPHttpReceiver(str(tmp_path / "spool"), rotate_records=1000)
    yield r
    r.close()


def test_grpc_web_export_equals_json_path(receiver):
    base = f"http://{receiver.host}:{receiver.port}"
    reqs = [record_to_otlp(rec(i)) for i in range(3)]
    for r in reqs:
        body = frame_message(encode_export_request(r, "logs"))
        status, resp = post(base + LOGS_PATH, body, "application/grpc-web+proto")
        assert status == 200
        frames = unframe_messages(resp)
        assert frames == [b""]  # empty ExportServiceResponse
        assert b"grpc-status:0" in resp
    for r in reqs:
        status, _ = post(f"{base}/v1/logs", json.dumps(r).encode(), "application/json")
        assert status == 200
    assert receiver.received == 6
    files = receiver.rotate()
    lines = [json.loads(ln) for f in files for ln in open(f)]
    assert lines[:3] == lines[3:]  # gRPC-Web half == JSON half, canonicalized


def test_grpc_web_traces_and_multi_message(receiver):
    base = f"http://{receiver.host}:{receiver.port}"
    span_req = record_to_otlp(
        {
            "event_name": "GET /y",
            "attributes": {},
            "resource_attributes": {"service.name": "s"},
            "events": [{"name": "exception", "attributes": {"st": "x"}}],
        }
    )
    # two Export messages in one request body: both must spool
    body = frame_message(encode_export_request(span_req, "traces")) * 2
    status, _ = post(base + TRACES_PATH, body, "application/grpc-web+proto")
    assert status == 200
    assert receiver.received == 2


def test_grpc_web_malformed_is_http_200_with_grpc_error(receiver):
    base = f"http://{receiver.host}:{receiver.port}"
    # malformed framing AND malformed proto inside a valid frame
    for body in [b"\x00\x00\x00", frame_message(b"\x0a\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff")]:
        status, resp = post(base + LOGS_PATH, body, "application/grpc-web+proto")
        assert status == 200  # per grpc-web: errors ride trailers, not HTTP
        assert b"grpc-status:3" in resp
    assert receiver.rejected == 2
    assert receiver.received == 0
    # the method paths only speak grpc-web: a JSON post there is a 404
    req = urllib.request.Request(
        base + LOGS_PATH, data=b"{}", headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 404


# ---- native grpcio receiver (skipped without grpcio) ----


def test_native_grpc_receiver(tmp_path):
    grpc = pytest.importorskip("grpc")
    from opentelemetry_collector_symbolicator_ray.sources.otlp_grpc import (
        OTLPGrpcReceiver,
    )
    from opentelemetry_collector_symbolicator_ray.sources.otlp_http import JsonlSpool

    spool = JsonlSpool(str(tmp_path / "spool"), rotate_records=1000)
    r = OTLPGrpcReceiver(spool)
    try:
        channel = grpc.insecure_channel(f"{r.host}:{r.port}")
        export = channel.unary_unary(
            LOGS_PATH,
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        assert export(encode_export_request(record_to_otlp(rec(0)), "logs")) == b""
        assert r.received == 1
        with pytest.raises(grpc.RpcError) as ei:
            export(b"\xff\xff\xff")
        assert ei.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        assert r.rejected == 1
    finally:
        r.close()


def test_native_receiver_clear_error_without_grpcio(tmp_path, monkeypatch):
    """Where grpcio is missing the constructor must point at the
    gRPC-Web alternative, not die with a bare ImportError."""
    import builtins

    real_import = builtins.__import__

    def no_grpc(name, *a, **kw):
        if name == "grpc":
            raise ImportError("No module named 'grpc'")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_grpc)
    from opentelemetry_collector_symbolicator_ray.sources.otlp_grpc import (
        OTLPGrpcReceiver,
    )
    from opentelemetry_collector_symbolicator_ray.sources.otlp_http import JsonlSpool

    spool = JsonlSpool(str(tmp_path / "spool"))
    with pytest.raises(RuntimeError, match="gRPC-Web"):
        OTLPGrpcReceiver(spool)


def test_method_signal_table():
    assert GRPC_METHOD_SIGNALS[LOGS_PATH] == "logs"
    assert GRPC_METHOD_SIGNALS[TRACES_PATH] == "traces"

"""Binary-protobuf OTLP tests (sources/otlp_proto.py + the
application/x-protobuf path of the HTTP listener).

The wire codec is hand-rolled from the public proto3 encoding spec, so
it is verified three ways: (1) encoder<->decoder roundtrips, (2) an
INDEPENDENT implementation — google.protobuf dynamic messages built
from the same OTLP field numbers (tests/otlp_refproto.py) — must accept
our bytes and produce our JSON, and (3) the HTTP listener must route a
binary body to the same records as the equivalent JSON body (reference
parity: the stock OTLP/HTTP receiver accepts both encodings,
config.yaml:1-7)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from opentelemetry_collector_symbolicator_ray.sources.otlp import (
    otlp_to_records,
    record_to_otlp,
)
from opentelemetry_collector_symbolicator_ray.sources.otlp_http import OTLPHttpReceiver
from opentelemetry_collector_symbolicator_ray.sources.otlp_proto import (
    ProtoDecodeError,
    decode_export_request,
    encode_export_request,
)


def post(url: str, body: bytes, ctype: str) -> tuple[int, bytes, str]:
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, resp.read(), resp.headers.get("Content-Type", "")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type", "")


FULL_LOGS = {
    "resourceLogs": [
        {
            "resource": {
                "attributes": [
                    {"key": "a", "value": {"stringValue": "b"}},
                    {"key": "n", "value": {"intValue": "-7"}},
                ]
            },
            "scopeLogs": [
                {
                    "scope": {"name": "lib", "version": "1.2"},
                    "logRecords": [
                        {
                            "timeUnixNano": "1700000000000000001",
                            "severityNumber": 17,
                            "severityText": "ERROR",
                            "body": {
                                "arrayValue": {
                                    "values": [
                                        {"doubleValue": 2.5},
                                        {"boolValue": True},
                                        {
                                            "kvlistValue": {
                                                "values": [
                                                    {
                                                        "key": "x",
                                                        "value": {"intValue": "9"},
                                                    }
                                                ]
                                            }
                                        },
                                    ]
                                }
                            },
                            "eventName": "exception",
                            "traceId": "0af7651916cd43dd8448eb211c80319c",
                            "spanId": "b7ad6b7169203331",
                            "flags": 1,
                            "attributes": [
                                {"key": "neg", "value": {"intValue": "-42"}}
                            ],
                        }
                    ],
                }
            ],
        }
    ]
}

FULL_TRACES = {
    "resourceSpans": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "s"}}
                ]
            },
            "scopeSpans": [
                {
                    "spans": [
                        {
                            "traceId": "0af7651916cd43dd8448eb211c80319c",
                            "spanId": "b7ad6b7169203331",
                            "name": "GET /x",
                            "kind": 2,
                            "startTimeUnixNano": "1",
                            "endTimeUnixNano": "2",
                            "attributes": [
                                {"key": "k", "value": {"stringValue": "v"}}
                            ],
                            "events": [
                                {
                                    "timeUnixNano": "3",
                                    "name": "exception",
                                    "attributes": [
                                        {
                                            "key": "exception.stacktrace",
                                            "value": {"stringValue": "at bar"},
                                        }
                                    ],
                                }
                            ],
                            "status": {"code": 2, "message": "boom"},
                        }
                    ]
                }
            ],
        }
    ]
}


def test_roundtrip_full_fields():
    for req, sig in [(FULL_LOGS, "logs"), (FULL_TRACES, "traces")]:
        body = encode_export_request(req, sig)
        assert decode_export_request(body, sig) == req


def test_roundtrip_engine_records():
    recs = [
        {
            "event_name": "exception",
            "attributes": {"st": "at foo (a.js:1:2)", "n": 3, "f": 1.5, "b": True,
                           "lst": ["x", 2]},
            "resource_attributes": {"telemetry.sdk.language": "webjs"},
        },
        {
            "event_name": "GET /x",
            "attributes": {"k": "v"},
            "resource_attributes": {"service.name": "s"},
            "events": [{"name": "exception", "attributes": {"st": "at bar"}}],
        },
    ]
    for rec in recs:
        sig = "traces" if "events" in rec else "logs"
        req = record_to_otlp(rec)
        back = decode_export_request(encode_export_request(req, sig), sig)
        assert otlp_to_records(back) == otlp_to_records(req)


def test_cross_check_google_protobuf():
    """google.protobuf dynamic messages built from the same OTLP field
    numbers are an independent wire implementation: their deterministic
    serialization must decode to our JSON (modulo the OTLP hex-id
    special case generic protobuf-JSON can't express), and our encoder's
    bytes must parse back to the identical message."""
    from google.protobuf import json_format

    from tests.otlp_refproto import build_pool, message_class

    pool = build_pool()
    import base64

    _IDS = ("traceId", "spanId", "parentSpanId")

    def hexify(obj):
        # generic protobuf-JSON base64s bytes; OTLP JSON hex-encodes ids
        if isinstance(obj, dict):
            return {
                k: base64.b64decode(v).hex() if k in _IDS else hexify(v)
                for k, v in obj.items()
            }
        if isinstance(obj, list):
            return [hexify(x) for x in obj]
        return obj

    def b64ids(obj):
        # ParseDict expects generic protobuf-JSON, i.e. base64 bytes —
        # feed it base64 of the OTLP hex ids so the message holds the
        # same raw id bytes our OTLP-hex encoder produces
        if isinstance(obj, dict):
            return {
                k: (
                    base64.b64encode(bytes.fromhex(v)).decode()
                    if k in _IDS
                    else b64ids(v)
                )
                for k, v in obj.items()
            }
        if isinstance(obj, list):
            return [b64ids(x) for x in obj]
        return obj

    for cls_name, req, sig in [
        ("ExportLogsServiceRequest", FULL_LOGS, "logs"),
        ("ExportTraceServiceRequest", FULL_TRACES, "traces"),
    ]:
        cls = message_class(pool, cls_name)
        m = cls()
        json_format.ParseDict(b64ids(req), m)
        ref_bytes = m.SerializeToString(deterministic=True)
        assert decode_export_request(ref_bytes, sig) == hexify(
            json_format.MessageToDict(m)
        )
        m2 = cls()
        m2.ParseFromString(encode_export_request(req, sig))
        assert json_format.MessageToDict(m2) == json_format.MessageToDict(m)


def test_decoder_rejects_malformed():
    for bad in [b"\x0a", b"\x0a\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff",
                b"\x07", b"\x0a\x02\x0a"]:
        with pytest.raises(ProtoDecodeError):
            decode_export_request(bad, "logs")


def test_decoder_total_on_arbitrary_bytes():
    """Decoder is TOTAL over arbitrary input: returns a dict or raises
    ProtoDecodeError — never another exception (the listener maps
    ProtoDecodeError to a per-request 400)."""
    import random

    rng = random.Random(42)
    for _ in range(500):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
        try:
            out = decode_export_request(blob, "logs")
        except ProtoDecodeError:
            continue
        assert isinstance(out, dict)


@pytest.fixture
def receiver(tmp_path):
    r = OTLPHttpReceiver(str(tmp_path / "spool"), rotate_records=1000)
    yield r
    r.close()


def test_http_binary_equals_json_path(receiver):
    """A binary body and its JSON equivalent land byte-identical lines
    in the spool — one canonical downstream encoding."""
    base = f"http://{receiver.host}:{receiver.port}"
    reqs = [
        record_to_otlp(
            {
                "event_name": f"e{i}",
                "attributes": {"k": i},
                "resource_attributes": {"telemetry.sdk.language": "webjs"},
            }
        )
        for i in range(4)
    ]
    for req in reqs:
        status, body, ctype = post(
            f"{base}/v1/logs", encode_export_request(req, "logs"),
            "application/x-protobuf",
        )
        assert status == 200 and body == b"" and ctype == "application/x-protobuf"
    for req in reqs:
        status, _, _ = post(
            f"{base}/v1/logs", json.dumps(req).encode(), "application/json"
        )
        assert status == 200
    assert receiver.received == 8
    files = receiver.rotate()
    lines = [json.loads(ln) for f in files for ln in open(f)]
    assert lines[:4] == lines[4:]  # binary half == JSON half, canonicalized

    # traces path too
    span_req = record_to_otlp(
        {
            "event_name": "GET /y",
            "attributes": {},
            "resource_attributes": {"service.name": "s"},
            "events": [{"name": "exception", "attributes": {"st": "x"}}],
        }
    )
    status, _, _ = post(
        f"{base}/v1/traces", encode_export_request(span_req, "traces"),
        "application/x-protobuf",
    )
    assert status == 200


def test_http_binary_malformed_is_400_with_proto_status(receiver):
    base = f"http://{receiver.host}:{receiver.port}"
    status, body, ctype = post(
        f"{base}/v1/logs", b"\x0a\x99garbage", "application/x-protobuf"
    )
    assert status == 400 and ctype == "application/x-protobuf"
    # body is a google.rpc.Status: field 1 (code) = 3, field 2 = message
    assert body[0] == 0x08 and body[1] == 0x03
    assert receiver.rejected == 1
    # content-type with parameters still dispatches to protobuf
    req = record_to_otlp(
        {"event_name": "e", "attributes": {}, "resource_attributes": {}}
    )
    status, _, _ = post(
        f"{base}/v1/logs", encode_export_request(req, "logs"),
        "application/x-protobuf; charset=utf-8",
    )
    assert status == 200

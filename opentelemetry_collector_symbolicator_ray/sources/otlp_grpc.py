"""OTLP/gRPC receiver surface (the reference's :4317 half,
config.yaml:4-5, builder-config.yaml:23-24).

Two deployment shapes, one decode path:

1. ``OTLPGrpcReceiver`` — a NATIVE gRPC server over grpcio generic
   handlers (no generated stubs: the request/response (de)serializers
   are identity-on-bytes and the OTLP payloads go through the
   hand-rolled wire codec in ``otlp_proto.py``).  grpcio is optional
   (the sandbox image ships without it); constructing the receiver
   where it is missing raises a clear RuntimeError.
2. gRPC-Web over the HTTP/1.1 listener in ``otlp_http.py`` — the SAME
   method paths, message framing, and proto decode as native gRPC
   (the gRPC-Web protocol differs from gRPC only in transport: HTTP/1.1
   instead of HTTP/2, trailers carried in a flagged frame).  This keeps
   the entire gRPC encode surface exercised end-to-end even without
   grpcio.

Shared here: the 5-byte length-prefixed gRPC message framing
(1-byte compressed flag + big-endian u32 length — public spec:
grpc.io PROTOCOL-HTTP2 / grpc-web protocol docs), the OTLP Export
method paths, and the trailer encoding.

Both shapes append to the same ``JsonlSpool`` and therefore feed the
identical drain -> symbolicate micro-batch pipeline as OTLP/HTTP.
"""

from __future__ import annotations

import struct
import threading
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from .otlp_http import JsonlSpool

# gRPC method path -> signal, exactly the stock OTLP service names
GRPC_METHOD_SIGNALS = {
    "/opentelemetry.proto.collector.logs.v1.LogsService/Export": "logs",
    "/opentelemetry.proto.collector.trace.v1.TraceService/Export": "traces",
}

_TRAILER_FLAG = 0x80  # gRPC-Web: frame carrying HTTP trailers as text


class GrpcFramingError(ValueError):
    """Malformed gRPC length-prefixed framing (truncated, compressed
    without negotiation, trailing garbage)."""


def frame_message(payload: bytes, flags: int = 0) -> bytes:
    """One gRPC length-prefixed frame: flags byte + u32 BE length."""
    return struct.pack(">BI", flags, len(payload)) + payload


def unframe_messages(data: bytes) -> list[bytes]:
    """Split a gRPC request body into its message payloads.

    Rejects compressed frames (no compression is negotiated — same as a
    server without a configured message codec) and truncation.  Trailer
    frames (0x80 flag) terminate parsing: they only appear in responses
    but tolerating them keeps the parser total over echoed bodies."""
    out: list[bytes] = []
    i = 0
    while i < len(data):
        if i + 5 > len(data):
            raise GrpcFramingError("truncated frame header")
        flags, n = struct.unpack_from(">BI", data, i)
        i += 5
        if flags & _TRAILER_FLAG:
            break
        if flags & 0x01:
            raise GrpcFramingError("compressed frame without negotiated codec")
        if i + n > len(data):
            raise GrpcFramingError("truncated frame payload")
        out.append(data[i : i + n])
        i += n
    return out


def encode_trailers(status: int, message: str = "") -> bytes:
    """gRPC-Web trailer frame body: HTTP/1.1-style header block."""
    text = f"grpc-status:{status}\r\n"
    if message:
        # percent-encode per the gRPC spec for grpc-message
        from urllib.parse import quote

        text += f"grpc-message:{quote(message)}\r\n"
    return text.encode("ascii")


def grpc_web_response(status: int = 0, message: str = "") -> bytes:
    """Full gRPC-Web response body: an empty ExportServiceResponse
    message frame (on success) followed by the trailers frame."""
    body = b""
    if status == 0:
        body += frame_message(b"")  # empty ExportServiceResponse
    body += frame_message(encode_trailers(status, message), _TRAILER_FLAG)
    return body


class OTLPGrpcReceiver:
    """Native OTLP/gRPC listener appending to a ``JsonlSpool``.

    Uses grpcio *generic* handlers keyed by the OTLP method paths, with
    bytes-identity (de)serializers — the payload decode is the shared
    ``otlp_proto`` codec, so gRPC, gRPC-Web, HTTP-protobuf and
    HTTP-JSON all spool the identical canonical line for the same
    export request.  Malformed payloads get INVALID_ARGUMENT per
    request, matching the stock receiver's per-request rejection.
    """

    def __init__(
        self,
        spool: "JsonlSpool",
        host: str = "127.0.0.1",
        port: int = 0,
        max_workers: int = 8,
    ) -> None:
        try:
            import grpc
        except ImportError as exc:  # pragma: no cover - sandbox has no grpcio
            raise RuntimeError(
                "OTLPGrpcReceiver requires the optional grpcio dependency; "
                "without it use OTLPHttpReceiver (:4318), which also serves "
                "gRPC-Web on the same Export method paths"
            ) from exc

        from concurrent.futures import ThreadPoolExecutor

        from .otlp_proto import decode_export_request

        self.spool = spool
        self.rejected = 0
        self._lock = threading.Lock()
        receiver = self

        def make_handler(signal: str):
            def export(request: bytes, context):
                try:
                    req = decode_export_request(request, signal)
                except ValueError as exc:
                    with receiver._lock:
                        receiver.rejected += 1
                    context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(exc))
                spool.append(req)
                return b""  # empty ExportServiceResponse

            return grpc.unary_unary_rpc_method_handler(
                export,
                request_deserializer=lambda b: b,
                response_serializer=lambda b: b,
            )

        handlers = []
        for path, signal in GRPC_METHOD_SIGNALS.items():
            service, method = path.lstrip("/").rsplit("/", 1)
            handlers.append(
                grpc.method_handlers_generic_handler(
                    service, {method: make_handler(signal)}
                )
            )
        self._server = grpc.server(ThreadPoolExecutor(max_workers=max_workers))
        for h in handlers:
            self._server.add_generic_rpc_handlers((h,))
        self.port = self._server.add_insecure_port(f"{host}:{port}")
        self.host = host
        self._server.start()

    @property
    def received(self) -> int:
        return self.spool.received

    def rotate(self) -> list[str]:
        return self.spool.rotate()

    def close(self) -> None:
        self._server.stop(grace=5).wait()
        self.spool.close()

"""In-engine OTLP/HTTP listener (operator S1's network receiver
surface).

The reference collector ingests OTLP over gRPC :4317 / HTTP :4318
(config.yaml:1-7, builder-config.yaml:23-24).  This module provides the
HTTP half natively: a threaded listener accepting BOTH OTLP/HTTP
encodings — ``application/json`` and ``application/x-protobuf`` (the
stock receiver's default; decoded by the hand-rolled wire codec in
``otlp_proto.py``) — on the standard paths ``POST /v1/logs`` and
``POST /v1/traces``, spooling each export request as one JSONL line
(binary bodies are converted to the shared protobuf-JSON mapping at the
edge, so every downstream stage sees one canonical encoding).  Spool files rotate
at a record threshold, so the DRAIN unit is a completed file — exactly
the shard-file layout ``read_otlp_jsonl`` already consumes, which makes
the micro-batch pipeline:

    receiver.rotate() -> read_otlp_jsonl(completed files) ->
    symbolicate(...) / run_checkpointed(...)

a periodic loop with the same checkpoint/resume semantics as the batch
path (one spool file = one resumable ingest unit).

Scale notes: the listener is an EDGE process (one per ingest node), not
a Ray actor — its output is durable spool files on shared storage that
any number of Ray drain jobs consume.  Backpressure is the filesystem:
the receiver never holds more than one in-flight request body in
memory, and rotation bounds per-file replay cost.

The gRPC half (:4317) lives in ``otlp_grpc.py``: a native grpcio
server when grpcio is installed, plus gRPC-Web over THIS listener
(``application/grpc-web+proto`` on the two Export method paths — the
framing and proto decode are identical to native gRPC, only the HTTP
version differs), so the full encode surface is exercised even in
environments without grpcio.  All encodings share one spool
(``JsonlSpool``) and one canonical downstream representation, the
protobuf-JSON mapping of ``sources/otlp.py``.
"""

from __future__ import annotations

import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_OTLP_PATHS = {"/v1/logs", "/v1/traces"}
# 6+ digits: the %06d format WIDENS past 999999 rotations, and parsing
# must follow (a fixed 6-char slice would re-allocate live sequence
# numbers after a million files)
_SPOOL_RE = re.compile(r"ingest-(\d{6,})\.jsonl")
_OPEN_RE = re.compile(r"ingest-(\d{6,})\.jsonl\.open")
# serializes Dataset construction across drain threads (see drain_one)
_DS_BUILD_LOCK = threading.Lock()


class JsonlSpool:
    """Rotated JSONL spool shared by every receiver encoding (HTTP JSON,
    HTTP protobuf, gRPC-Web, native gRPC): one canonical-JSON line per
    export request, atomic ``.open`` -> ``.jsonl`` rotation so drains
    only ever see complete files, crash-safe sequence allocation."""

    def __init__(self, spool_dir: str, rotate_records: int = 10_000) -> None:
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.rotate_records = rotate_records
        self._lock = threading.Lock()
        self._recover_orphans()
        self._seq = self._next_seq()
        self._open_path: str | None = None
        self._open_file = None
        self._open_records = 0
        self.received = 0

    def _recover_orphans(self) -> None:
        """Seal ``.jsonl.open`` files left by a crashed receiver: their
        records were acked with 200, so they MUST become drainable —
        leaving them orphaned would silently lose acknowledged data."""
        for name in os.listdir(self.spool_dir):
            if _OPEN_RE.fullmatch(name):
                full = os.path.join(self.spool_dir, name)
                os.replace(full, full[: -len(".open")])

    def _next_seq(self) -> int:
        """Next unused sequence number — scans the live spool AND the
        ``drained/`` archive, so an archive+restart can never re-issue a
        committed sequence (which would make new data look
        already-drained and be skipped)."""
        existing = [-1]
        dirs = [self.spool_dir, os.path.join(self.spool_dir, "drained")]
        for d in dirs:
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                m = _SPOOL_RE.fullmatch(name) or _OPEN_RE.fullmatch(name)
                if m:
                    existing.append(int(m.group(1)))
        return max(existing) + 1

    def append(self, req: dict) -> None:
        line = json.dumps(req, sort_keys=True)
        with self._lock:
            if self._open_file is None:
                # O_EXCL ("x"): two receivers pointed at one spool dir
                # (misconfiguration, or deliberate shared storage) must
                # never truncate each other's open file — on collision
                # this one skips to the next free sequence
                while True:
                    path = os.path.join(
                        self.spool_dir, f"ingest-{self._seq:06d}.jsonl.open"
                    )
                    self._seq += 1
                    try:
                        self._open_file = open(path, "x")
                    except FileExistsError:
                        continue
                    self._open_path = path
                    break
                self._open_records = 0
            self._open_file.write(line + "\n")
            # flush per request: an acked record survives a crashed
            # receiver PROCESS (fsync still happens only at rotation —
            # the documented durability window is host, not process)
            self._open_file.flush()
            self._open_records += 1
            self.received += 1
            if self._open_records >= self.rotate_records:
                self._rotate_locked()

    def _rotate_locked(self) -> None:
        if self._open_file is None:
            return
        self._open_file.flush()
        os.fsync(self._open_file.fileno())
        self._open_file.close()
        final = self._open_path[: -len(".open")]
        os.replace(self._open_path, final)  # atomic: drains see complete files
        self._open_file = None
        self._open_path = None
        self._open_records = 0

    def rotate(self) -> list[str]:
        """Seal the open spool file (if any) and return ALL completed
        spool files — the drainable micro-batch."""
        with self._lock:
            self._rotate_locked()
        return self.completed_files()

    def completed_files(self) -> list[str]:
        return sorted(
            os.path.join(self.spool_dir, f)
            for f in os.listdir(self.spool_dir)
            if _SPOOL_RE.fullmatch(f)
        )

    def close(self) -> None:
        with self._lock:
            self._rotate_locked()


class _Server(ThreadingHTTPServer):
    # non-daemon handler threads + block_on_close: server_close() JOINS
    # in-flight requests, so close() can never race a handler appending
    # to a spool file that was just sealed
    daemon_threads = False
    block_on_close = True


class OTLPHttpReceiver:
    """Threaded OTLP/HTTP JSON listener spooling to rotated JSONL files.

    - ``port=0`` binds an ephemeral port (tests); ``.port`` reports it.
    - Valid export requests append one canonical-JSON line to the open
      spool file; after ``rotate_records`` lines the file rotates
      (atomic rename ``.open`` -> ``.jsonl``) so drains only ever see
      complete files.
    - Malformed payloads -> 400 with an error body in the request's
      encoding (JSON error object, or a protobuf ``google.rpc.Status``);
      unknown path -> 404 — matching OTLP/HTTP failure semantics (the
      reference receiver rejects undecodable payloads per request, not
      per connection).
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        rotate_records: int = 10_000,
    ) -> None:
        self.spool_dir = spool_dir
        self._spool = JsonlSpool(spool_dir, rotate_records)
        self._lock = self._spool._lock  # rejected counter shares the spool lock
        self.rejected = 0

        receiver = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # silence per-request stderr
                pass

            def _reply(self, status: int, ctype: str, payload: bytes) -> None:
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _grpc_web(self, body: bytes, ctype: str) -> None:
                """gRPC-Web Export on the native method paths: identical
                framing + proto decode to gRPC over HTTP/2; per the
                grpc-web spec, failures are HTTP 200 with a non-zero
                grpc-status trailer, never an HTTP error status."""
                from .otlp_grpc import (
                    GRPC_METHOD_SIGNALS,
                    grpc_web_response,
                    unframe_messages,
                )
                from .otlp_proto import ProtoDecodeError, decode_export_request

                signal = GRPC_METHOD_SIGNALS[self.path]
                try:
                    reqs = [
                        decode_export_request(msg, signal)
                        for msg in unframe_messages(body)
                    ]
                except ValueError as exc:  # framing or proto decode
                    with receiver._lock:
                        receiver.rejected += 1
                    self._reply(200, ctype, grpc_web_response(status=3,
                                                              message=str(exc)))
                    return
                for req in reqs:
                    receiver._append(req)
                self._reply(200, ctype, grpc_web_response())

            def do_POST(self):
                ctype = (self.headers.get("Content-Type") or "application/json").split(";")[0].strip()
                from .otlp_grpc import GRPC_METHOD_SIGNALS

                grpc_web = self.path in GRPC_METHOD_SIGNALS and ctype in (
                    "application/grpc-web+proto",
                    "application/grpc-web",
                )
                if self.path not in _OTLP_PATHS and not grpc_web:
                    self.send_response(404)
                    self.end_headers()
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                if grpc_web:
                    self._grpc_web(body, ctype)
                    return
                binary = ctype == "application/x-protobuf"
                try:
                    if binary:
                        from .otlp_proto import decode_export_request

                        signal = "logs" if self.path == "/v1/logs" else "traces"
                        req = decode_export_request(body, signal)
                    else:
                        req = json.loads(body)
                        if not isinstance(req, dict):
                            raise ValueError("export request must be a JSON object")
                except ValueError as exc:  # ProtoDecodeError is a ValueError
                    with receiver._lock:  # handler threads race; count under lock
                        receiver.rejected += 1
                    if binary:
                        # minimal google.rpc.Status: code=3 INVALID_ARGUMENT
                        from .otlp_proto import _write_len, _write_varint  # noqa: SLF001

                        out = bytearray()
                        _write_varint(out, (1 << 3) | 0)  # field 1 varint
                        _write_varint(out, 3)
                        _write_len(out, 2, str(exc).encode("utf-8"))
                        self._reply(400, "application/x-protobuf", bytes(out))
                    else:
                        payload = json.dumps({"error": str(exc)}).encode()
                        self._reply(400, "application/json", payload)
                    return
                receiver._append(req)
                if binary:
                    # empty ExportServiceResponse: zero-byte message
                    self._reply(200, "application/x-protobuf", b"")
                else:
                    self._reply(200, "application/json", b"{}")

        self._server = _Server((host, port), Handler)
        self.host = host
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    # ---- spooling (delegated to JsonlSpool) ----

    @property
    def received(self) -> int:
        return self._spool.received

    def _append(self, req: dict) -> None:
        self._spool.append(req)

    def rotate(self) -> list[str]:
        return self._spool.rotate()

    def completed_files(self) -> list[str]:
        return self._spool.completed_files()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
        self._spool.close()


def drain_to_dataset(receiver: OTLPHttpReceiver, *, skip_bad_lines: bool = False):
    """One micro-batch drain: seal the current spool and stream every
    completed spool file through the standard OTLP JSONL source — the
    result is the engine's canonical token-row Dataset, pipeable into
    symbolicate()/run_checkpointed() like any other source."""
    from .otlp import read_otlp_jsonl

    files = receiver.rotate()
    if not files:
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "tokens": pa.array([], type=pa.list_(pa.int32())),
                    "n_tok": pa.array([], type=pa.int32()),
                    "source": pa.array([], type=pa.string()),
                }
            )
        )
    return read_otlp_jsonl(files, skip_bad_lines=skip_bad_lines)


def drain_spool_checkpointed(
    spool_dir: str,
    output_dir: str,
    cfg,
    *,
    archive: bool = False,
    max_parallel_files: int = 4,
) -> dict:
    """Checkpointed micro-batch drain: every COMPLETED, not-yet-committed
    spool file is one shard whose id is its ingest sequence number, so
    the spool sequence IS the shard id space — re-drains are no-ops
    (committed files skip), and a crash mid-drain resumes exactly the
    unfinished files with the batch path's orphan cleanup.  Returns the
    drained shard ids plus cumulative per-sink totals from the
    manifests.

    ``archive=True`` moves each spool file into ``spool_dir/drained/``
    AFTER its manifest commit (move-after-commit: a crash between the
    two just re-skips the committed sid next drain).  For a long-running
    listener this bounds the spool directory listing — at ingest scale
    an unarchived spool would grow without bound.  The receiver's
    sequence allocator scans ``drained/`` too, so a restart can never
    re-issue an archived sequence; an archive-destination collision is
    therefore a loud error, never a silent overwrite."""
    from ..pipelines.symbolicate import (
        _accumulate_summary_row,
        _commit_shard,
        symbolicate_and_write,
    )
    from ..state.checkpoint import ShardManifest
    from .otlp import read_otlp_jsonl

    manifest = ShardManifest(output_dir)
    archive_dir = os.path.join(spool_dir, "drained")

    def archive_file(name: str, full: str) -> None:
        os.makedirs(archive_dir, exist_ok=True)
        dest = os.path.join(archive_dir, name)
        if os.path.exists(dest):
            raise RuntimeError(
                f"spool archive collision: {dest} already exists — a sequence "
                f"number was re-issued; refusing to overwrite drained data"
            )
        os.replace(full, dest)

    pending: list[tuple[int, str, str]] = []
    for name in sorted(os.listdir(spool_dir)):
        m = _SPOOL_RE.fullmatch(name)
        if not m:
            continue
        sid = int(m.group(1))
        full = os.path.join(spool_dir, name)
        if manifest.is_committed(sid):
            if archive:
                archive_file(name, full)
            continue
        pending.append((sid, name, full))

    def drain_one(sid: int, name: str, full: str) -> int:
        manifest.clean_orphan_outputs(sid)
        # Dataset CONSTRUCTION is serialized: read_binary_files resolves
        # filesystems eagerly, and concurrent first-imports of
        # fsspec.implementations.http race into a partially-initialized
        # module ("cannot import name HTTPFileSystem" — plain
        # ImportError, which Ray's ModuleNotFoundError guard misses, and
        # failed imports are never cached so every thread re-races).
        # Execution below still overlaps.
        with _DS_BUILD_LOCK:
            ds = read_otlp_jsonl([full])
        summaries = symbolicate_and_write(
            ds, cfg, output_dir, f"{sid:05d}"
        ).take_all()
        sinks: dict = {}
        outputs: list[str] = []
        for row in summaries:
            outputs.append(_accumulate_summary_row(sinks, row))
        _commit_shard(manifest, output_dir, sid, [full], sinks, outputs)
        if archive:
            archive_file(name, full)
        return sid

    # Overlapping per-file Dataset executions hides each file's actor-
    # pool ramp behind another's steady state — but concurrent
    # executions with FIXED-size actor pools can STARVE each other on a
    # small cluster (3 executions x 2-actor pools on 4 CPUs never all
    # schedule), so parallelism is capped by what the cluster can
    # actually run side by side: each execution needs its actor pool
    # minimum plus one CPU for its read tasks.
    import ray as _ray

    conc = cfg.concurrency
    pool_min = conc if isinstance(conc, int) else conc[0]
    cpus = int(_ray.cluster_resources().get("CPU", 1)) if _ray.is_initialized() else 1
    workers = max(1, min(max_parallel_files, cpus // (pool_min + 1)))

    drained: list[int] = []
    if len(pending) <= 1 or workers <= 1:
        for sid, name, full in pending:
            drained.append(drain_one(sid, name, full))
    else:
        # each sid's manifest/part files are independent — same
        # isolation as the batch path
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            drained = sorted(ex.map(lambda args: drain_one(*args), pending))
    return {"drained_shards": drained, "totals": manifest.aggregates()}


def compact_drained_spool(spool_dir: str, *, delete: bool = True) -> dict:
    """Compact ``spool_dir/drained/*.jsonl`` into one columnar parquet
    archive under ``spool_dir/archive/`` — the retention step after
    :func:`drain_spool_checkpointed(..., archive=True)`: a long-running
    listener otherwise accumulates one inode per drained micro-batch.

    Each archive row preserves the ORIGINAL spool path (the path the
    drain actually read, i.e. ``spool_dir/<name>``, not the drained/
    location) and line number, so :func:`read_archived_spool` replays
    byte-identical records under the exact doc_ids the original drain
    emitted (the audit/backfill contract).  The archive file is named
    ``archive-<minseq>-<maxseq>.parquet``; a name collision is a loud
    error (sequence numbers are never re-issued).  Written atomically
    (tmp + rename); sources are deleted only after the rename, so a
    crash mid-compact loses nothing.

    Scale: one compact call processes the CURRENT drained set in the
    sidecar process — spool shards are rotation-bounded (~tens of MB),
    so a periodic compact loop touches bounded data per pass; the
    archives themselves are plain parquet any Ray job can scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    drained_dir = os.path.join(spool_dir, "drained")
    if not os.path.isdir(drained_dir):
        return {"archived_files": 0, "archive": None}
    names = sorted(n for n in os.listdir(drained_dir) if _SPOOL_RE.fullmatch(n))
    if not names:
        return {"archived_files": 0, "archive": None}

    seqs, paths, linenos, lines = [], [], [], []
    for name in names:
        seq = int(_SPOOL_RE.fullmatch(name).group(1))
        original_path = os.path.join(spool_dir, name)
        with open(os.path.join(drained_dir, name), "r") as f:
            for lineno, line in enumerate(f.read().splitlines()):
                seqs.append(seq)
                paths.append(original_path)
                linenos.append(lineno)
                lines.append(line)
    lo, hi = min(seqs), max(seqs)
    archive_dir = os.path.join(spool_dir, "archive")
    os.makedirs(archive_dir, exist_ok=True)
    dest = os.path.join(archive_dir, f"archive-{lo:06d}-{hi:06d}.parquet")
    if os.path.exists(dest):
        raise RuntimeError(
            f"spool archive collision: {dest} exists — a sequence number "
            f"was re-issued; refusing to overwrite archived data"
        )
    tbl = pa.table(
        {
            "seq": pa.array(seqs, type=pa.int64()),
            "path": pa.array(paths, type=pa.string()),
            "lineno": pa.array(linenos, type=pa.int64()),
            "line": pa.array(lines, type=pa.string()),
        }
    )
    tmp = dest + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, dest)
    if delete:
        for name in names:
            os.remove(os.path.join(drained_dir, name))
    return {"archived_files": len(names), "archive": dest, "rows": len(lines)}


def read_archived_spool(paths, *, skip_bad_lines: bool = False):
    """Replay compacted spool archives as the canonical token-row
    Dataset.  Emits the SAME doc_ids as the original live drain —
    doc_id is a pure function of (original path, lineno, recno,
    content), all of which the archive preserves."""
    import pyarrow as pa

    import ray.data

    from .otlp import _numbered_lines_to_rows, _rows_table

    ds = ray.data.read_parquet(paths)

    def to_rows(batch: pa.Table) -> pa.Table:
        records: list[dict] = []
        doc_ids: list[str] = []
        dropped = 0
        # rows in a block may interleave paths; group per path so the
        # crc tag computes once per file
        by_path: dict[str, list[tuple[int, str]]] = {}
        for p, ln, line in zip(
            batch.column("path").to_pylist(),
            batch.column("lineno").to_pylist(),
            batch.column("line").to_pylist(),
        ):
            by_path.setdefault(p, []).append((ln, line))
        for p, numbered in by_path.items():
            dropped += _numbered_lines_to_rows(
                p, numbered, records, doc_ids, skip_bad_lines
            )
        if dropped:
            print(f"read_archived_spool: quarantined {dropped} malformed line(s)")
        return _rows_table(doc_ids, records)

    return ds.map_batches(to_rows, batch_format="pyarrow")

"""OTLP-JSON ingestion source (operator S1's receiver surface).

The reference consumes OTLP logs/traces from the collector's receivers
(sourcemapprocessor/processor.go ConsumeLogs/ConsumeTraces); this module
ingests the same payload shape — OTLP/JSON export requests, one per
line — and lands them as the engine's canonical token rows, so every
downstream pipeline (symbolication, per-sink routing, aggregates) is
source-agnostic.

Value encoding follows the OTLP protobuf-JSON mapping: ``stringValue`` /
``boolValue`` / ``intValue`` (string-encoded int64) / ``doubleValue`` /
``arrayValue``.  Logs map to ``resourceLogs[].scopeLogs[].logRecords[]``
(with ``eventName``); span records (the traces pipeline) map to
``resourceSpans[].scopeSpans[].spans[]`` with span ``events[]``.

Ray shape: ``ray.data.read_binary_files(include_paths=True)`` reads one
JSONL shard-file per task (per-file line numbers feed the unique doc_id
contract), a vectorized ``map_batches`` parses + converts + re-encodes
tokens per batch — the source scales with the shard-file count, the
same unit the checkpointed exporter writes.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

import ray.data

from ..codec import encode_batch_records


def _to_any_value(v: Any) -> dict:
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}  # protobuf JSON: int64 as string
    if isinstance(v, float):
        return {"doubleValue": v}
    if isinstance(v, str):
        return {"stringValue": v}
    if isinstance(v, list):
        return {"arrayValue": {"values": [_to_any_value(x) for x in v]}}
    raise TypeError(f"unsupported attribute value type: {type(v)!r}")


def _from_any_value(v: dict) -> Any:
    if "boolValue" in v:
        return bool(v["boolValue"])
    if "intValue" in v:
        return int(v["intValue"])
    if "doubleValue" in v:
        return float(v["doubleValue"])
    if "stringValue" in v:
        return v["stringValue"]
    if "arrayValue" in v:
        return [_from_any_value(x) for x in v["arrayValue"].get("values", [])]
    raise ValueError(f"unsupported OTLP value: {v!r}")


def _kv_list(attrs: dict) -> list[dict]:
    return [{"key": k, "value": _to_any_value(v)} for k, v in attrs.items()]


def _from_kv_list(kvs: list[dict]) -> dict:
    return {kv["key"]: _from_any_value(kv["value"]) for kv in kvs}


def record_to_otlp(record: dict) -> dict:
    """Engine record -> one OTLP/JSON export request."""
    resource = {"attributes": _kv_list(record.get("resource_attributes", {}))}
    if isinstance(record.get("events"), list):
        span = {
            "name": record.get("event_name", ""),
            "attributes": _kv_list(record.get("attributes", {})),
            "events": [
                {
                    "name": ev.get("name", ""),
                    "attributes": _kv_list(ev.get("attributes", {})),
                }
                for ev in record["events"]
            ],
        }
        return {
            "resourceSpans": [
                {"resource": resource, "scopeSpans": [{"spans": [span]}]}
            ]
        }
    log = {
        "eventName": record.get("event_name", ""),
        "attributes": _kv_list(record.get("attributes", {})),
    }
    return {"resourceLogs": [{"resource": resource, "scopeLogs": [{"logRecords": [log]}]}]}


def otlp_to_records(req: dict) -> list[dict]:
    """One OTLP/JSON export request -> engine records."""
    out: list[dict] = []
    for rl in req.get("resourceLogs", []):
        res_attrs = _from_kv_list(rl.get("resource", {}).get("attributes", []))
        for sl in rl.get("scopeLogs", []):
            for lr in sl.get("logRecords", []):
                out.append(
                    {
                        "event_name": lr.get("eventName", ""),
                        "attributes": _from_kv_list(lr.get("attributes", [])),
                        "resource_attributes": dict(res_attrs),
                    }
                )
    for rs in req.get("resourceSpans", []):
        res_attrs = _from_kv_list(rs.get("resource", {}).get("attributes", []))
        for ss in rs.get("scopeSpans", []):
            for span in ss.get("spans", []):
                out.append(
                    {
                        "event_name": span.get("name", ""),
                        "attributes": _from_kv_list(span.get("attributes", [])),
                        "resource_attributes": dict(res_attrs),
                        # span events keep the corpus's "name" key
                        "events": [
                            {
                                "name": ev.get("name", ""),
                                "attributes": _from_kv_list(ev.get("attributes", [])),
                            }
                            for ev in span.get("events", [])
                        ],
                    }
                )
    return out


def write_otlp_jsonl(corpus_dir: str, out_dir: str) -> int:
    """Convert a token parquet corpus to OTLP/JSONL (one export request
    per line) — the test/demo writer for the receiver surface."""
    import glob
    import os

    from ..codec import decode_batch_tokens

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    for path in files:
        import pyarrow.parquet as pq

        table = pq.read_table(path)
        records = decode_batch_tokens(table)
        name = os.path.basename(path).replace(".parquet", ".jsonl")
        with open(os.path.join(out_dir, name), "w") as f:
            for record in records:
                f.write(json.dumps(record_to_otlp(record), sort_keys=True) + "\n")
                n += 1
    return n


def read_otlp_jsonl(paths: str | list[str], *, skip_bad_lines: bool = False) -> "ray.data.Dataset":
    """Stream OTLP/JSONL export requests into the canonical token-row
    schema.  OTLP has no row ids, so doc_id is synthesized as
    ``otlp-<crc32(path)>-<lineno>-<recno>-<content crc32>`` — the
    (file, line, record) coordinate makes ids GLOBALLY unique and
    deterministic across runs even when two identical records arrive on
    different lines (the unique-doc_id contract downstream routing salt
    and joins rely on).  To get per-file line numbers each JSONL file is
    one read unit (``read_binary_files``, the exporter's shard = file
    layout), so parallelism is per shard-file — matching the
    checkpointed writer that produced them.  SIZE CONTRACT: each file
    is loaded whole into one read task, so inputs must be spool-sized
    shards (the rotating spool caps them at ~tens of MB); pointing this
    at a few multi-GB monolithic JSONL files will serialize the read
    and can OOM a worker — re-shard such files first (split -l) or use
    a line-splitting reader.

    Malformed lines fail the read task loudly by default;
    ``skip_bad_lines=True`` quarantines them instead (dropped with a
    count in the task log) — the dead-letter pattern for dirty feeds."""
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_rows(batch: pa.Table) -> pa.Table:
        records: list[dict] = []
        doc_ids: list[str] = []
        dropped = 0
        for path, blob in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            d = _numbered_lines_to_rows(
                path,
                enumerate(blob.decode("utf-8").splitlines()),
                records,
                doc_ids,
                skip_bad_lines,
            )
            dropped += d
        if dropped:
            print(f"read_otlp_jsonl: quarantined {dropped} malformed line(s)")
        return _rows_table(doc_ids, records)

    return ds.map_batches(to_rows, batch_format="pyarrow")


def _numbered_lines_to_rows(
    path: str,
    numbered_lines,
    records: list[dict],
    doc_ids: list[str],
    skip_bad_lines: bool,
) -> int:
    """Shared line->record expansion for the live JSONL reader and the
    compacted-archive replay path: doc_id depends only on (path,
    lineno, recno, content), so replay from an archive that preserves
    the ORIGINAL spool path and line numbers reproduces the exact ids
    the original drain emitted.  Appends into records/doc_ids; returns
    the number of quarantined lines."""
    import zlib

    ptag = zlib.crc32(path.encode())
    dropped = 0
    for lineno, line in numbered_lines:
        if not line.strip():
            continue
        try:
            req = json.loads(line)
        except ValueError:
            if skip_bad_lines:
                dropped += 1
                continue
            raise
        for recno, record in enumerate(otlp_to_records(req)):
            records.append(record)
            digest = zlib.crc32(json.dumps(record, sort_keys=True).encode())
            doc_ids.append(f"otlp-{ptag:08x}-{lineno}-{recno}-{digest:08x}")
    return dropped


def _rows_table(doc_ids: list[str], records: list[dict]) -> pa.Table:
    tokens, n_tok = encode_batch_records(records)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": pa.array(["otlp-jsonl"] * len(doc_ids), type=pa.string()),
        }
    )

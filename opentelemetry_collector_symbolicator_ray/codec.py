"""Bijective token codec (FIXTURES.md §1).

The driver's input contract (BASELINE.json input_hint) is a Parquet
table of pre-tokenized sequences ``(doc_id, tokens:list<int32>, n_tok,
source)``.  The payload inside ``tokens`` is a log record (event_name +
attribute maps, SURVEY.md §1.1) encoded as canonical JSON (sorted keys,
compact separators, UTF-8) with one int32 token per byte.  The codec is
deterministic and bijective, so per-``doc_id`` token-array equality is
exactly record equality.

Batch-level encode/decode is vectorized with numpy over the Arrow list
offsets/values buffers (zero-copy reads); only the JSON parse itself is
per row.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
import pyarrow as pa

try:  # fast path: orjson produces the same canonical compact encoding
    import orjson

    def _dumps(obj) -> bytes:
        return orjson.dumps(obj, option=orjson.OPT_SORT_KEYS)

    _loads = orjson.loads
except ImportError:  # pragma: no cover

    def _dumps(obj) -> bytes:
        return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False).encode(
            "utf-8"
        )

    _loads = json.loads


def encode_record(record: dict[str, Any]) -> list[int]:
    return list(_dumps(record))


def decode_record(tokens) -> dict[str, Any]:
    data = bytes(bytearray(int(t) & 0xFF for t in tokens))
    return _loads(data)


def _list_buffers(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, bytes]:
    """Return (offsets, payload bytes) for a list<int32> column."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy()
    # int32 -> uint8 downcast in the Arrow C++ kernel (much faster than
    # numpy astype on a Python-owned copy).
    values = pc.cast(col.values, pa.uint8(), safe=False).to_numpy(zero_copy_only=False)
    return offsets, values.tobytes()


def decode_batch_tokens(batch: pa.Table, column: str = "tokens") -> list[dict[str, Any]]:
    """Decode every row's token payload into a record dict."""
    col = batch.column(column)
    offsets, data = _list_buffers(col)
    loads = _loads
    return [loads(data[offsets[i]: offsets[i + 1]]) for i in range(len(offsets) - 1)]


def encode_batch_records(records: list[dict[str, Any]]) -> tuple[pa.ListArray, pa.Int32Array]:
    """Encode records into (tokens list<int32> array, n_tok int32 array)."""
    return encode_batch_payloads([_dumps(r) for r in records])


def encode_batch_payloads(payloads: list[bytes]) -> tuple[pa.ListArray, pa.Int32Array]:
    """Build (tokens, n_tok) arrays from pre-encoded canonical payloads."""
    lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    offsets = np.zeros(len(payloads) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    data = b"".join(payloads)
    import pyarrow.compute as pc

    values_u8 = pa.array(np.frombuffer(data, dtype=np.uint8))
    values = pc.cast(values_u8, pa.int32())
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)
    n_tok = pa.array(lengths.astype(np.int32), type=pa.int32())
    return tokens, n_tok

"""End-to-end training-mix export — the capstone composition of the
training-data operators: quality gate -> exact dedup -> per-language
weighted sampling -> hash-shard assignment -> partitioned parquet write
-> shard manifest.  Every gate is content-keyed (md5 of the text), so
shard membership is deterministic under any partitioning / ordering /
resume, and a re-run reproduces the same export byte-for-byte.

Scale notes (100 TB): one streaming pass applies quality + sampling +
shard assignment per batch (pure Arrow/py-hash, no shuffle); exact dedup
is the single all-to-all (digest groupby, min doc_id survives); the
write is hive-partitioned by shard so a failed export resumes per shard
and downstream loaders read shards independently."""

from __future__ import annotations

import hashlib
import shutil

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .text import DEFAULT_LANG_MIX


def export_training_shards(
    sf_dir: str,
    out_dir: str,
    num_shards: int = 8,
    min_words: int = 20,
    min_avg: float = 4.3,
    max_avg: float = 5.0,
    rates: dict[str, str] | None = None,
) -> pa.Table:
    """Run the export and return the shard manifest (shard, n_docs,
    n_tokens) computed FROM THE WRITTEN FILES — the manifest proves the
    parquet landing, not just the in-flight dataset."""
    rates = DEFAULT_LANG_MIX if rates is None else rates

    def gate(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        words = pc.split_pattern(text, " ")
        n_words = pc.cast(pc.list_value_length(words), pa.int64())
        n_alpha = pc.utf8_length(pc.replace_substring(text, " ", ""))
        avg = pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(n_words, pa.float64()))
        quality = pc.and_(
            pc.greater_equal(n_words, pa.scalar(min_words, type=pa.int64())),
            pc.and_(
                pc.greater_equal(avg, pa.scalar(min_avg)),
                pc.less_equal(avg, pa.scalar(max_avg)),
            ),
        ).to_pylist()
        langs = batch.column("lang").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        nw = n_words.to_pylist()
        out = {"doc_id": [], "digest": [], "lang": [], "n_words": [], "shard": []}
        for i, t in enumerate(text.to_pylist()):
            if not quality[i]:
                continue
            hx = hashlib.md5(t.encode()).hexdigest()
            if hx[:2] >= rates.get(langs[i], "00"):
                continue
            out["doc_id"].append(ids[i])
            out["digest"].append(hx)
            out["lang"].append(langs[i])
            out["n_words"].append(nw[i])
            out["shard"].append(int(hx[:2], 16) % num_shards)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "digest": pa.array(out["digest"], type=pa.string()),
                "lang": pa.array(out["lang"], type=pa.string()),
                "n_words": pa.array(out["n_words"], type=pa.int64()),
                "shard": pa.array(out["shard"], type=pa.int64()),
            }
        )

    def keep_min(group: pa.Table) -> pa.Table:
        i = pc.index(group.column("doc_id"), pc.min(group.column("doc_id"))).as_py()
        return group.slice(i, 1)

    shutil.rmtree(out_dir, ignore_errors=True)
    (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        .map_batches(gate, batch_format="pyarrow")
        .groupby("digest")
        .map_groups(keep_min, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["shard"])
    )

    # manifest from the landed files (metadata columns only)
    from ray.data.aggregate import Count, Sum

    manifest = (
        ray.data.read_parquet(out_dir)
        .groupby("shard")
        .aggregate(Count(alias_name="n_docs"), Sum("n_words", alias_name="n_tokens"))
    )
    rows = sorted(manifest.take_all(), key=lambda r: int(r["shard"]))
    return pa.table(
        {
            "shard": pa.array([int(r["shard"]) for r in rows], type=pa.int64()),
            "n_docs": pa.array([int(r["n_docs"]) for r in rows], type=pa.int64()),
            "n_tokens": pa.array([int(r["n_tokens"]) for r in rows], type=pa.int64()),
        }
    )

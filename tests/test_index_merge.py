"""Incremental inverted-index maintenance: folding a delta corpus into
an existing index must be bit-identical to a from-scratch rebuild over
the combined corpus, while touching only the delta's word buckets."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _postings_table(index_dir: str) -> pa.Table:
    """All postings rows of an index, sorted by word, partition col
    dropped (it is re-derivable from the word hash)."""
    files = sorted(
        f"{index_dir}/{d}/{f}"
        for d in os.listdir(index_dir)
        if d.startswith("bucket=")
        for f in os.listdir(f"{index_dir}/{d}")
    )
    t = pa.concat_tables([pq.read_table(f) for f in files])
    order = pa.compute.sort_indices(t.column("word"))
    return t.take(order).select(["word", "df", "postings", "tfs", "dls", "poss"])


def test_delta_merge_equals_full_rebuild(ray_session, tmp_path):
    from opentelemetry_collector_symbolicator_ray.pipelines.text import (
        build_inverted_index,
        merge_index_delta,
    )

    sf = "/root/testdata/sf0.001"
    base_docs = pq.read_table(f"{sf}/documents.parquet")

    # delta: new doc_ids, a narrow vocabulary (so most buckets stay
    # untouched) + one brand-new word the base corpus cannot contain
    delta_texts = [
        "merge sort stream zzznewword merge",
        "sort sort stream",
        "zzznewword alone",
    ]
    delta = pa.table(
        {
            "doc_id": pa.array([100001, 100002, 100003], type=pa.int64()),
            "text": pa.array(delta_texts, type=pa.string()),
            "lang": pa.array(["en"] * 3, type=pa.string()),
            "source": pa.array(["delta"] * 3, type=pa.string()),
            "n_chars": pa.array([len(t) for t in delta_texts], type=pa.int64()),
        }
    )
    delta_dir = tmp_path / "delta"
    delta_dir.mkdir()
    pq.write_table(delta, str(delta_dir / "documents.parquet"))

    combined_dir = tmp_path / "combined"
    combined_dir.mkdir()
    pq.write_table(
        pa.concat_tables([base_docs.select(delta.column_names), delta]),
        str(combined_dir / "documents.parquet"),
    )

    base_idx = str(tmp_path / "idx_base")
    merged_idx = str(tmp_path / "idx_merged")
    rebuilt_idx = str(tmp_path / "idx_rebuilt")
    build_inverted_index(sf, base_idx)
    info = merge_index_delta(base_idx, str(delta_dir), merged_idx)
    build_inverted_index(str(combined_dir), rebuilt_idx)

    # delta touched only its own words' buckets
    n_buckets = sum(1 for d in os.listdir(base_idx) if d.startswith("bucket="))
    assert 0 < len(info["affected_buckets"]) < n_buckets

    got, want = _postings_table(merged_idx), _postings_table(rebuilt_idx)
    assert got.num_rows == want.num_rows
    assert got.equals(want)

    s_got = pq.read_table(f"{merged_idx}/_corpus_stats.parquet")
    s_want = pq.read_table(f"{rebuilt_idx}/_corpus_stats.parquet")
    assert s_got.equals(s_want)

    # untouched buckets were linked, not rebuilt: same inode as base
    untouched = next(
        d
        for d in sorted(os.listdir(base_idx))
        if d.startswith("bucket=")
        and int(d.split("=", 1)[1]) not in set(info["affected_buckets"])
    )
    f = sorted(os.listdir(f"{base_idx}/{untouched}"))[0]
    assert os.path.samefile(f"{base_idx}/{untouched}/{f}", f"{merged_idx}/{untouched}/{f}")

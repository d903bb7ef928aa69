"""Property-based round-trip tests (hypothesis): the token codec and
the OTLP/JSON value mapping must be identities over the full attribute
value space the engine carries (strings incl. unicode, bools, int64s,
floats, flat lists)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_symbolicator_ray.codec import decode_record, encode_record
from opentelemetry_collector_symbolicator_ray.sources.otlp import (
    otlp_to_records,
    record_to_otlp,
)

# finite floats only: NaN breaks equality; infinities are not JSON.
scalar = st.one_of(
    st.text(max_size=40),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)
value = st.one_of(scalar, st.lists(scalar, max_size=6))
attrs = st.dictionaries(st.text(min_size=1, max_size=30), value, max_size=8)

log_record = st.fixed_dictionaries(
    {"event_name": st.text(max_size=20), "attributes": attrs, "resource_attributes": attrs}
)
span_record = st.fixed_dictionaries(
    {
        "event_name": st.text(max_size=20),
        "attributes": attrs,
        "resource_attributes": attrs,
        "events": st.lists(
            st.fixed_dictionaries({"name": st.text(max_size=20), "attributes": attrs}),
            max_size=3,
        ),
    }
)


@settings(max_examples=200, deadline=None)
@given(record=st.one_of(log_record, span_record))
def test_codec_roundtrip(record):
    assert decode_record(encode_record(record)) == record


@settings(max_examples=200, deadline=None)
@given(record=st.one_of(log_record, span_record))
def test_otlp_roundtrip(record):
    assert otlp_to_records(record_to_otlp(record)) == [record]


def test_chunking_reconstructs_documents(ray_session, tmp_path):
    """Non-overlapping chunks (stride == window) concatenate back to the
    original word sequence — chunking loses nothing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines import text as t

    rng = np.random.RandomState(11)
    docs = [
        " ".join(f"w{rng.randint(0, 50)}" for _ in range(int(n)))
        for n in rng.randint(1, 120, size=40)
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array([len(x) for x in docs], type=pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    import hashlib

    chunks = t.chunk_documents(str(d), window=16, stride=16).to_pandas()
    for doc_id, doc in enumerate(docs):
        ws = doc.split(" ")
        rows = chunks[chunks.doc_id == doc_id].sort_values("chunk_id")
        rebuilt_words = int(rows.n_words.sum())
        assert rebuilt_words == len(ws)
        # digests must match the reference slicing
        for _, r in rows.iterrows():
            lo = int(r.chunk_id) * 16
            expect = hashlib.md5(" ".join(ws[lo: lo + 16]).encode()).hexdigest()
            assert r.chunk_md5 == expect


def test_heavy_hitters_randomized_zipf(ray_session, tmp_path):
    """Zipf-distributed random corpora: the sketch path (forced
    truncation) must equal the exact path for every seed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines import text as t

    for seed in (3, 17):
        rng = np.random.RandomState(seed)
        words = [f"w{min(int(x), 400)}" for x in rng.zipf(1.3, size=12000)]
        docs = [" ".join(words[i: i + 60]) for i in range(0, len(words), 60)]
        d = tmp_path / f"z{seed}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs, type=pa.string()),
                    "lang": pa.array(["en"] * len(docs)),
                    "source": pa.array(["s"] * len(docs)),
                    "n_chars": pa.array([len(x) for x in docs], type=pa.int64()),
                }
            ),
            d / "documents.parquet",
        )
        exact = t._exact_top_words(str(d), 12)
        sketched = t.heavy_hitter_words(str(d), k=12, capacity=64)
        assert sketched.equals(exact), seed


def test_quantiles_randomized_vs_numpy(ray_session, tmp_path):
    """Random lognormal + integer-heavy mixtures across seeds: selection
    equals numpy's linear interpolation exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines import streaming

    for seed in (5, 23):
        rng = np.random.RandomState(seed)
        vals = np.concatenate(
            [rng.lognormal(3, 2, 4000), rng.randint(0, 20, 4000).astype(np.float64)]
        )
        rng.shuffle(vals)
        d = tmp_path / f"q{seed}"
        d.mkdir()
        pq.write_table(
            pa.table({"value": pa.array(vals, type=pa.float64())}), d / "events.parquet"
        )
        qs = (0.25, 0.5, 0.75, 0.95)
        t = streaming.global_value_quantiles(str(d), qs=qs, bins=16, tail_limit=32)
        got = dict(zip(t.column("q").to_pylist(), t.column("value").to_pylist()))
        for q in qs:
            assert got[f"p{int(round(q * 100))}"] == float(np.quantile(vals, q)), (seed, q)

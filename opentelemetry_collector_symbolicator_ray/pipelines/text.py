"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline counterparts of the engine (language-ID, quality
scoring, token counting, fingerprinting).  All are vectorized
``map_batches`` stages over zero-copy Arrow batches; column pruning at
the read keeps only what each operator needs.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# BPE-ish token regex shared verbatim with the SQL oracle (RE2-safe).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language ID (deterministic; no external models).
_LANG_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "value", "data"},
    "es": {"el", "la", "de", "y", "en", "es", "los", "una"},
    "fr": {"le", "la", "de", "et", "en", "est", "les", "une"},
    "de": {"der", "die", "das", "und", "in", "ist", "ein", "nicht"},
    "zh": {"de", "shi", "le", "zai", "he", "you"},
}


def _read_documents(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_counts(sf_dir: str) -> "ray.data.Dataset":
    """doc_id, n_words (single-space split), n_tokens (BPE-ish regex).
    Oracle: SQL in __ray_entry__.oracle_sql()["docs_token_counts"]."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = pc.list_value_length(pc.split_pattern(text, " "))
        n_tokens = pa.array(
            [len(_TOKEN_RE.findall(t)) for t in text.to_pylist()], type=pa.int64()
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pc.cast(n_words, pa.int64()),
                "n_tokens": n_tokens,
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    """Length/word-shape quality metrics per document, all derived with
    Arrow kernels; matches the SQL oracle formula exactly (integer inputs
    -> IEEE doubles)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text)
        words = pc.split_pattern(text, " ")
        n_words = pc.list_value_length(words)
        no_space = pc.replace_substring(text, " ", "")
        n_alpha = pc.utf8_length(no_space)
        avg_word_len = pc.divide(
            pc.cast(n_alpha, pa.float64()), pc.cast(n_words, pa.float64())
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_words": pc.cast(n_words, pa.int64()),
                "avg_word_len": avg_word_len,
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (SQL-oracle-expressible canonical fingerprint)."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(re.sub(r"\s+", " ", t.lower()).encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps, type=pa.string())}
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def _char_ngrams(text: str, n: int = 3) -> set[str]:
    padded = f" {text} "
    return {padded[i: i + n] for i in range(max(1, len(padded) - n + 1))}


def language_id(sf_dir: str) -> "ray.data.Dataset":
    """Character-n-gram + stopword language ID (deterministic heuristic,
    SQL-oracle-exact: the DuckDB oracle replays the same trigram-set
    Jaccard with list_intersect/list_distinct over inlined profile
    literals, ROW_NUMBER tie-breaking = the strictly-greater update
    rule).  Per language, a trigram profile is derived from its stopword
    list; documents score by Jaccard overlap of their trigram set with
    each profile, with whole-word stopword hits as a tie-dominant
    signal.  trigram_score is the raw IEEE division (int/int), so engine
    and oracle are bit-identical."""

    word_profiles = {lang: frozenset(words) for lang, words in _LANG_PROFILES.items()}
    trigram_profiles = {
        lang: frozenset().union(*(_char_ngrams(w) for w in words))
        for lang, words in _LANG_PROFILES.items()
    }
    langs = sorted(word_profiles)

    def fn(batch: pa.Table) -> pa.Table:
        preds, word_scores, tri_scores = [], [], []
        for t in batch.column("text").to_pylist():
            lower = t.lower()
            words = set(lower.split())
            trigrams = _char_ngrams(lower)
            best_lang, best_key = "und", (0, 0.0)
            best_tri = 0.0
            for lang in langs:
                hits = len(words & word_profiles[lang])
                overlap = len(trigrams & trigram_profiles[lang])
                union = len(trigrams | trigram_profiles[lang])
                tri = overlap / union if union else 0.0
                if (hits, tri) > best_key:
                    best_key = (hits, tri)
                    best_lang = lang
                    best_tri = tri
            preds.append(best_lang if best_key > (0, 0.0) else "und")
            word_scores.append(best_key[0])
            tri_scores.append(best_tri)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "predicted_lang": pa.array(preds, type=pa.string()),
                "stopword_hits": pa.array(word_scores, type=pa.int64()),
                "trigram_score": pa.array(tri_scores, type=pa.float64()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def rolling_hash_fingerprints(sf_dir: str, window: int = 16) -> "ray.data.Dataset":
    """Winnowing-style rolling fingerprint: the lexicographic-min md5
    hex digest over stride-4 byte windows (documents are ASCII, so byte
    windows == character windows and the whole operator is
    SQL-checkable: ``min(md5(substr(text, i, 16)))`` over
    ``generate_series``).  Hex min == numeric min of the 128-bit digest
    (fixed-width lowercase hex), so the winnowing semantics are
    unchanged from the crc32 version — just on a checkable hash."""

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            data = t.encode()
            if len(data) <= window:
                out.append(hashlib.md5(data).hexdigest())
                continue
            out.append(
                min(
                    hashlib.md5(data[i: i + window]).hexdigest()
                    for i in range(0, len(data) - window + 1, 4)
                )
            )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "rolling_fp": pa.array(out, type=pa.string())}
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def hash_sample(sf_dir: str, threshold_hex: str = "33") -> "ray.data.Dataset":
    """Deterministic content-hash sampling (the reproducible-subset
    primitive of a training-data pipeline): keep documents whose
    md5(text) hex digest starts below ``threshold_hex`` ("33" ~ 51/256 ~
    20%).  Content-keyed (not row-keyed), so the sample is stable across
    re-partitioning, re-ordering and resumption — and SQL-checkable."""

    def fn(batch: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5(t.encode()).hexdigest()[:2] < threshold_hex
            for t in batch.column("text").to_pylist()
        ]
        return batch.filter(pa.array(keep, type=pa.bool_())).select(["doc_id"])

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def quality_filter(
    sf_dir: str, min_words: int = 20, min_avg: float = 4.3, max_avg: float = 5.0
) -> "ray.data.Dataset":
    """Quality-gate filter (the doc-selection stage downstream of
    quality_scores): keep documents with >= ``min_words`` words and an
    average word length inside [min_avg, max_avg].  Pure Arrow kernels;
    formula shared verbatim with the SQL oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        words = pc.split_pattern(text, " ")
        n_words = pc.cast(pc.list_value_length(words), pa.int64())
        n_alpha = pc.utf8_length(pc.replace_substring(text, " ", ""))
        avg = pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(n_words, pa.float64()))
        keep = pc.and_(
            pc.greater_equal(n_words, pa.scalar(min_words, type=pa.int64())),
            pc.and_(
                pc.greater_equal(avg, pa.scalar(min_avg)),
                pc.less_equal(avg, pa.scalar(max_avg)),
            ),
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_words": n_words}
        ).filter(keep)

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def top_ngrams(sf_dir: str, n: int = 2, k: int = 50) -> pa.Table:
    """Corpus-level top-k word n-grams — the canonical map-side-combine
    wide aggregate: per-batch Counter partials (so the shuffle moves one
    row per distinct n-gram per block, not one per occurrence) ->
    groupby(ngram).sum -> deterministic global top-k by (count desc,
    ngram asc)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            ws = t.split(" ")
            for i in range(len(ws) - n + 1):
                c[" ".join(ws[i: i + n])] += 1
        return pa.table(
            {
                "ngram": pa.array(list(c.keys()), type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    agg = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    top = agg.sort(["cnt", "ngram"], descending=[True, False]).limit(k).take_all()
    return pa.table(
        {
            "ngram": pa.array([r["ngram"] for r in top], type=pa.string()),
            "cnt": pa.array([int(r["cnt"]) for r in top], type=pa.int64()),
        }
    )


def doc_frequency(sf_dir: str, k: int = 100) -> pa.Table:
    """Document frequency (the DF half of TF-IDF): per-batch partial DF
    over distinct words per doc -> groupby(word).sum -> top-k by
    (df desc, word asc)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            for w in set(t.split(" ")):
                c[w] += 1
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "df": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    agg = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df", alias_name="df"))
    )
    top = agg.sort(["df", "word"], descending=[True, False]).limit(k).take_all()
    return pa.table(
        {
            "word": pa.array([r["word"] for r in top], type=pa.string()),
            "df": pa.array([int(r["df"]) for r in top], type=pa.int64()),
        }
    )


def tfidf_top_term(
    sf_dir: str,
    mode: str = "auto",
    vocab_threshold: int = 500_000,
    join_partitions: int = 16,
) -> "ray.data.Dataset":
    """Per-document top TF-IDF term, scale-adaptive:

    - ``broadcast`` (small vocab): the document-frequency table
      (vocab-sized, << corpus) is computed with a distributed groupby,
      ray.put ONCE, and read inside every scoring task;
    - ``join`` (web-scale vocab — a DF dict would be tens of GB on the
      driver): explode docs to (doc_id, word, tf) rows, hash-join them
      against the distributed DF table on ``word`` (``Dataset.join``),
      then a per-doc ``groupby("doc_id").map_groups`` argmax — the
      vocabulary never materializes anywhere;
    - ``auto`` picks by the measured distinct-word count vs
      ``vocab_threshold``.

    Both paths share the exact ranking (round(tf * ln(N/df), 9) desc,
    word asc) verbatim with the SQL oracle and return a streamed
    Dataset (doc_id, top_term) sorted by doc_id — the corpus-sized
    result never becomes a driver table."""
    from collections import Counter

    from ray.data.aggregate import Sum

    import ray

    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            for w in set(t.split(" ")):
                c[w] += 1
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "df": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    docs = _read_documents(sf_dir, ["doc_id", "text"])
    n_docs = float(docs.count())
    df_ds = (
        _read_documents(sf_dir, ["text"])
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df", alias_name="df"))
    )

    if mode == "auto":
        # materialize the (vocab-sized, distributed) DF table once so
        # counting it and consuming it don't re-run the aggregate
        df_ds = df_ds.materialize()
        mode = "broadcast" if df_ds.count() <= vocab_threshold else "join"

    if mode == "broadcast":
        df = {r["word"]: int(r["df"]) for r in df_ds.take_all()}
        df_ref = ray.put(df)

        def score(batch: pa.Table) -> pa.Table:
            dfm = ray.get(df_ref)
            ids, tops = [], []
            for doc_id, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                tf = Counter(t.split(" "))
                words = sorted(tf)  # asc word = deterministic tie-break
                scores = np.round(
                    np.array([tf[w] for w in words], dtype=np.float64)
                    * np.log(n_docs / np.array([dfm[w] for w in words], dtype=np.float64)),
                    9,
                )
                ids.append(doc_id)
                tops.append(words[int(np.argmax(scores))])  # argmax keeps FIRST max
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "top_term": pa.array(tops, type=pa.string()),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")

    if mode != "join":
        raise ValueError(f"tfidf_top_term: unknown mode {mode!r}")

    def explode(batch: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for w, c in Counter(t.split(" ")).items():
                ids.append(doc_id)
                words.append(w)
                tfs.append(c)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "word": pa.array(words, type=pa.string()),
                "tf": pa.array(tfs, type=pa.int64()),
            }
        )

    from ._join import safe_join

    tf_rows = docs.map_batches(explode, batch_format="pyarrow")
    joined = safe_join(
        tf_rows, df_ds, join_type="inner",
        num_partitions=join_partitions, on=("word",),
    )

    def pick_top(group: pa.Table) -> pa.Table:
        words = np.array(group.column("word").to_pylist(), dtype=object)
        order = np.argsort(words, kind="stable")  # word asc = tie-break
        words = words[order]
        tf = group.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)[order]
        df = group.column("df").to_numpy(zero_copy_only=False).astype(np.float64)[order]
        scores = np.round(tf * np.log(n_docs / df), 9)
        best = int(np.argmax(scores))  # FIRST max, same as broadcast path
        return pa.table(
            {
                "doc_id": pa.array([group.column("doc_id")[0].as_py()], type=pa.int64()),
                "top_term": pa.array([str(words[best])], type=pa.string()),
            }
        )

    return (
        joined.groupby("doc_id")
        .map_groups(pick_top, batch_format="pyarrow")
        .sort("doc_id")
    )


def document_profile(sf_dir: str) -> "ray.data.Dataset":
    """Fused single-pass profile: token counts + quality metrics +
    fingerprint computed in ONE ``map_batches`` over ONE read — the
    operator-fusion pattern for 100 TB (four separate ops would scan the
    corpus four times; chained profiles scan once).  Kernels shared
    verbatim with token_counts / quality_scores / fingerprints, so the
    SQL oracle is their column union."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        words = pc.split_pattern(text, " ")
        n_words = pc.cast(pc.list_value_length(words), pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_alpha = pc.utf8_length(pc.replace_substring(text, " ", ""))
        avg_word_len = pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(n_words, pa.float64()))
        n_tokens = [len(_TOKEN_RE.findall(t)) for t in text.to_pylist()]
        fps = [
            hashlib.md5(re.sub(r"\s+", " ", t.lower()).encode()).hexdigest()
            for t in text.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": n_words,
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "n_chars": n_chars,
                "avg_word_len": avg_word_len,
                "fingerprint": pa.array(fps, type=pa.string()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def distinct_word_counts(sf_dir: str) -> "ray.data.Dataset":
    """Per-document distinct-word count (the vocabulary-size profile —
    integer-exact, SQL-oracle-checkable): one streaming map_batches over
    the pruned (doc_id, text) read."""

    def fn(batch: pa.Table) -> pa.Table:
        counts = [len(set(t.split(" "))) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_distinct": pa.array(counts, type=pa.int64()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def approx_distinct_words(sf_dir: str, p: int = 12) -> pa.Table:
    """Corpus-wide approximate distinct-word count via a distributed
    HyperLogLog sketch — the mergeable-sketch pattern for cardinality at
    100 TB: every batch builds a LOCAL register array (2^p bytes), the
    shuffle moves one tiny blob per block (never the words), and the
    driver folds blobs with an elementwise max.  Standard HLL estimator
    with the small-range (linear counting) correction; expected relative
    error ~1.04/sqrt(2^p) (~1.6% at p=12).  SQL-replayable: words hash
    via the shared md5-lower-64 convention (= DuckDB
    ``md5_number_lower``), registers are a per-idx MAX the oracle
    reproduces with a GROUP BY, and the estimator carries its harmonic
    sum as an exact integer (see ``analytics._hll_estimate``), so the
    oracle hash-compares the estimate itself; the pytest gate
    additionally asserts the sketch lands within the error bound of the
    exact `doc_frequency` count."""
    from .analytics import _hll_estimate
    from .dedup import _md5_lower64

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        words = set()
        for t in batch.column("text").to_pylist():
            words.update(t.split(" "))
        if words:
            hashes = np.array([_md5_lower64(w) for w in words], dtype=np.uint64)
            idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
            rest = hashes << np.uint64(p)  # top (64-p) bits left-aligned
            # rank = leading zeros of rest + 1 (capped at 64-p+1)
            ranks = np.full(len(hashes), 64 - p + 1, dtype=np.uint8)
            nz = rest != 0
            # leading zeros via float64 exponent trick is lossy; use bit length
            bl = np.zeros(len(hashes), dtype=np.int64)
            bl[nz] = np.frompyfunc(int.bit_length, 1, 1)(rest[nz]).astype(np.int64)
            ranks[nz] = (64 - bl[nz] + 1).astype(np.uint8)
            np.maximum.at(regs, idx, ranks)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    blobs = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    regs = np.zeros(m, dtype=np.uint8)
    for row in blobs:
        regs = np.maximum(regs, np.frombuffer(row["regs"], dtype=np.uint8))

    return pa.table(
        {
            "approx_distinct": pa.array([_hll_estimate(regs, m)], type=pa.int64()),
            "registers": pa.array([m], type=pa.int64()),
        }
    )


def eval_contamination(
    sf_dir: str, eval_max_doc_id: int = 20, n: int = 3, min_shared: int = 1
) -> "ray.data.Dataset":
    """Benchmark-decontamination check — a first-class op of any
    training-data pipeline: flag training documents sharing >=
    ``min_shared`` distinct word n-grams with the EVAL set (here: docs
    with doc_id < ``eval_max_doc_id``, standing in for a held-out
    benchmark).  Ray shape: the eval n-gram set (small side) is built
    with a pushdown read, ray.put ONCE, and each training batch counts
    overlaps against the broadcast set — the corpus never joins or
    shuffles.  Returns (doc_id, shared_ngrams) for flagged docs, sorted;
    integer-exact vs the SQL oracle."""
    import pyarrow.dataset as pads

    import ray

    def doc_ngrams(text: str) -> set[str]:
        ws = text.split(" ")
        return {" ".join(ws[i: i + n]) for i in range(len(ws) - n + 1)}

    eval_rows = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["text"],
        filter=pads.field("doc_id") < eval_max_doc_id,
    ).take_all()
    eval_ngrams = frozenset().union(*(doc_ngrams(r["text"]) for r in eval_rows)) if eval_rows else frozenset()
    eval_ref = ray.put(eval_ngrams)

    def flag(batch: pa.Table) -> pa.Table:
        ev = ray.get(eval_ref)
        ids, shared = [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if doc_id < eval_max_doc_id:
                continue  # eval docs are not their own contamination
            k = len(doc_ngrams(t) & ev)
            if k >= min_shared:
                ids.append(doc_id)
                shared.append(k)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shared_ngrams": pa.array(shared, type=pa.int64()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(flag, batch_format="pyarrow").sort("doc_id")


# PII patterns shared VERBATIM with the SQL oracle (RE2-safe, re.ASCII
# \b semantics match DuckDB's RE2 on this corpus's ASCII text).
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\+?[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}"
_PII_EMAIL_RE = re.compile(PII_EMAIL_PATTERN, re.ASCII)
_PII_PHONE_RE = re.compile(PII_PHONE_PATTERN, re.ASCII)


def pii_redact(sf_dir: str) -> "ray.data.Dataset":
    """PII scrubbing — the cleaning stage every web-scale text pipeline
    runs before training: emails and phone-shaped numbers are replaced
    with typed placeholders, with per-document match counts for audit.
    Pure streaming map_batches with compiled regexes; the redacted text
    and counts are string/integer-exact vs the SQL oracle (same
    patterns via regexp_replace / regexp_extract_all)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        reds, n_emails, n_phones = [], [], []
        for t in batch.column("text").to_pylist():
            ne = len(_PII_EMAIL_RE.findall(t))
            red = _PII_EMAIL_RE.sub("<EMAIL>", t)
            npn = len(_PII_PHONE_RE.findall(red))
            red = _PII_PHONE_RE.sub("<PHONE>", red)
            reds.append(red)
            n_emails.append(ne)
            n_phones.append(npn)
        return pa.table(
            {
                "doc_id": ids,
                "redacted": pa.array(reds, type=pa.string()),
                "n_emails": pa.array(n_emails, type=pa.int64()),
                "n_phones": pa.array(n_phones, type=pa.int64()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def repetition_scores(sf_dir: str, n: int = 2) -> "ray.data.Dataset":
    """Gopher-style repetition quality rule: the fraction of a
    document's word n-grams taken by its single most frequent n-gram
    (scaled to integer parts-per-million for hash-exact oracle
    comparison).  High values mark degenerate/boilerplate docs that a
    training pipeline drops.  One streaming pass, Counter per doc."""
    from collections import Counter

    def fn(batch: pa.Table) -> pa.Table:
        ids, total, top, ppm = [], [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = t.split(" ")
            grams = [" ".join(ws[i: i + n]) for i in range(len(ws) - n + 1)]
            if not grams:
                continue
            c = Counter(grams)
            m = max(c.values())
            ids.append(doc_id)
            total.append(len(grams))
            top.append(m)
            ppm.append((m * 1_000_000) // len(grams))  # integer ppm: exact
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_ngrams": pa.array(total, type=pa.int64()),
                "top_ngram_count": pa.array(top, type=pa.int64()),
                "top_ngram_ppm": pa.array(ppm, type=pa.int64()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow").sort("doc_id")


DEFAULT_LANG_MIX: dict[str, str] = {
    # per-language hex thresholds on md5(text)[:2] — "80" ~ 50%,
    # "33" ~ 20%, "1a" ~ 10%: an English-weighted training mix
    "en": "80",
    "de": "33",
    "fr": "33",
    "es": "33",
    "zh": "1a",
}


def weighted_lang_sample(
    sf_dir: str, rates: dict[str, str] | None = None, default_rate: str = "00"
) -> "ray.data.Dataset":
    """Training-mix sampling: keep each document with a per-LANGUAGE
    deterministic content-hash rate (domain/language reweighting, the
    standard knob for composing a pretraining mix).  Content-keyed like
    :func:`hash_sample`, so the subset is stable across partitioning,
    ordering and resumption, composable with dedup (same doc always
    samples the same way), and SQL-checkable.  ``rates`` maps language
    -> 2-hex-digit threshold on ``md5(text)[:2]``; unlisted languages
    fall back to ``default_rate`` ("00" = drop)."""
    rates = DEFAULT_LANG_MIX if rates is None else rates

    def fn(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        keep = [
            hashlib.md5(t.encode()).hexdigest()[:2] < rates.get(lang, default_rate)
            for t, lang in zip(batch.column("text").to_pylist(), langs)
        ]
        return batch.filter(pa.array(keep, type=pa.bool_())).select(["doc_id", "lang"])

    return (
        _read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
    )


def pack_sequences(
    sf_dir: str, budget: int = 256, num_partitions: int = 32
) -> "ray.data.Dataset":
    """Sequence packing: greedily pack documents into fixed
    token-budget bins (the sample-efficiency step before LLM training —
    concatenate short docs so a context window wastes no tokens).

    Distributed shape: docs hash-partition by ``md5_lower64(doc_id)``
    (ONE groupby shuffle of (doc_id, n_tokens) pairs only — text stays
    in the source files); each partition group sorts by doc_id and runs
    greedy first-fit over bins, emitting ``(doc_id, n_tokens, pack_id,
    pack_pos)``.  ``pack_id = partition << 32 | local bin`` keeps ids
    globally unique, and the assignment is DETERMINISTIC regardless of
    physical block layout (partition and intra-partition order are both
    content-keyed).  A doc longer than ``budget`` gets a bin of its own
    (callers chunk oversized docs upstream; packing never truncates).
    Token counts use the whitespace-word convention shared with
    token_counts/the SQL oracles; the partition hash is the repo-wide
    md5-lower-64 convention, which makes the whole sequential first-fit
    SQL-replayable — the ``docs_pack_sequences`` oracle re-runs it as a
    recursive CTE carrying each partition's open-bin list as LIST
    state, one recursion step per document."""
    from .dedup import _md5_lower64

    def count_and_part(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        n_tok = [len(t.split(" ")) for t in batch.column("text").to_pylist()]
        parts = [_md5_lower64(str(i)) % num_partitions for i in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "part": pa.array(parts, type=pa.int64()),
            }
        )

    def pack_group(group: pa.Table) -> pa.Table:
        import numpy as np

        part = int(group.column("part")[0].as_py())
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        toks = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        # greedy first-fit in doc_id order: O(n * open-bins) worst
        # case; exactly-full bins retire from the scan list
        bins: list[tuple[int, int]] = []  # (bin_id, used)
        next_bin = 0
        out_pack, out_pos = {}, {}
        for i in order:
            t = int(toks[i])
            placed = False
            for bi in range(len(bins)):
                b_id, used = bins[bi]
                if used + t <= budget:
                    out_pack[i] = b_id
                    out_pos[i] = used
                    bins[bi] = (b_id, used + t)
                    placed = True
                    break
            if not placed:
                out_pack[i] = next_bin
                out_pos[i] = 0
                bins.append((next_bin, t))
                next_bin += 1
            # retire full bins so the inner scan stays short
            bins = [(b, u) for b, u in bins if budget - u > 0]
        return pa.table(
            {
                "doc_id": pa.array([int(ids[i]) for i in order], type=pa.int64()),
                "n_tokens": pa.array([int(toks[i]) for i in order], type=pa.int64()),
                "pack_id": pa.array(
                    [(part << 32) | out_pack[i] for i in order], type=pa.int64()
                ),
                "pack_pos": pa.array([out_pos[i] for i in order], type=pa.int64()),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(count_and_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack_group, batch_format="pyarrow")
        .sort("doc_id")
    )

def _exact_top_words(sf_dir: str, k: int) -> pa.Table:
    """Exact top-k words via the full-vocabulary groupby — the fallback
    (and correctness anchor) for the heavy-hitters sketch path."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.split(" "))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    top = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return pa.table(
        {
            "word": pa.array([r["word"] for r in top], type=pa.string()),
            "cnt": pa.array([int(r["cnt"]) for r in top], type=pa.int64()),
        }
    )


def heavy_hitter_words(
    sf_dir: str, k: int = 20, capacity: int = 4096, max_candidates: int = 1 << 20
) -> pa.Table:
    """Exact corpus top-k words via two-pass heavy hitters — the
    shuffle-free alternative to a full-vocabulary groupby when the
    vocabulary is web-scale.  Pass 1 compresses each block to at most
    ``capacity`` (word, count) partials plus the block's undercount
    bound (a dropped word's in-block count is at most the capacity-th
    kept count, Misra-Gries style), so the shuffle moves sketch-sized
    rows, never the vocabulary.  Pass 2 exactly recounts the
    provably-sufficient candidate set {approx >= kth_approx - B}
    against a broadcast set.  Exactness is CHECKED, not assumed: if the
    k-th exact count does not strictly beat the global undercount bound
    B (a never-kept word could then reach the top-k), the operator
    falls back to the exact full-vocabulary groupby."""
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.split(" "))
        bound = 0
        if len(c) > capacity:
            kept = c.most_common(capacity)
            bound = kept[-1][1]
            words = [w for w, _ in kept]
            cnts = [n for _, n in kept]
        else:
            words, cnts = list(c.keys()), list(c.values())
        return pa.table(
            {
                "word": pa.array(words + [None], type=pa.string()),
                "cnt": pa.array(cnts + [0], type=pa.int64()),
                "bound": pa.array([0] * len(words) + [bound], type=pa.int64()),
            }
        )

    # sketch-sized (<= capacity+1 rows per block): safe to materialize so
    # the bound sum and the approx groupby don't re-read the corpus
    partials = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    B = int(partials.sum("bound") or 0)
    approx = (
        partials.map_batches(
            lambda b: b.filter(pc.is_valid(b.column("word"))), batch_format="pyarrow"
        )
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    ).materialize()
    head = approx.sort(["cnt", "word"], descending=[True, False]).limit(k).take_all()
    if not head:
        return pa.table({"word": pa.array([], type=pa.string()), "cnt": pa.array([], type=pa.int64())})
    kth_approx = int(head[-1]["cnt"])
    if kth_approx <= B:
        # a word dropped from every block (true count <= B) could reach
        # the top-k: the sketch can't prove exactness at this capacity
        return _exact_top_words(sf_dir, k)
    cand_rows = approx.filter(expr=f"cnt >= {kth_approx - B}").take_all()
    if len(cand_rows) > max_candidates:
        return _exact_top_words(sf_dir, k)
    cand_ref = ray.put(frozenset(r["word"] for r in cand_rows))

    def recount(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            for w in t.split(" "):
                if w in cand:
                    c[w] += 1
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    top = (
        _read_documents(sf_dir, ["text"])
        .map_batches(recount, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    if top and int(top[-1]["cnt"]) <= B:
        return _exact_top_words(sf_dir, k)
    return pa.table(
        {
            "word": pa.array([r["word"] for r in top], type=pa.string()),
            "cnt": pa.array([int(r["cnt"]) for r in top], type=pa.int64()),
        }
    )

# one bucket-count constant shared by build / lookup / search — a
# mismatch would hash probes into the wrong partition directories
INDEX_BUCKETS = 16


def _read_index_buckets(
    index_dir: str, words: list[str], num_buckets: int
) -> "ray.data.Dataset":
    """Partition-pruned read: only the buckets the probe words hash to."""
    import glob as globmod

    buckets = sorted({zlib.crc32(w.encode()) % num_buckets for w in words})
    files = [
        f
        for b in buckets
        for f in sorted(globmod.glob(f"{index_dir}/bucket={b}/*.parquet"))
    ]
    return ray.data.read_parquet(files)


def _index_pairs(num_buckets: int):
    """(word, doc_id, tf, dl, positions, bucket) extraction shared by
    the full index build and the delta merge."""

    def pairs(batch: pa.Table) -> pa.Table:
        words, ids, buckets, tfs, dls, poss = [], [], [], [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = t.split(" ")
            posmap: dict[str, list[int]] = {}
            # 1-based positions — matches SQL list indexing so the
            # phrase oracle replays them verbatim
            for i, w in enumerate(toks, start=1):
                posmap.setdefault(w, []).append(i)
            for w, ps in posmap.items():
                words.append(w)
                ids.append(doc_id)
                buckets.append(zlib.crc32(w.encode()) % num_buckets)
                tfs.append(len(ps))
                dls.append(len(toks))
                poss.append(ps)
        return pa.table(
            {
                "word": pa.array(words, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "bucket": pa.array(buckets, type=pa.int64()),
                "tf": pa.array(tfs, type=pa.int64()),
                "dl": pa.array(dls, type=pa.int64()),
                "pos": pa.array(poss, type=pa.list_(pa.int64())),
            }
        )

    def postings(group: pa.Table) -> pa.Table:
        word = group.column("word")[0].as_py()
        rows = sorted(
            zip(
                group.column("doc_id").to_pylist(),
                group.column("tf").to_pylist(),
                group.column("dl").to_pylist(),
                group.column("pos").to_pylist(),
            )
        )
        ids = [r[0] for r in rows]
        return pa.table(
            {
                "bucket": pa.array([int(group.column("bucket")[0].as_py())], type=pa.int64()),
                "word": pa.array([word], type=pa.string()),
                "df": pa.array([len(ids)], type=pa.int64()),
                "postings": pa.array([ids], type=pa.list_(pa.int64())),
                # Lucene-style norms + positions alongside each posting:
                # term frequency, the doc's token length, and 1-based
                # term positions, so ranked retrieval (BM25) AND phrase
                # queries run from the index alone — the corpus text is
                # never touched at query time.
                "tfs": pa.array([[r[1] for r in rows]], type=pa.list_(pa.int64())),
                "dls": pa.array([[r[2] for r in rows]], type=pa.list_(pa.int64())),
                "poss": pa.array(
                    [[r[3] for r in rows]], type=pa.list_(pa.list_(pa.int64()))
                ),
            }
        )

    return pairs, postings


def build_inverted_index(
    sf_dir: str, index_dir: str, num_buckets: int = INDEX_BUCKETS
) -> dict:
    """Build a persistent inverted index (word -> sorted doc_id
    postings + Lucene-style tf/dl/position norms), hash-partitioned by
    word: per-batch (word, doc_id, tf, dl, positions) rows -> ONE word
    shuffle -> per-word postings rows written
    ``partition_cols=["bucket"]`` (bucket = crc32(word) % num_buckets).
    This is the partition-once-probe-many layout for retrieval at
    100 TB: a term lookup reads only the probed buckets via partition
    pruning — no full scan.  At corpus scale num_buckets rises with the
    vocabulary; postings for one word must fit one task (the same
    per-key assumption every groupby here makes)."""
    pairs, postings = _index_pairs(num_buckets)

    (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("word")
        .map_groups(postings, batch_format="pyarrow")
        .write_parquet(index_dir, partition_cols=["bucket"])
    )
    # corpus stats (N docs, total token length) land next to the index —
    # computed at build time exactly like Lucene stores norms, so BM25's
    # avgdl needs no corpus pass at query time
    stats = (
        _read_documents(sf_dir, ["text"])
        .map_batches(
            lambda b: pa.table(
                {
                    "n_docs": pa.array([b.num_rows], type=pa.int64()),
                    "total_dl": pa.array(
                        [sum(len(t.split(" ")) for t in b.column("text").to_pylist())],
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "n_docs": pa.array([sum(r["n_docs"] for r in stats)], type=pa.int64()),
                "total_dl": pa.array([sum(r["total_dl"] for r in stats)], type=pa.int64()),
            }
        ),
        f"{index_dir}/_corpus_stats.parquet",
    )
    return {"index_dir": index_dir, "num_buckets": num_buckets}


def merge_index_delta(
    base_index_dir: str,
    delta_sf_dir: str,
    out_index_dir: str,
    num_buckets: int = INDEX_BUCKETS,
) -> dict:
    """Incremental index maintenance: fold a DELTA corpus (new doc_ids)
    into an existing index without rebuilding it.  Work is
    delta-sized, not corpus-sized — the core requirement for index
    upkeep at 100 TB:

    1. the delta's (word, doc_id, tf, dl, positions) rows determine the
       AFFECTED buckets (word-hash partition pruning in reverse);
    2. only those buckets' existing postings are read back, EXPLODED to
       pair rows, unioned with the delta pairs, and re-aggregated by
       the same groupby(word) the full build uses — so merged postings
       are bit-identical to a from-scratch rebuild over the combined
       corpus;
    3. untouched bucket directories HARDLINK into the new index root
       (no data copied), and ``_corpus_stats`` adds the delta's counts.

    The output is a complete, self-consistent index at
    ``out_index_dir``; the base index is never mutated (snapshot
    semantics — readers of the old root are unaffected)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    import ray.data as rd

    pairs, postings = _index_pairs(num_buckets)

    delta_pairs = (
        _read_documents(delta_sf_dir, ["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .materialize()
    )
    affected = sorted(
        {r["bucket"] for r in delta_pairs.select_columns(["bucket"]).take_all()}
    )

    def explode_old(batch: pa.Table) -> pa.Table:
        words, ids, buckets, tfs, dls, poss = [], [], [], [], [], []
        for w, b, p_ids, p_tfs, p_dls, p_poss in zip(
            batch.column("word").to_pylist(),
            batch.column("bucket").to_pylist() if "bucket" in batch.column_names
            else [None] * batch.num_rows,
            batch.column("postings").to_pylist(),
            batch.column("tfs").to_pylist(),
            batch.column("dls").to_pylist(),
            batch.column("poss").to_pylist(),
        ):
            bk = zlib.crc32(w.encode()) % num_buckets if b is None else int(b)
            for d, tf, dl, ps in zip(p_ids, p_tfs, p_dls, p_poss):
                words.append(w)
                ids.append(d)
                buckets.append(bk)
                tfs.append(tf)
                dls.append(dl)
                poss.append(ps)
        return pa.table(
            {
                "word": pa.array(words, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "bucket": pa.array(buckets, type=pa.int64()),
                "tf": pa.array(tfs, type=pa.int64()),
                "dl": pa.array(dls, type=pa.int64()),
                "pos": pa.array(poss, type=pa.list_(pa.int64())),
            }
        )

    os.makedirs(out_index_dir, exist_ok=True)
    old_files = [
        f"{base_index_dir}/bucket={b}/{f}"
        for b in affected
        if os.path.isdir(f"{base_index_dir}/bucket={b}")
        for f in sorted(os.listdir(f"{base_index_dir}/bucket={b}"))
    ]
    merged = delta_pairs
    if old_files:
        merged = merged.union(
            rd.read_parquet(old_files).map_batches(explode_old, batch_format="pyarrow")
        )
    (
        merged.groupby("word")
        .map_groups(postings, batch_format="pyarrow")
        .write_parquet(out_index_dir, partition_cols=["bucket"])
    )

    # untouched buckets: hardlink files into the new root (fall back to
    # copy across filesystems) — no re-aggregation, no data movement
    for entry in sorted(os.listdir(base_index_dir)):
        if not entry.startswith("bucket="):
            continue
        b = int(entry.split("=", 1)[1])
        if b in set(affected):
            continue
        dst_dir = f"{out_index_dir}/{entry}"
        os.makedirs(dst_dir, exist_ok=True)
        for f in sorted(os.listdir(f"{base_index_dir}/{entry}")):
            src, dst = f"{base_index_dir}/{entry}/{f}", f"{dst_dir}/{f}"
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)

    base_stats = pq.read_table(f"{base_index_dir}/_corpus_stats.parquet")
    delta_docs = pq.read_table(
        f"{delta_sf_dir}/documents.parquet", columns=["text"]
    )
    d_n = delta_docs.num_rows
    d_dl = sum(len(t.split(" ")) for t in delta_docs.column("text").to_pylist())
    pq.write_table(
        pa.table(
            {
                "n_docs": pa.array(
                    [int(base_stats.column("n_docs")[0].as_py()) + d_n], type=pa.int64()
                ),
                "total_dl": pa.array(
                    [int(base_stats.column("total_dl")[0].as_py()) + d_dl],
                    type=pa.int64(),
                ),
            }
        ),
        f"{out_index_dir}/_corpus_stats.parquet",
    )
    return {
        "index_dir": out_index_dir,
        "num_buckets": num_buckets,
        "affected_buckets": affected,
    }


def postings_lookup(
    index_dir: str, words: list[str], num_buckets: int = INDEX_BUCKETS
) -> pa.Table:
    """Term lookup against a built inverted index: read ONLY the
    buckets the probe words hash to (hive partition pruning), filter to
    the probes, and emit (word, df, postings digest, min/max doc) —
    the probed fraction of the index is all that leaves storage."""
    ds = _read_index_buckets(index_dir, words, num_buckets)
    wset = set(words)

    def hit(batch: pa.Table) -> pa.Table:
        mask = pa.array([w in wset for w in batch.column("word").to_pylist()])
        batch = batch.filter(mask)
        digests, lo, hi = [], [], []
        for ids in batch.column("postings").to_pylist():
            digests.append(hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest())
            lo.append(ids[0])
            hi.append(ids[-1])
        return pa.table(
            {
                "word": batch.column("word"),
                "df": pc.cast(batch.column("df"), pa.int64()),
                "postings_md5": pa.array(digests, type=pa.string()),
                "min_doc": pa.array(lo, type=pa.int64()),
                "max_doc": pa.array(hi, type=pa.int64()),
            }
        )

    rows = sorted(
        ds.map_batches(hit, batch_format="pyarrow").take_all(), key=lambda r: r["word"]
    )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "word": pa.array([], type=pa.string()),
            "df": pa.array([], type=pa.int64()),
            "postings_md5": pa.array([], type=pa.string()),
            "min_doc": pa.array([], type=pa.int64()),
            "max_doc": pa.array([], type=pa.int64()),
        }
    )


def _cached_index_dir(sf_dir: str) -> str:
    """Cache tag keyed on the source file's identity AND content stamp
    (size + mtime), so a regenerated corpus at the same path gets a
    fresh index; the build lands in a temp dir and renames into place so
    a crashed build can never be mistaken for a finished one."""
    import os
    import shutil

    st = os.stat(f"{sf_dir}/documents.parquet")
    # "v3" = index schema version (tfs/dls/poss norm+position lists +
    # _corpus_stats); bumping it orphans older caches instead of
    # misreading them
    tag = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|v3".encode()
    ).hexdigest()[:16]
    index_dir = f"/tmp/ocsr_invidx/{tag}"
    if not os.path.exists(index_dir):
        tmp = f"{index_dir}.building-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build_inverted_index(sf_dir, tmp)
        try:
            os.rename(tmp, index_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost a concurrent race
    return index_dir


def inverted_index_probe(sf_dir: str, k: int = 5) -> pa.Table:
    """Build (cached per corpus content) the inverted index, then probe
    it with the corpus's top-k DF words — exercises build +
    partition-pruned lookup end-to-end with an exact SQL oracle."""
    probes = doc_frequency(sf_dir, k=k).column("word").to_pylist()
    return postings_lookup(_cached_index_dir(sf_dir), probes)

def docs_above_p90_length(sf_dir: str) -> "ray.data.Dataset":
    """Quantile-threshold filter — the data-driven gating pattern
    (keep the longest decile): the EXACT p90 of ``n_chars`` comes from
    the histogram-refinement selection operator (no global sort, two
    counting passes), then the corpus re-scans with the threshold
    predicate PUSHED TO THE PARQUET READ so row groups below it never
    leave storage."""
    import pyarrow.dataset as pads

    from .streaming import global_value_quantiles

    t = global_value_quantiles(sf_dir, qs=(0.9,), table="documents", column="n_chars")
    thr = float(t.column("value")[0].as_py())
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"],
        filter=pads.field("n_chars") > pa.scalar(thr, type=pa.float64()),
    ).sort("doc_id")

def build_vocab(sf_dir: str, min_count: int = 2, max_size: int = 1 << 22) -> pa.Table:
    """Tokenizer-vocabulary builder: corpus word counts -> frequency
    floor -> deterministic token-id assignment by (count desc, word
    asc).  Ray shape: the map-side-combine word aggregate (per-batch
    Counter partials, ONE word shuffle), an Arrow-kernel frequency
    filter, then a distributed sort; the surviving vocabulary — the one
    table a tokenizer build legitimately materializes — is rank-stamped
    on the driver.  ``max_size`` is an explicit guard against a
    pathological vocabulary, not a silent cap."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.split(" "))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    kept = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("cnt"), pa.scalar(min_count))),
            batch_format="pyarrow",
        )
        .sort(["cnt", "word"], descending=[True, False])
    )
    rows = kept.take(max_size + 1)
    if len(rows) > max_size:
        raise RuntimeError(
            f"vocabulary exceeds max_size={max_size}; raise the guard or min_count"
        )
    return pa.table(
        {
            "word": pa.array([r["word"] for r in rows], type=pa.string()),
            "cnt": pa.array([int(r["cnt"]) for r in rows], type=pa.int64()),
            "token_id": pa.array(range(1, len(rows) + 1), type=pa.int64()),
        }
    )

def encode_with_vocab(sf_dir: str, min_count: int = 2) -> "ray.data.Dataset":
    """Tokenizer encode pass: map every document's words through the
    built vocabulary (broadcast once via ``ray.put`` — the id table a
    tokenizer ships to every worker) and emit per-document coverage
    stats (in-vocab count, OOV count, token-id checksum).  Closes the
    loop from ``build_vocab``; the checksum pins the exact word->id
    assignment against the SQL oracle without emitting the id arrays
    themselves."""
    import ray

    vocab = build_vocab(sf_dir, min_count=min_count)
    mapping = dict(
        zip(vocab.column("word").to_pylist(), vocab.column("token_id").to_pylist())
    )
    vocab_ref = ray.put(mapping)

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(vocab_ref)
        n_in, n_oov, sums = [], [], []
        for t in batch.column("text").to_pylist():
            ids = [m.get(w) for w in t.split(" ")]
            hits = [i for i in ids if i is not None]
            n_in.append(len(hits))
            n_oov.append(len(ids) - len(hits))
            sums.append(sum(hits))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_in_vocab": pa.array(n_in, type=pa.int64()),
                "n_oov": pa.array(n_oov, type=pa.int64()),
                "token_id_sum": pa.array(sums, type=pa.int64()),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
    )

def chunk_documents(
    sf_dir: str, window: int = 50, stride: int = 25
) -> "ray.data.Dataset":
    """RAG-style document chunking: split each document into overlapping
    word windows (``window`` words every ``stride``) with stable
    per-document chunk ids — the flat_map fan-out every
    retrieval/embedding pipeline runs before encoding.  Emits the chunk
    digest rather than the text so the oracle comparison stays
    row-sized; chunk ids are deterministic under any block layout
    because they derive only from (doc_id, position)."""

    def fn(batch: pa.Table) -> pa.Table:
        out_doc, out_chunk, out_n, out_md5 = [], [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = t.split(" ")
            if len(ws) > 4096 * stride:
                # the SQL oracle enumerates chunk ids from a fixed
                # range(0, 4096); a longer document would silently
                # desync the parity gate, so fail loudly instead
                raise ValueError(
                    f"doc {doc_id}: {len(ws)} words exceeds the 4096-chunk "
                    "oracle bound — raise both bounds together"
                )
            i = 0
            while i * stride < len(ws):
                chunk = ws[i * stride: i * stride + window]
                out_doc.append(doc_id)
                out_chunk.append(i)
                out_n.append(len(chunk))
                out_md5.append(hashlib.md5(" ".join(chunk).encode()).hexdigest())
                i += 1
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "chunk_id": pa.array(out_chunk, type=pa.int64()),
                "n_words": pa.array(out_n, type=pa.int64()),
                "chunk_md5": pa.array(out_md5, type=pa.string()),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .sort(["doc_id", "chunk_id"])
    )

def search_and(sf_dir: str, k_probe: int = 2) -> pa.Table:
    """Conjunctive (AND) term search THROUGH the inverted index: probe
    the corpus's top-``k_probe`` DF words, read only their buckets
    (partition pruning), and intersect the postings — the
    retrieval-side consumer that proves the index answers queries
    without touching the corpus.  Returns the matching doc_ids."""
    index_dir = _cached_index_dir(sf_dir)
    probes = doc_frequency(sf_dir, k=k_probe).column("word").to_pylist()
    wset = set(probes)

    def postings_of(batch: pa.Table) -> pa.Table:
        mask = pa.array([w in wset for w in batch.column("word").to_pylist()])
        batch = batch.filter(mask)
        return pa.table(
            {
                "word": batch.column("word"),
                "postings": batch.column("postings"),
            }
        )

    rows = (
        _read_index_buckets(index_dir, probes, INDEX_BUCKETS)
        .map_batches(postings_of, batch_format="pyarrow")
        .take_all()
    )
    if len(rows) != len(probes):
        raise RuntimeError(
            f"index at {index_dir} is missing postings for "
            f"{sorted(wset - {r['word'] for r in rows})} — stale or partial build"
        )
    hits = sorted(set.intersection(*(set(r["postings"]) for r in rows)))
    return pa.table({"doc_id": pa.array(hits, type=pa.int64())})


BM25_QUERY = ("merge", "sort", "stream")
PHRASE_QUERY = ("merge", "sort")


def weighted_reservoir_sample(sf_dir: str, k: int = 50) -> pa.Table:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res): each doc gets priority ``ln(u) / w`` with ``u`` a
    content-keyed uniform in (0,1] (md5-lower-64 of the text, so the
    sample is deterministic and resumption-stable) and ``w = n_chars``;
    the k largest priorities ARE the weighted sample.  Distributed as
    priorities-in-map_batches + a global sort/limit — no reservoir
    state, no sequential pass, identical result at any block layout.
    SQL-replayable: DuckDB computes the identical IEEE ``ln(u)/w``
    (same libm), ties (duplicate texts) break by doc_id."""
    import math

    from .dedup import _md5_lower64

    def priorities(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        nchars = batch.column("n_chars").to_pylist()
        pri = [
            math.log((float(_md5_lower64(t)) + 1.0) / 18446744073709551616.0)
            / float(w)
            for t, w in zip(batch.column("text").to_pylist(), nchars)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_chars": pa.array(nchars, type=pa.int64()),
                "priority": pa.array(pri, type=pa.float64()),
            }
        )

    rows = (
        _read_documents(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(priorities, batch_format="pyarrow")
        .sort(["priority", "doc_id"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "n_chars": pa.array([r["n_chars"] for r in rows], type=pa.int64()),
            "priority": pa.array([r["priority"] for r in rows], type=pa.float64()),
        }
    )


def phrase_search(
    sf_dir: str, phrase: tuple[str, ...] = PHRASE_QUERY
) -> pa.Table:
    """Exact PHRASE search through the positional index: the postings
    carry 1-based term positions (written at build time), so adjacency
    is checked without ever reading corpus text — probe only the
    phrase words' buckets (partition pruning), explode each phrase
    slot's postings to (doc_id, slot, positions) rows, and ONE
    groupby(doc_id) pass chains the position intersections
    ``((pos_1 + 1) ∩ pos_2) + 1) ∩ pos_3 ...`` vectorized
    (np.intersect1d of sorted int arrays).  Emits (doc_id, n_matches =
    phrase occurrence count) for matching docs.  Docs missing any slot
    produce a group with < len(phrase) rows and are filtered by the
    slot-count check — no driver-side set logic, candidates never
    materialize."""
    index_dir = _cached_index_dir(sf_dir)
    n_slots = len(phrase)
    slot_of: dict[str, list[int]] = {}
    for s, w in enumerate(phrase):
        slot_of.setdefault(w, []).append(s)

    def explode(batch: pa.Table) -> pa.Table:
        out_doc, out_slot, out_pos = [], [], []
        for w, ids, poss in zip(
            batch.column("word").to_pylist(),
            batch.column("postings").to_pylist(),
            batch.column("poss").to_pylist(),
        ):
            for s in slot_of.get(w, ()):
                out_doc.extend(ids)
                out_slot.extend([s] * len(ids))
                out_pos.extend(poss)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "slot": pa.array(out_slot, type=pa.int64()),
                "pos": pa.array(out_pos, type=pa.list_(pa.int64())),
            }
        )

    def adjacency(group: pa.Table) -> pa.Table:
        if group.num_rows < n_slots:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_matches": pa.array([], type=pa.int64()),
                }
            )
        by_slot = dict(
            zip(group.column("slot").to_pylist(), group.column("pos").to_pylist())
        )
        cur = np.asarray(by_slot[0], dtype=np.int64)
        for s in range(1, n_slots):
            cur = np.intersect1d(cur + 1, np.asarray(by_slot[s], dtype=np.int64))
            if not len(cur):
                break
        if not len(cur):
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_matches": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array([group.column("doc_id")[0].as_py()], type=pa.int64()),
                "n_matches": pa.array([len(cur)], type=pa.int64()),
            }
        )

    rows = sorted(
        _read_index_buckets(index_dir, list(set(phrase)), INDEX_BUCKETS)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(adjacency, batch_format="pyarrow")
        .take_all(),
        key=lambda r: r["doc_id"],
    )
    if not rows:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_matches": pa.array([], type=pa.int64()),
            }
        )
    return pa.Table.from_pylist(rows).select(["doc_id", "n_matches"]).cast(
        pa.schema([("doc_id", pa.int64()), ("n_matches", pa.int64())])
    )


def bm25_search(
    sf_dir: str,
    query: tuple[str, ...] = BM25_QUERY,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """BM25 ranked retrieval THROUGH the inverted index — the corpus
    text is never read at query time: term frequencies and doc-length
    norms ride in the postings (Lucene-style, written at build time),
    corpus stats (N, avgdl) come from the index's ``_corpus_stats``
    sidecar, and only the probed buckets leave storage (partition
    pruning).  Distributed shape: probed postings EXPLODE to
    (doc_id, contribution) rows inside map_batches (term-sized lists,
    vectorized numpy scoring), ONE groupby(doc_id) sums candidate
    scores, and a sort/limit returns the top k — no driver-side
    scoring loop, candidates never materialize.

    Hash-exact oracle trick: each term's contribution is converted to
    integer MICRO-units (floor(c*1e6+0.5)) before the sum, so the
    cross-term addition is order-independent (integers commute; float
    sums don't) and DuckDB replays the identical staged IEEE expression
    per (doc, term).  Ties in score_micro break by doc_id."""
    import math

    import pyarrow.parquet as pq

    index_dir = _cached_index_dir(sf_dir)
    stats = pq.read_table(f"{index_dir}/_corpus_stats.parquet")
    n_docs = int(stats.column("n_docs")[0].as_py())
    total_dl = int(stats.column("total_dl")[0].as_py())
    avgdl = float(total_dl) / float(n_docs)

    qset = set(query)
    # pass 1 over probed buckets only: term-count-sized df table
    dfs: dict[str, int] = {}
    for row in (
        _read_index_buckets(index_dir, list(query), INDEX_BUCKETS)
        .map_batches(
            lambda t: t.select(["word", "df"]).filter(
                pa.array([w in qset for w in t.column("word").to_pylist()])
            ),
            batch_format="pyarrow",
        )
        .take_all()
    ):
        dfs[row["word"]] = int(row["df"])
    idf = {
        w: math.log(1.0 + (float(n_docs) - float(df) + 0.5) / (float(df) + 0.5))
        for w, df in dfs.items()
    }

    def explode_score(batch: pa.Table) -> pa.Table:
        out_ids: list[np.ndarray] = []
        out_micro: list[np.ndarray] = []
        words = batch.column("word").to_pylist()
        posts = batch.column("postings").to_pylist()
        tfs = batch.column("tfs").to_pylist()
        dls = batch.column("dls").to_pylist()
        for w, ids, tf, dl in zip(words, posts, tfs, dls):
            if w not in idf:
                continue
            tfa = np.asarray(tf, dtype=np.float64)
            dla = np.asarray(dl, dtype=np.float64)
            num = tfa * (k1 + 1.0)
            den = tfa + k1 * (1.0 - b + b * dla / avgdl)
            c = idf[w] * (num / den)
            out_ids.append(np.asarray(ids, dtype=np.int64))
            out_micro.append(np.floor(c * 1000000.0 + 0.5).astype(np.int64))
        if not out_ids:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "c_micro": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "c_micro": pa.array(np.concatenate(out_micro), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    top = (
        _read_index_buckets(index_dir, list(query), INDEX_BUCKETS)
        .map_batches(explode_score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(_Sum("c_micro", alias_name="score_micro"))
        .sort(["score_micro", "doc_id"], descending=[True, False])
        .limit(k)
    )
    rows = top.take_all()
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "score_micro": pa.array([int(r["score_micro"]) for r in rows], type=pa.int64()),
        }
    )

def train_val_test_split(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic 80/10/10 train/val/test assignment by content-hash
    ranges on md5(text)[:2] — the split every training run needs to be
    reproducible across re-partitioning, re-ordering, resumption and
    incremental ingestion (a document's split never changes when other
    documents come or go).  Thresholds shared verbatim with the SQL
    oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        splits = []
        for t in batch.column("text").to_pylist():
            h = hashlib.md5(t.encode()).hexdigest()[:2]
            splits.append("train" if h < "cc" else ("val" if h < "e6" else "test"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(splits, type=pa.string()),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
    )


def word_commonness(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-frequency document scoring (the unigram-LM quality signal
    of a training-data pipeline, kept hash-exact): per doc, the number
    of corpus-wide occurrences of each of its word OCCURRENCES summed
    as exact int64, plus the single float64 division corpus_hits /
    n_words — one IEEE op, so the engine and the SQL oracle are
    bit-identical (no float accumulation order to diverge).

    Ray shape (two passes, both streaming): (1) per-batch unigram
    Counter partials -> groupby(word).sum -> the vocab-sized count
    table broadcasts once via ray.put; (2) a vectorized scoring pass
    maps each doc's words through the broadcast dict.  At 100 TB the
    vocab table is the only shuffled data (words, not documents), and
    the broadcast is once per actor, not per batch."""
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.split(" "))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts_ds = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    counts = {r["word"]: int(r["n"]) for r in counts_ds.take_all()}
    counts_ref = ray.put(counts)

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(counts_ref)
        n_words, hits = [], []
        for t in batch.column("text").to_pylist():
            ws = t.split(" ")
            n_words.append(len(ws))
            hits.append(sum(c[w] for w in ws))
        n_arr = np.array(n_words, dtype=np.int64)
        h_arr = np.array(hits, dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_arr, type=pa.int64()),
                "corpus_hits": pa.array(h_arr, type=pa.int64()),
                "commonness": pa.array(
                    h_arr.astype(np.float64) / n_arr.astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .sort("doc_id")
    )


def token_budget_mix(
    sf_dir: str, budget: int = 20000, bucket_size: int = 1024
) -> "ray.data.Dataset":
    """Per-language token-budget curriculum cut: keep documents, in
    doc_id order within each language, while the language's running
    token total stays <= budget — the domain-mixture balancing step
    before training-set assembly.

    Ray shape — a DISTRIBUTED PREFIX SUM, so no language-sized group
    ever materializes anywhere: (1) project (doc_id, lang, n_tokens)
    and bucket by doc_id // bucket_size; (2) per-(lang, bucket) token
    sums (one row per bucket) reach the driver, which prefix-scans them
    per language — driver state is bucket-count-sized, never
    corpus-sized; (3) the per-bucket starting offsets broadcast via
    ray.put and a groupby((lang, bucket)) pass computes exact in-bucket
    cumulative sums (groups are <= bucket_size rows by construction)
    and applies the budget filter in-stream.  At 100 TB the shuffled
    payload is (doc_id, lang, n_tokens) triples twice — texts never
    move."""
    import ray
    from ray.data.aggregate import Sum

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().cast(pa.int64())
        n_tok = pa.array(
            [len(t.split(" ")) for t in batch.column("text").to_pylist()],
            type=pa.int64(),
        )
        bucket = pc.divide(ids, pa.scalar(bucket_size, type=pa.int64()))
        return pa.table(
            {
                "doc_id": ids,
                "lang": batch.column("lang"),
                "n_tokens": n_tok,
                "bucket": bucket,
            }
        )

    triples = (
        _read_documents(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(project, batch_format="pyarrow")
        .materialize()
    )

    bucket_sums = (
        triples.groupby(["lang", "bucket"])
        .aggregate(Sum("n_tokens", alias_name="tok"))
        .take_all()
    )
    offsets: dict[tuple[str, int], int] = {}
    running: dict[str, int] = {}
    for r in sorted(bucket_sums, key=lambda r: (r["lang"], r["bucket"])):
        key = (r["lang"], int(r["bucket"]))
        offsets[key] = running.get(r["lang"], 0)
        running[r["lang"]] = offsets[key] + int(r["tok"])
    offsets_ref = ray.put(offsets)

    def cut(group: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        lang = group.column("lang")[0].as_py()
        bucket = int(group.column("bucket")[0].as_py())
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        toks = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        cum = offs[(lang, bucket)] + np.cumsum(toks[order])
        keep = cum <= budget
        return pa.table(
            {
                "doc_id": pa.array(ids[order][keep], type=pa.int64()),
                "lang": pa.array([lang] * int(keep.sum()), type=pa.string()),
                "n_tokens": pa.array(toks[order][keep], type=pa.int64()),
                "cum_tokens": pa.array(cum[keep], type=pa.int64()),
            }
        )

    return (
        triples.groupby(["lang", "bucket"])
        .map_groups(cut, batch_format="pyarrow")
        .sort("doc_id")
    )


def source_mix(sf_dir: str) -> pa.Table:
    """Per-source corpus composition (the domain-mixture report that
    drives training-mix decisions): document count, token count, and
    each source's integer-exact token share in ppm (``n_tokens * 1e6 //
    total`` — no float division, so the oracle hash can't drift).

    Ray shape: per-batch (source -> n_docs, n_tokens) partials ->
    groupby(source) sums; only the source-cardinality-sized aggregate
    reaches the driver, where the ppm shares are derived.  At 100 TB
    this is one streaming pass + a tiny shuffle of per-batch partial
    rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from collections import defaultdict

        docs: dict[str, int] = defaultdict(int)
        toks: dict[str, int] = defaultdict(int)
        sources = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        for s, t in zip(sources, texts):
            docs[s] += 1
            toks[s] += len(t.split(" "))
        keys = list(docs.keys())
        return pa.table(
            {
                "source": pa.array(keys, type=pa.string()),
                "n_docs": pa.array([docs[k] for k in keys], type=pa.int64()),
                "n_tokens": pa.array([toks[k] for k in keys], type=pa.int64()),
            }
        )

    agg = (
        _read_documents(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens"))
    )
    rows = sorted(agg.take_all(), key=lambda r: r["source"])
    total = sum(int(r["n_tokens"]) for r in rows)
    return pa.table(
        {
            "source": pa.array([r["source"] for r in rows], type=pa.string()),
            "n_docs": pa.array([int(r["n_docs"]) for r in rows], type=pa.int64()),
            "n_tokens": pa.array([int(r["n_tokens"]) for r in rows], type=pa.int64()),
            "token_share_ppm": pa.array(
                [int(r["n_tokens"]) * 1_000_000 // total for r in rows], type=pa.int64()
            ),
        }
    )


def shuffled_export(sf_dir: str, seed: str = "shuf42", limit: int = 64) -> pa.Table:
    """Deterministic seeded GLOBAL SHUFFLE — the epoch-shuffle primitive
    of a training-data pipeline.  Every doc gets a content-independent
    shuffle key md5-lower-64(seed ':' doc_id); a distributed sort on the
    key IS the shuffle (reproducible across re-partitioning, resumption
    and cluster size, unlike ``random_shuffle``), and the first
    ``limit`` positions are returned as the verification slice.  At
    100 TB the sort's range-partitioned exchange is the cost of any
    true global shuffle; the alternative zero-shuffle form (write
    hive-partitioned by key prefix, read buckets in key order) reuses
    the same key."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keys = [
            int.from_bytes(
                hashlib.md5(f"{seed}:{i}".encode()).digest()[8:], "little"
            )
            for i in ids
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shuffle_key": pa.array(keys, type=pa.uint64()),
            }
        )

    head = (
        _read_documents(sf_dir, ["doc_id"])
        .map_batches(add_key, batch_format="pyarrow")
        .sort(["shuffle_key", "doc_id"])
        .limit(limit)
        .take_all()
    )
    return pa.table(
        {
            "pos": pa.array(range(1, len(head) + 1), type=pa.int64()),
            "doc_id": pa.array([int(r["doc_id"]) for r in head], type=pa.int64()),
            "shuffle_key": pa.array([int(r["shuffle_key"]) for r in head], type=pa.uint64()),
        }
    )


def length_ntile(sf_dir: str, tiles: int = 10) -> "ray.data.Dataset":
    """Global ROW_NUMBER + NTILE over (n_chars, doc_id) order — the
    global-ranking window primitive (percentile bucketing for curriculum
    / length-balanced sharding) that naive engines do with a full sort
    plus a sequential scan.

    Ray shape — bucketed prefix sum, same as ``token_budget_mix``: the
    key insight is that the sort key's FIRST component (n_chars) has
    bounded cardinality, so (1) a ``groupby(n_chars).count()`` yields a
    distinct-length-sized table; (2) the driver prefix-scans it into
    per-length starting offsets (driver state is value-cardinality-
    sized, never corpus-sized) and broadcasts them via ``ray.put``;
    (3) one ``groupby(n_chars)`` pass ranks each group by doc_id against
    its broadcast offset and derives the NTILE bucket arithmetically
    (DuckDB's rule: the first n%k buckets hold ceil(n/k) rows).  Texts
    never move; the shuffled payload is (doc_id, n_chars) pairs."""
    import ray
    from ray.data.aggregate import Count

    counts = (
        _read_documents(sf_dir, ["doc_id", "n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    counts.sort(key=lambda r: int(r["n_chars"]))
    offsets: dict[int, int] = {}
    total = 0
    for r in counts:
        offsets[int(r["n_chars"])] = total
        total += int(r["n"])
    q, rem = divmod(total, tiles)
    offsets_ref = ray.put(offsets)

    def rank_group(group: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        ids = np.sort(group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64))
        base = offs[int(group.column("n_chars")[0].as_py())]
        ranks = base + 1 + np.arange(len(ids), dtype=np.int64)
        if q == 0:
            ntile = ranks
        else:
            head = rem * (q + 1)
            ntile = np.where(
                ranks <= head,
                (ranks - 1) // (q + 1) + 1,
                rem + (ranks - 1 - head) // q + 1,
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_chars": pa.array(
                    [int(group.column("n_chars")[0].as_py())] * len(ids), type=pa.int64()
                ),
                "rank": pa.array(ranks, type=pa.int64()),
                "ntile": pa.array(ntile.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        _read_documents(sf_dir, ["doc_id", "n_chars"])
        .groupby("n_chars")
        .map_groups(rank_group, batch_format="pyarrow")
        .sort("doc_id")
    )


def bpe_train(
    sf_dir: str,
    n_merges: int = 40,
    min_freq: int = 2,
    mode: str = "auto",
    driver_vocab_threshold: int = 500_000,
) -> pa.Table:
    """Distributed BPE tokenizer TRAINING (the SentencePiece/GPT-2
    recipe): learn merge rules from corpus word frequencies.

    Scale shape — after ONE corpus pass builds the (word, freq) table,
    every iteration runs over the VOCAB-SIZED word table only (at
    100 TB the corpus is petabytes but distinct words are billions at
    most): (1) map_batches emits freq-weighted adjacent-symbol-pair
    partial counts per block (local dict combine — pairs never
    explode per occurrence); (2) one pair-count-sized groupby picks
    the best pair; (3) the merge broadcasts and map_batches rewrites
    each word's symbol list in-stream; the materialized word table
    rolls forward.  Ties break deterministically by (count DESC, left
    ASC, right ASC), so the merge list is a pure function of the
    corpus.  Words end with the classic '</w>' marker so merges cannot
    cross word boundaries.  Returns the merge table (rank, left,
    right, pair_freq); rows-only driver check — the pytest gate pins
    equality with a single-process reference implementation.

    ``mode``: the lm_perplexity auto-switch — the iterative loop pays
    2-3 Ray plan executions per merge (~1s each of pure scheduling on
    a vocab table that is kilobytes), so when the vocab fits
    (<= ``driver_vocab_threshold`` words, the common case even for
    web corpora) "auto" pulls the (word, freq) table ONCE and runs the
    IDENTICAL merge loop in-process; "distributed" keeps every
    iteration on the cluster (the adversarial-vocab path — the result
    is the same merge list either way, pinned by test)."""
    from collections import Counter

    from ray.data.aggregate import Sum as AggSum

    def word_counts(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.split(" "))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "freq": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    def to_symbols(batch: pa.Table) -> pa.Table:
        syms = [
            list(w) + ["</w>"] for w in batch.column("word").to_pylist()
        ]
        return pa.table(
            {
                "symbols": pa.array(syms, type=pa.list_(pa.string())),
                "freq": pc.cast(batch.column("sum(freq)"), pa.int64()),
            }
        )

    vocab = (
        _read_documents(sf_dir, ["text"])
        .map_batches(word_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(AggSum("freq"))
        .map_batches(to_symbols, batch_format="pyarrow")
        .materialize()
    )

    def pair_partials(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for syms, f in zip(
            batch.column("symbols").to_pylist(), batch.column("freq").to_pylist()
        ):
            for a, b in zip(syms, syms[1:]):
                c[(a, b)] += f
        if not c:
            return pa.table(
                {
                    "left": pa.array([], type=pa.string()),
                    "right": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        ks = list(c.keys())
        return pa.table(
            {
                "left": pa.array([k[0] for k in ks], type=pa.string()),
                "right": pa.array([k[1] for k in ks], type=pa.string()),
                "n": pa.array([c[k] for k in ks], type=pa.int64()),
            }
        )

    merges: list[tuple[int, str, str, int]] = []
    if mode == "driver" or (mode == "auto" and vocab.count() <= driver_vocab_threshold):
        rows = vocab.take_all()
        words = [list(r["symbols"]) for r in rows]
        freqs = [int(r["freq"]) for r in rows]
        for rank in range(n_merges):
            c: Counter = Counter()
            for syms, f in zip(words, freqs):
                for a, b in zip(syms, syms[1:]):
                    c[(a, b)] += f
            if not c:
                break
            (left, right), freq = min(
                c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if freq < min_freq:
                break
            merges.append((rank, left, right, freq))
            merged = left + right
            for wi, syms in enumerate(words):
                i, new = 0, []
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        new.append(merged)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                words[wi] = new
        return pa.table(
            {
                "rank": pa.array([m[0] for m in merges], type=pa.int64()),
                "left": pa.array([m[1] for m in merges], type=pa.string()),
                "right": pa.array([m[2] for m in merges], type=pa.string()),
                "pair_freq": pa.array([m[3] for m in merges], type=pa.int64()),
            }
        )

    for rank in range(n_merges):
        best = (
            vocab.map_batches(pair_partials, batch_format="pyarrow")
            .groupby(["left", "right"])
            .aggregate(AggSum("n"))
            .sort(["sum(n)", "left", "right"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not best or int(best[0]["sum(n)"]) < min_freq:
            break
        left, right, freq = best[0]["left"], best[0]["right"], int(best[0]["sum(n)"])
        merges.append((rank, left, right, freq))

        def apply_merge(batch: pa.Table, left=left, right=right) -> pa.Table:
            out = []
            merged = left + right
            for syms in batch.column("symbols").to_pylist():
                i, new = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        new.append(merged)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                out.append(new)
            return pa.table(
                {
                    "symbols": pa.array(out, type=pa.list_(pa.string())),
                    "freq": batch.column("freq"),
                }
            )

        vocab = vocab.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], type=pa.int64()),
            "left": pa.array([m[1] for m in merges], type=pa.string()),
            "right": pa.array([m[2] for m in merges], type=pa.string()),
            "pair_freq": pa.array([m[3] for m in merges], type=pa.int64()),
        }
    )


def lm_perplexity(
    sf_dir: str,
    mode: str = "auto",
    vocab_threshold: int = 500_000,
    join_partitions: int = 16,
) -> "ray.data.Dataset":
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    arXiv:1911.00359): train a unigram LM over the corpus in ONE
    distributed word-count pass, then score every document by its
    average per-token log-probability and perplexity.  Low-perplexity
    documents read like the corpus; high-perplexity documents are the
    noise a pretraining pipeline filters out — this is the canonical
    web-scale quality gate (C4/CCNet keep the low-ppl head).

    Exactness contract (shared verbatim with the SQL oracle):
    Laplace add-1 smoothing p(w) = (c(w)+1)/(N+V); each token
    contributes ``floor(1e6 * ln((c+1)/(N+V)))`` as an int64 micro-unit
    so the per-doc sum is ORDER-INDEPENDENT (the bm25_search trick);
    ``avg_logprob`` divides the two exact integers in one IEEE step and
    ``ppl = exp(-avg_logprob)`` is one shared libm call — bit-identical
    to DuckDB evaluating the same staged expression.

    Scale shape: the count pass is map-side Counter partials -> ONE
    ``groupby("word")`` shuffle producing the vocab-sized count table.
    Scoring broadcasts the per-word micro-unit table via ``ray.put``
    when the vocabulary fits (<= vocab_threshold) and otherwise
    hash-joins exploded (doc_id, word, tf) rows against the distributed
    count table (the tfidf_top_term auto-switch) — the vocabulary never
    materializes on the driver at web scale.  Reference scope: the
    collector has no data-plane scoring; this is a first-class
    training-data operator (SURVEY §2 'beyond the reference')."""
    import math
    from collections import Counter

    from ray.data.aggregate import Sum

    import ray

    def count_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.split(" "))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    cnt_ds = (
        _read_documents(sf_dir, ["text"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()  # vocab-sized; consumed 2-3x below
    )
    v_words = cnt_ds.count()
    n_tokens = int(cnt_ds.aggregate(Sum("c", alias_name="n"))["n"])
    denom = float(n_tokens + v_words)  # N + V, exact in a double

    def micro(c: int) -> int:
        # floor(1e6 * ln((c+1)/(N+V))): staged exactly as the oracle's
        # FLOOR(ln(CAST(c+1 AS DOUBLE) / CAST(n+v AS DOUBLE)) * 1000000.0)
        return math.floor(math.log((c + 1.0) / denom) * 1000000.0)

    def finalize(batch: pa.Table) -> pa.Table:
        lp = batch.column("logprob_micro").to_numpy(zero_copy_only=False)
        n = batch.column("n_words").to_numpy(zero_copy_only=False)
        avg = lp.astype(np.float64) / (n.astype(np.float64) * 1000000.0)
        # math.exp (libm) — np.exp's SIMD path differs from DuckDB's
        # std::exp by 1 ulp on ~8% of inputs (measured at sf0.001)
        ppl = [math.exp(-a) for a in avg.tolist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": batch.column("n_words"),
                "logprob_micro": batch.column("logprob_micro"),
                "avg_logprob": pa.array(avg, type=pa.float64()),
                "ppl": pa.array(ppl, type=pa.float64()),
            }
        )

    docs = _read_documents(sf_dir, ["doc_id", "text"])

    if mode == "auto":
        mode = "broadcast" if v_words <= vocab_threshold else "join"

    if mode == "broadcast":
        m = {r["word"]: micro(int(r["c"])) for r in cnt_ds.take_all()}
        m_ref = ray.put(m)

        def score(batch: pa.Table) -> pa.Table:
            mm = ray.get(m_ref)
            ids, n_words, lp = [], [], []
            for doc_id, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                ws = t.split(" ")
                ids.append(doc_id)
                n_words.append(len(ws))
                lp.append(sum(mm[w] for w in ws))
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_words": pa.array(n_words, type=pa.int64()),
                    "logprob_micro": pa.array(lp, type=pa.int64()),
                }
            )

        scored = docs.map_batches(score, batch_format="pyarrow")
        return scored.map_batches(finalize, batch_format="pyarrow").sort("doc_id")

    if mode != "join":
        raise ValueError(f"lm_perplexity: unknown mode {mode!r}")

    def explode(batch: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for w, c in Counter(t.split(" ")).items():
                ids.append(doc_id)
                words.append(w)
                tfs.append(c)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "word": pa.array(words, type=pa.string()),
                "tf": pa.array(tfs, type=pa.int64()),
            }
        )

    from ._join import safe_join

    joined = safe_join(
        docs.map_batches(explode, batch_format="pyarrow"),
        cnt_ds,
        join_type="inner",  # LM trained on the same corpus: every word hits
        num_partitions=join_partitions,
        on=("word",),
    )

    def contrib(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        # identical staging to micro(): double divide, ln, *1e6, floor
        m = np.floor(
            np.log((c.astype(np.float64) + 1.0) / denom) * 1000000.0
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": batch.column("tf"),
                "logprob_micro": pa.array(tf * m, type=pa.int64()),
            }
        )

    per_doc = (
        joined.map_batches(contrib, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("logprob_micro", alias_name="logprob_micro"),
        )
    )
    return per_doc.map_batches(finalize, batch_format="pyarrow").sort("doc_id")


def bpe_encode(
    sf_dir: str,
    n_merges: int = 40,
    min_freq: int = 2,
    merges: pa.Table | None = None,
) -> "ray.data.Dataset":
    """Distributed BPE tokenizer ENCODE: apply trained merge rules to
    the corpus (the GPT-2 algorithm — per word, repeatedly rewrite ALL
    occurrences of the lowest-rank adjacent pair in one left-to-right
    sweep until no trained pair remains).  Completes the token
    pipeline: bpe_train -> bpe_encode -> pack_sequences -> export.

    Scale shape: the merge table is n_merges-sized, so the rank map
    broadcasts ONCE via ``ray.put`` and the corpus streams through a
    single ``map_batches`` pass; a per-actor word->tokens memo makes
    the per-word cost amortize to a dict hit (Zipf: the head dominates)
    and is vocab-bounded, the same budget every symbolizer LRU already
    assumes.  Output is digest-style (doc_id, n_words, n_tokens,
    token_digest) — corpus-sized rows, constant row width, no token
    payload in the shuffle.  Rows-only driver check; the pytest gate
    pins equality with an independent single-process reference
    implementation of the published algorithm."""
    import ray

    if merges is None:
        merges = bpe_train(sf_dir, n_merges=n_merges, min_freq=min_freq)
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
        )
    }
    ranks_ref = ray.put(ranks)

    def encode_word(word: str, rk: dict, memo: dict) -> list[str]:
        hit = memo.get(word)
        if hit is not None:
            return hit
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            best = None
            for a, b in zip(syms, syms[1:]):
                r = rk.get((a, b))
                if r is not None and (best is None or r < best[0]):
                    best = (r, a, b)
            if best is None:
                break
            _, a, b = best
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    class EncodeStage:
        def __init__(self):
            self.rk = ray.get(ranks_ref)
            self.memo: dict = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, n_words, n_tokens, digests = [], [], [], []
            for doc_id, t in zip(
                batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
            ):
                ws = t.split(" ")
                toks: list[str] = []
                for w in ws:
                    toks.extend(encode_word(w, self.rk, self.memo))
                ids.append(doc_id)
                n_words.append(len(ws))
                n_tokens.append(len(toks))
                digests.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_words": pa.array(n_words, type=pa.int64()),
                    "n_tokens": pa.array(n_tokens, type=pa.int64()),
                    "token_digest": pa.array(digests, type=pa.string()),
                }
            )

    return (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(EncodeStage, batch_format="pyarrow", concurrency=(1, 8))
        .sort("doc_id")
    )


def stratified_sample(sf_dir: str, n_per_group: int = 25) -> pa.Table:
    """Exact fixed-size stratified sample: the ``n_per_group`` documents
    per language with the smallest (md5(text) hex, doc_id) key —
    content-keyed, so the sample is stable under re-partitioning and
    resumption (the ``hash_sample`` convention) but with an EXACT count
    per stratum instead of a rate.

    Ray shape: the classic distributed per-group top-N — every block
    keeps its LOCAL smallest-N per language (vectorized lexsort), so
    only ``N x n_blocks`` candidate rows per language reach the single
    ``groupby(lang)`` selection pass; the corpus itself never shuffles
    and no group is ever sorted whole."""
    ds = _read_documents(sf_dir, ["doc_id", "lang", "text"])

    def local_topn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = np.asarray(batch.column("lang").to_pylist())
        keys = np.array(
            [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        )
        keep = np.zeros(len(ids), dtype=bool)
        for lang in np.unique(langs):
            m = np.flatnonzero(langs == lang)
            order = np.lexsort((ids[m], keys[m]))[:n_per_group]
            keep[m[order]] = True
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "lang": pa.array(langs[keep], type=pa.string()),
                "h": pa.array(keys[keep], type=pa.string()),
            }
        )

    def final_topn(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        keys = np.asarray(group.column("h").to_pylist())
        order = np.lexsort((ids, keys))[:n_per_group]
        order.sort()
        return group.take(pa.array(order)).select(["doc_id", "lang"])

    rows = sorted(
        ds.map_batches(local_topn, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final_topn, batch_format="pyarrow")
        .take_all(),
        key=lambda r: (r["lang"], int(r["doc_id"])),
    )
    return pa.table(
        {
            "lang": pa.array([r["lang"] for r in rows], type=pa.string()),
            "doc_id": pa.array([int(r["doc_id"]) for r in rows], type=pa.int64()),
        }
    )


def pmi_collocations(
    sf_dir: str, min_count: int = 5, top_k: int = 50
) -> pa.Table:
    """Collocation extraction by pointwise mutual information over
    adjacent word bigrams — count-ratio PMI
    ``ln(c_xy * N_bigrams / (c_x * c_y))`` on exact integer counts,
    ``math.log`` per candidate (libm — DuckDB's ``ln``), tie-broken by
    (pmi DESC, w1, w2).

    Ray shape: per-block bigram AND unigram partial counts (map-side
    combine), two small groupbys; the ``min_count`` floor shrinks the
    bigram table to a candidate set whose WORDS alone are fetched from
    the unigram stream via a broadcast membership filter — so driver
    state is candidate-sized, never vocabulary-sized, and the corpus is
    read once."""
    import math

    from ray.data.aggregate import Sum as AggSum

    ds = _read_documents(sf_dir, ["text"])

    def bigram_partials(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for t in batch.column("text").to_pylist():
            ws = t.split(" ")
            for a, b in zip(ws, ws[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        return pa.table(
            {
                "w1": pa.array([k[0] for k in counts], type=pa.string()),
                "w2": pa.array([k[1] for k in counts], type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    def unigram_partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for w in t.split(" "):
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(counts), type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    bigrams = (
        ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(AggSum("n", alias_name="cxy"))
        .materialize()  # bigram-type-sized; read twice (total + filter)
    )
    n_bigrams = int(bigrams.sum("cxy") or 0)
    cand = [
        r
        for r in bigrams.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("cxy"), pa.scalar(min_count))),
            batch_format="pyarrow",
        ).take_all()
    ]
    words = {r["w1"] for r in cand} | {r["w2"] for r in cand}
    words_ref = ray.put(words)

    def member(batch: pa.Table) -> pa.Table:
        wanted = ray.get(words_ref)
        keep = [w in wanted for w in batch.column("word").to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    uni = {
        r["word"]: int(r["n"])
        for r in ds.map_batches(unigram_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(AggSum("n", alias_name="n"))
        .map_batches(member, batch_format="pyarrow")
        .take_all()
    }

    scored = []
    for r in cand:
        cxy, w1, w2 = int(r["cxy"]), r["w1"], r["w2"]
        pmi = math.log(
            (float(cxy) * float(n_bigrams)) / (float(uni[w1]) * float(uni[w2]))
        )
        scored.append((w1, w2, cxy, pmi))
    scored.sort(key=lambda s: (-s[3], s[0], s[1]))
    scored = scored[:top_k]
    return pa.table(
        {
            "w1": pa.array([s[0] for s in scored], type=pa.string()),
            "w2": pa.array([s[1] for s in scored], type=pa.string()),
            "n_pairs": pa.array([s[2] for s in scored], type=pa.int64()),
            "pmi": pa.array([s[3] for s in scored], type=pa.float64()),
        }
    )


def bigram_lm_perplexity(sf_dir: str, join_partitions: int = 16) -> "ray.data.Dataset":
    """Bigram (conditional) LM quality scoring — the order-sensitive
    extension of ``lm_perplexity``: train ``c(prev, w)`` and context
    counts ``c(prev)`` over the corpus in one distributed pass, then
    score each document by its average ``ln P(w | prev)`` with Laplace
    add-1 smoothing ``(c(prev,w)+1)/(c(prev)+V)``.

    Exactness contract (the ``lm_perplexity`` discipline, verbatim):
    each bigram contributes ``floor(1e6 * ln((c+1)/(cw+V)))`` as an
    int64 micro-unit — order-independent per-doc sums — and
    ``avg_logprob`` / ``ppl = exp(-avg)`` are the same staged IEEE +
    libm expressions as the SQL oracle.

    Scale shape: bigram counts come from map-side dict combiners ->
    ONE ``groupby(w1, w2)``; context counts DERIVE from that table
    (``groupby(w1)`` over the vocab²-bounded counts — no second corpus
    pass); scoring hash-joins the exploded (doc_id, w1, w2) stream
    against the two count tables with ``safe_join`` (each join in its
    own executed plan), so neither table ever materializes on the
    driver.  Scoring the training corpus itself means every lookup
    hits (inner joins are exact); held-out scoring would switch to
    left joins with c=0 defaults."""
    import math

    from ray.data.aggregate import Count as AggCount
    from ray.data.aggregate import Sum as AggSum

    from ._join import safe_join

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def bigram_rows(batch: pa.Table) -> pa.Table:
        dids, w1s, w2s = [], [], []
        ids = batch.column("doc_id").to_pylist()
        for did, t in zip(ids, batch.column("text").to_pylist()):
            ws = t.split(" ")
            for a, b in zip(ws, ws[1:]):
                dids.append(did)
                w1s.append(a)
                w2s.append(b)
        return pa.table(
            {
                "doc_id": pa.array(dids, type=pa.int64()),
                "w1": pa.array(w1s, type=pa.string()),
                "w2": pa.array(w2s, type=pa.string()),
            }
        )

    def bigram_partials(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for t in batch.column("text").to_pylist():
            ws = t.split(" ")
            for a, b in zip(ws, ws[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        return pa.table(
            {
                "w1": pa.array([k[0] for k in counts], type=pa.string()),
                "w2": pa.array([k[1] for k in counts], type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    def word_partials(batch: pa.Table) -> pa.Table:
        words = set()
        for t in batch.column("text").to_pylist():
            words.update(t.split(" "))
        return pa.table({"word": pa.array(sorted(words), type=pa.string())})

    bc = (
        ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(AggSum("n", alias_name="c"))
        .materialize()  # vocab²-bounded; feeds ctx AND the score join
    )
    ctx = (
        bc.groupby("w1")
        .aggregate(AggSum("c", alias_name="cw"))
        .map_batches(
            lambda b: pa.table({"cw_w1": b.column("w1"), "cw": b.column("cw")}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    v_total = int(
        ds.map_batches(word_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(AggCount(alias_name="_n"))
        .count()
    )

    scored = safe_join(
        ds.map_batches(bigram_rows, batch_format="pyarrow"),
        bc,
        join_type="inner",
        num_partitions=join_partitions,
        on=("w1", "w2"),
    ).materialize()
    scored = safe_join(
        scored,
        ctx,
        join_type="inner",
        num_partitions=join_partitions,
        on=("w1",),
        right_on=("cw_w1",),
    )

    def micro(batch: pa.Table) -> pa.Table:
        cs = batch.column("c").to_pylist()
        cws = batch.column("cw").to_pylist()
        vals = [
            int(
                math.floor(
                    1e6 * math.log(float(c + 1) / float(cw + v_total))
                )
            )
            for c, cw in zip(cs, cws)
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "micro": pa.array(vals, type=pa.int64()),
            }
        )

    agg = (
        scored.map_batches(micro, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(AggSum("micro", alias_name="m"), AggCount(alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        ms = batch.column("m").to_pylist()
        ns = batch.column("n").to_pylist()
        avg = [(float(m) / 1e6) / n for m, n in zip(ms, ns)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array([int(n) for n in ns], type=pa.int64()),
                "avg_logprob": pa.array(avg, type=pa.float64()),
                "ppl": pa.array([math.exp(-a) for a in avg], type=pa.float64()),
            }
        )

    from .streaming import _compact_sort

    return _compact_sort(agg.map_batches(finish, batch_format="pyarrow"), "doc_id")


def top_terms_by_source(sf_dir: str, k: int = 5) -> pa.Table:
    """Grouped top-k terms: the ``k`` most frequent words per document
    source, ranked (n DESC, word ASC) — the per-stratum variant of
    ``top_ngrams``.  Ray shape: map-side (source, word) combiners ->
    ONE vocab x sources groupby -> per-block LOCAL top-k prune (only
    k x blocks candidate rows per source survive) -> per-source final
    selection; the full count table never converges on one node, the
    same distributed top-N discipline as ``stratified_sample``."""
    from collections import Counter

    from ray.data.aggregate import Sum as AggSum

    ds = _read_documents(sf_dir, ["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s, t in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            for w in t.split(" "):
                c[(s, w)] += 1
        ks = list(c.keys())
        return pa.table(
            {
                "source": pa.array([x[0] for x in ks], type=pa.string()),
                "word": pa.array([x[1] for x in ks], type=pa.string()),
                "n": pa.array([c[x] for x in ks], type=pa.int64()),
            }
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        srcs = np.asarray(batch.column("source").to_pylist())
        keep = np.zeros(len(batch), dtype=bool)
        words = np.asarray(batch.column("word").to_pylist())
        ns = batch.column("n").to_numpy(zero_copy_only=False)
        for s in np.unique(srcs):
            m = np.flatnonzero(srcs == s)
            order = np.lexsort((words[m], -ns[m]))[:k]
            keep[m[order]] = True
        return batch.filter(pa.array(keep))

    def final_topk(group: pa.Table) -> pa.Table:
        words = np.asarray(group.column("word").to_pylist())
        ns = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((words, -ns))[:k]
        out = group.take(pa.array(order))
        return out.append_column(
            "rnk", pa.array(np.arange(1, len(out) + 1), type=pa.int64())
        )

    rows = sorted(
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["source", "word"])
        .aggregate(AggSum("n", alias_name="n"))
        .map_batches(local_topk, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_topk, batch_format="pyarrow")
        .take_all(),
        key=lambda r: (r["source"], int(r["rnk"])),
    )
    return pa.table(
        {
            "source": pa.array([r["source"] for r in rows], type=pa.string()),
            "word": pa.array([r["word"] for r in rows], type=pa.string()),
            "n": pa.array([int(r["n"]) for r in rows], type=pa.int64()),
            "rnk": pa.array([int(r["rnk"]) for r in rows], type=pa.int64()),
        }
    )


def source_divergence(sf_dir: str) -> pa.Table:
    """Per-source vocabulary divergence: for each document source,
    ``Σ_{w∈source} p(w|s) · ln(p(w|s) / q(w))`` over the words PRESENT
    in the source, with ``q`` the add-1-smoothed corpus distribution —
    the distribution-drift score a mixture pipeline watches per shard
    (a coverage-restricted KL; absent-word mass is deliberately
    excluded and the restriction is part of the contract).

    Exactness: integer counts everywhere; each word's contribution is
    ``floor(1e9 · p · ln(p/q))`` (libm, per value) so per-source sums
    are order-independent int64; the final score divides the two exact
    integers once.  Shape: two count groupbys (map-side combined), ONE
    ``safe_join`` of the sparse (source, word) table against the
    corpus-vocab counts, and a source-count-sized final fold."""
    import math

    from collections import Counter

    from ray.data.aggregate import Sum as AggSum

    from ._join import safe_join

    ds = _read_documents(sf_dir, ["source", "text"])

    def sw_partials(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s, t in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            for w in t.split(" "):
                c[(s, w)] += 1
        ks = list(c.keys())
        return pa.table(
            {
                "source": pa.array([x[0] for x in ks], type=pa.string()),
                "word": pa.array([x[1] for x in ks], type=pa.string()),
                "c_sw": pa.array([c[x] for x in ks], type=pa.int64()),
            }
        )

    sw = (
        ds.map_batches(sw_partials, batch_format="pyarrow")
        .groupby(["source", "word"])
        .aggregate(AggSum("c_sw", alias_name="c_sw"))
        .materialize()
    )
    vocab = (
        sw.groupby("word")
        .aggregate(AggSum("c_sw", alias_name="c_w"))
        .map_batches(
            lambda b: pa.table({"vw": b.column("word"), "c_w": b.column("c_w")}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    v_total = vocab.count()
    n_total = int(vocab.sum("c_w") or 0)
    n_s = {
        r["source"]: int(r["c_sw"])
        for r in sw.groupby("source").aggregate(AggSum("c_sw", alias_name="c_sw")).take_all()
    }
    ns_ref = ray.put(n_s)

    joined = safe_join(
        sw, vocab, join_type="inner", num_partitions=8, on=("word",), right_on=("vw",)
    )

    def terms(batch: pa.Table) -> pa.Table:
        ns = ray.get(ns_ref)
        out = []
        for s, c_sw, c_w in zip(
            batch.column("source").to_pylist(),
            batch.column("c_sw").to_pylist(),
            batch.column("c_w").to_pylist(),
        ):
            p = float(c_sw) / float(ns[s])
            q = float(c_w + 1) / float(n_total + v_total)
            out.append(int(math.floor(1e9 * (p * math.log(p / q)))))
        return pa.table(
            {
                "source": batch.column("source"),
                "micro": pa.array(out, type=pa.int64()),
            }
        )

    rows = sorted(
        joined.map_batches(terms, batch_format="pyarrow")
        .groupby("source")
        .aggregate(AggSum("micro", alias_name="m"))
        .take_all(),
        key=lambda r: r["source"],
    )
    return pa.table(
        {
            "source": pa.array([r["source"] for r in rows], type=pa.string()),
            "divergence": pa.array(
                [float(int(r["m"])) / 1e9 for r in rows], type=pa.float64()
            ),
        }
    )


def length_diversity_correlation(sf_dir: str) -> pa.Table:
    """Corpus-level Pearson correlation between document length
    (n_chars) and lexical diversity (distinct word count) — the
    two-variable extension of the integer-sufficient-statistics
    pattern (``type_value_trend``): one streaming pass emits per-block
    (n, Σx, Σy, Σxy, Σx², Σy²) int64 partials, the driver reduces in
    arbitrary-precision Python ints, and r is ONE staged IEEE
    expression — num / (sqrt(a)·sqrt(b)) — where IEEE-754 sqrt is
    correctly rounded, so libm and DuckDB agree always."""
    import math

    ds = _read_documents(sf_dir, ["n_chars", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.array(
            [len(set(t.split(" "))) for t in batch.column("text").to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sy": pa.array([int(y.sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                "syy": pa.array([int((y * y).sum())], type=pa.int64()),
            }
        )

    n = sx = sy = sxy = sxx = syy = 0
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n += int(r["n"]); sx += int(r["sx"]); sy += int(r["sy"])
        sxy += int(r["sxy"]); sxx += int(r["sxx"]); syy += int(r["syy"])
    num = n * sxy - sx * sy
    a = n * sxx - sx * sx
    b = n * syy - sy * sy
    r_val = (
        None
        if a == 0 or b == 0
        else float(num) / (math.sqrt(float(a)) * math.sqrt(float(b)))
    )
    return pa.table(
        {
            "n_docs": pa.array([n], type=pa.int64()),
            "pearson_r": pa.array([r_val], type=pa.float64()),
        }
    )


def vocab_growth(sf_dir: str) -> pa.Table:
    """Heaps-law vocabulary growth curve: cumulative distinct words and
    cumulative tokens after each document (in doc_id order) — the
    corpus-diversity diagnostic behind dedup ROI estimates.  The
    sequential-looking prefix is computed FULLY distributed: a word's
    first occurrence is ``min(doc_id)`` over one word groupby, so
    cumulative distinct at doc d = count of words with first_doc <= d —
    a doc-keyed count groupby plus a prefix sum over the doc-count-
    sized series (driver here; the bucketed-partial prefix of
    ``watermarked_window_counts`` is the >memory path).  Token counts
    prefix the same way.  All integers."""
    from collections import Counter

    from ray.data.aggregate import Count as AggCount
    from ray.data.aggregate import Min as AggMin

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def word_firsts(batch: pa.Table) -> pa.Table:
        first: dict[str, int] = {}
        ntok: Counter = Counter()
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = t.split(" ")
            ntok[did] += len(ws)
            for w in ws:
                if w not in first or did < first[w]:
                    first[w] = did
        return pa.table(
            {
                "word": pa.array(list(first), type=pa.string()),
                "first_doc": pa.array(list(first.values()), type=pa.int64()),
            }
        )

    firsts = (
        ds.map_batches(word_firsts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(AggMin("first_doc", alias_name="first_doc"))
    )
    new_words = {
        int(r["first_doc"]): int(r["n"])
        for r in firsts.groupby("first_doc")
        .aggregate(AggCount(alias_name="n"))
        .take_all()
    }

    def tok_counts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tok": pa.array(
                    [len(t.split(" ")) for t in batch.column("text").to_pylist()],
                    type=pa.int64(),
                ),
            }
        )

    toks = {
        int(r["doc_id"]): int(r["n_tok"])
        for r in ds.map_batches(tok_counts, batch_format="pyarrow").take_all()
    }
    doc_ids = sorted(toks)
    cum_v = cum_t = 0
    vs, ts_ = [], []
    for d in doc_ids:
        cum_v += new_words.get(d, 0)
        cum_t += toks[d]
        vs.append(cum_v)
        ts_.append(cum_t)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "cum_tokens": pa.array(ts_, type=pa.int64()),
            "cum_distinct_words": pa.array(vs, type=pa.int64()),
        }
    )

"""The stateful symbolizer actor-pool stage (SURVEY.md §2.4, §7.2).

``SymbolicatorChain`` is a callable CLASS passed to
``ds.map_batches(SymbolicatorChain, concurrency=N, batch_size=B,
batch_format="pyarrow")``: stores, LRU caches and processor objects are
built ONCE per actor in ``__init__`` (the distributed analogue of the
reference collector's per-processor-instance state); ``__call__``
decodes a zero-copy Arrow batch, runs each record through the processor
chain (dsym -> proguard -> sourcemap, mirroring the reference's
config.yaml pipelines), re-encodes tokens, and emits routing/counter
columns for the per-sink aggregate shuffle.
"""

from __future__ import annotations

from dataclasses import asdict

import pyarrow as pa

from ..codec import _dumps, _list_buffers, _loads, encode_batch_payloads
from ..config import DsymConfig, PipelineConfig, ProguardConfig, SourceMapConfig
from ..sources.stores import DsymStore, ProguardStore, SourceMapStore, make_store
from .dsym_processor import DsymLogsProcessor, DsymSymbolicator
from .js_processor import JsLogProcessor, JsSymbolicator, ProcessStats
from .proguard_processor import ProguardLogProcessor, ProguardSymbolicator

SINK_JS = "js"
SINK_ANDROID = "android"
SINK_APPLE = "apple"
SINK_UNSYMBOLICATED = "unsymbolicated"

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("sink", pa.string()),
        ("symbolicator_failed", pa.bool_()),
        ("frames_processed", pa.int32()),
        ("frames_failed", pa.int32()),
        ("fetch_failures", pa.int32()),
        # Telemetry parity with the reference's processor_symbolication_duration
        # histogram (sourcemapprocessor/metadata.yaml:27-35): per-record wall
        # seconds spent in the chain; aggregated as a Sum downstream.
        ("symbolication_duration", pa.float64()),
    ]
)


def config_to_dict(cfg: PipelineConfig) -> dict:
    return asdict(cfg)


def config_from_dict(d: dict) -> PipelineConfig:
    d = dict(d)
    d["dsym"] = DsymConfig(**d["dsym"])
    d["proguard"] = ProguardConfig(**d["proguard"])
    d["sourcemap"] = SourceMapConfig(**d["sourcemap"])
    return PipelineConfig(**d)


SUMMARY_SCHEMA = pa.schema(
    [
        ("sink", pa.string()),
        ("rows", pa.int64()),
        ("failed_rows", pa.int64()),
        ("frames_processed", pa.int64()),
        ("frames_failed", pa.int64()),
        ("fetch_failures", pa.int64()),
        # Sum-type duration + gauge-type cache sizes, mirroring the reference
        # metric catalog (sourcemapprocessor/metadata.yaml:16-60,
        # dsymprocessor/documentation.md cache-size gauges).  Gauges are the
        # actor's positive-LRU entry counts at batch end and aggregate with
        # max, not sum.
        ("symbolication_duration", pa.float64()),
        # Histogram parity: per-record duration bucket counts (the
        # reference metric is a histogram, metadata.yaml:27-35); buckets
        # chosen around the measured per-record cost (~0.05 ms).
        ("dur_le_100us", pa.int64()),
        ("dur_le_1ms", pa.int64()),
        ("dur_le_10ms", pa.int64()),
        ("dur_gt_10ms", pa.int64()),
        ("sourcemap_cache_size", pa.int64()),
        ("proguard_cache_size", pa.int64()),
        ("dsym_cache_size", pa.int64()),
        ("token_hash", pa.int64()),
        ("file", pa.string()),
    ]
)

# Summary keys that are gauges (aggregate with max); everything else sums.
GAUGE_KEYS = ("sourcemap_cache_size", "proguard_cache_size", "dsym_cache_size")

DURATION_BUCKETS = ("dur_le_100us", "dur_le_1ms", "dur_le_10ms", "dur_gt_10ms")


def _duration_hist(col) -> dict[str, int]:
    """Bucket counts for the symbolication-duration histogram (bounds
    1e-4 / 1e-3 / 1e-2 seconds)."""
    import numpy as np

    d = col.combine_chunks().to_numpy(zero_copy_only=False)
    edges = np.array([1e-4, 1e-3, 1e-2])
    idx = np.searchsorted(edges, d, side="left")
    counts = np.bincount(idx, minlength=4)
    return dict(zip(DURATION_BUCKETS, (int(c) for c in counts)))


class SymbolicatorChain:
    """output_mode="rows" returns the full routed-row batch (tests,
    routed-row queries).  output_mode="write" additionally FUSES the
    per-sink parquet write + map-side aggregation into the actor: each
    batch is written to <output_dir>/<sink>/part-<tag>-<uuid>.parquet
    and only a tiny per-sink summary leaves the actor — at scale this
    keeps the bulk token payloads out of the object store entirely
    (write-at-the-end-of-the-fused-stage; SURVEY.md §4)."""

    def __init__(
        self,
        cfg: dict | PipelineConfig,
        output_mode: str = "rows",
        output_dir: str | None = None,
        shard_tag: str = "00000",
    ) -> None:
        if isinstance(cfg, dict):
            cfg = config_from_dict(cfg)
        self.cfg = cfg
        self.output_mode = output_mode
        self.output_dir = output_dir
        self.shard_tag = shard_tag

        dsym_cfg = cfg.dsym
        self.dsym_stats = ProcessStats()
        self.dsym = DsymLogsProcessor(
            cfg=dsym_cfg,
            symbolicator=DsymSymbolicator(
                make_store(
                    dsym_cfg.dsym_store,
                    dsym_cfg.local_path,
                    DsymStore,
                    bucket=dsym_cfg.bucket,
                    region=dsym_cfg.region,
                    prefix=dsym_cfg.store_prefix,
                ),
                timeout=dsym_cfg.timeout,
                cache_size=dsym_cfg.dsym_cache_size,
            ),
            stats=self.dsym_stats,
        )
        pg_cfg = cfg.proguard
        self.proguard_stats = ProcessStats()
        self.proguard = ProguardLogProcessor(
            cfg=pg_cfg,
            symbolicator=ProguardSymbolicator(
                make_store(
                    pg_cfg.proguard_store,
                    pg_cfg.local_path,
                    ProguardStore,
                    bucket=pg_cfg.bucket,
                    region=pg_cfg.region,
                    prefix=pg_cfg.store_prefix,
                ),
                timeout=pg_cfg.timeout,
                cache_size=pg_cfg.proguard_cache_size,
            ),
            stats=self.proguard_stats,
        )
        js_cfg = cfg.sourcemap
        self.js_stats = ProcessStats()
        self.js = JsLogProcessor(
            cfg=js_cfg,
            symbolicator=JsSymbolicator(
                make_store(
                    js_cfg.source_map_store,
                    js_cfg.local_path,
                    SourceMapStore,
                    bucket=js_cfg.bucket,
                    region=js_cfg.region,
                    prefix=js_cfg.store_prefix,
                ),
                timeout=js_cfg.timeout,
                cache_size=js_cfg.source_map_cache_size,
            ),
            stats=self.js_stats,
        )

        # collector service.pipelines parity: a processor absent from
        # every configured pipeline never touches a record
        _en = getattr(cfg, "enabled_processors", None)
        self.enabled = set(_en if _en is not None else ["dsym", "proguard", "sourcemap"])

        if cfg.shared_artifact_cache:
            # Cross-actor single-flight (reference: singleflight.Group in
            # sourcemapprocessor/symbolicator.go:70-88 and twins): wrap
            # each store's raw fetch with the shared named-actor cache.
            from ..state.artifact_cache import get_or_create_coordinators, single_flight_fetch

            coordinators = get_or_create_coordinators(cfg.artifact_cache_shards)
            for sym in (self.dsym.symbolicator, self.proguard.symbolicator, self.js.symbolicator):
                sym.store.fetch = single_flight_fetch(sym.store.fetch, coordinators)

    def process_record(self, record: dict) -> tuple[str, bool, int, int, int]:
        """Run the chain on one decoded record (mutating it in place).
        Returns (sink, failed, frames_processed, frames_failed,
        fetch_failures)."""
        event_name = record.get("event_name", "")
        attrs = record.setdefault("attributes", {})
        resource = record.setdefault("resource_attributes", {})

        fp0 = self.dsym_stats.frames_processed + self.proguard_stats.frames_processed + self.js_stats.frames_processed
        ff0 = self.dsym_stats.frames_failed + self.proguard_stats.frames_failed + self.js_stats.frames_failed
        fetch0 = (
            self.dsym.symbolicator.fetch_failures
            + self.proguard.symbolicator.fetch_failures
            + self.js.symbolicator.fetch_failures
        )

        sink = SINK_UNSYMBOLICATED
        failed = False
        if isinstance(record.get("events"), list):
            # Trace span record: the reference's traces pipeline runs only
            # the sourcemap processor, over the span's own attributes AND
            # each span event's attributes independently
            # (sourcemapprocessor/processor.go:70-85, config.yaml:23-27).
            js_on = "sourcemap" in self.enabled
            processed = js_on and self.js.process_attributes(attrs, resource)
            for event in record["events"]:
                ev_attrs = event.setdefault("attributes", {})
                if js_on and self.js.process_attributes(ev_attrs, resource):
                    processed = True
                failed = failed or bool(ev_attrs.get("exception.symbolicator.failed", False))
            if processed:
                sink = SINK_JS
            failed = failed or bool(attrs.get("exception.symbolicator.failed", False))
        else:
            # Log record: chain order mirrors the reference collector's
            # logs pipeline (config.yaml:28-31) with the traces-pipeline
            # sourcemap processor appended; disjoint language allowlists
            # make the routes exclusive.
            if "dsym" in self.enabled and self.dsym.process_record(event_name, attrs, resource):
                sink = SINK_APPLE
            if "proguard" in self.enabled and self.proguard.process_attributes(attrs, resource):
                sink = SINK_ANDROID
            if "sourcemap" in self.enabled and self.js.process_attributes(attrs, resource):
                sink = SINK_JS

            if sink != SINK_UNSYMBOLICATED:
                failed = bool(attrs.get("exception.symbolicator.failed", False))

        fp = (
            self.dsym_stats.frames_processed
            + self.proguard_stats.frames_processed
            + self.js_stats.frames_processed
            - fp0
        )
        ff = (
            self.dsym_stats.frames_failed
            + self.proguard_stats.frames_failed
            + self.js_stats.frames_failed
            - ff0
        )
        fetch = (
            self.dsym.symbolicator.fetch_failures
            + self.proguard.symbolicator.fetch_failures
            + self.js.symbolicator.fetch_failures
            - fetch0
        )
        return sink, failed, fp, ff, fetch

    def cache_gauges(self) -> dict[str, int]:
        """Positive-LRU entry counts (the reference's cache-size gauges)."""
        return {
            "sourcemap_cache_size": len(self.js.symbolicator.cache),
            "proguard_cache_size": len(self.proguard.symbolicator.cache),
            "dsym_cache_size": len(self.dsym.symbolicator.cache),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        from time import perf_counter

        offsets, data = _list_buffers(batch.column("tokens"))
        sinks, faileds, fps, ffs, fetches, durs = [], [], [], [], [], []
        payloads: list[bytes] = []
        for i in range(len(offsets) - 1):
            raw = data[offsets[i]: offsets[i + 1]]
            record = _loads(raw)
            t0 = perf_counter()
            sink, failed, fp, ff, fetch = self.process_record(record)
            durs.append(perf_counter() - t0)
            # Untouched records keep their original payload bytes —
            # re-encoding is skipped (the codec is canonical, so the
            # bytes would be identical anyway).
            payloads.append(raw if sink == SINK_UNSYMBOLICATED else _dumps(record))
            sinks.append(sink)
            faileds.append(failed)
            fps.append(fp)
            ffs.append(ff)
            fetches.append(fetch)

        tokens, n_tok = encode_batch_payloads(payloads)
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "tokens": tokens,
                "n_tok": n_tok,
                "source": batch.column("source"),
                "sink": pa.array(sinks, type=pa.string()),
                "symbolicator_failed": pa.array(faileds, type=pa.bool_()),
                "frames_processed": pa.array(fps, type=pa.int32()),
                "frames_failed": pa.array(ffs, type=pa.int32()),
                "fetch_failures": pa.array(fetches, type=pa.int32()),
                "symbolication_duration": pa.array(durs, type=pa.float64()),
            },
            schema=OUTPUT_SCHEMA,
        )
        if self.output_mode == "rows":
            return out
        return write_sink_partitions(out, self.output_dir, self.shard_tag, self.cache_gauges())


class SymbolicatorChainFromFiles(SymbolicatorChain):
    """Fully-fused variant: consumes a Dataset of parquet fragment
    descriptors ({path, row_group}) and performs read -> decode ->
    symbolicate -> per-sink write inside the actor, so neither the input
    token blocks nor the routed outputs ever transit the object store —
    only per-fragment summary rows do.  This is the
    memory-bandwidth-optimal layout for the 100 TB path; the fragment
    list is the partition/resume unit."""

    def __call__(self, batch) -> pa.Table:  # batch: {"path": [...], "row_group": [...]}
        import pyarrow.parquet as pq

        paths = list(batch["path"])
        row_groups = list(batch["row_group"])
        # Multi-shard mode (run_checkpointed pipelined path): each
        # fragment descriptor carries its OWN shard tag, so one warm
        # actor pool serves every shard in a single Dataset execution;
        # summaries gain (shard_tag, frag) columns the driver uses for
        # streaming per-shard manifest commits.
        tags = list(batch["shard_tag"]) if "shard_tag" in batch else None
        summaries = []
        for i, (path, rg) in enumerate(zip(paths, row_groups)):
            if tags is not None:
                self.shard_tag = tags[i]
            pf = pq.ParquetFile(path)
            table = pf.read_row_group(int(rg))
            frag_summaries = []
            for lo in range(0, table.num_rows, self.cfg.batch_size):
                sub = table.slice(lo, self.cfg.batch_size)
                frag_summaries.append(SymbolicatorChain.__call__(self, sub))
            # frag_rows = this fragment's TOTAL summary-row count: the
            # driver marks a fragment done only once all of them arrive,
            # so a commit can never act on a Ray-split partial block
            frag_rows = sum(t.num_rows for t in frag_summaries)
            for t in frag_summaries:
                if tags is not None:
                    t = t.append_column(
                        "shard_tag", pa.array([tags[i]] * t.num_rows, type=pa.string())
                    ).append_column(
                        "frag", pa.array([f"{path}:{rg}"] * t.num_rows, type=pa.string())
                    ).append_column(
                        "frag_rows", pa.array([frag_rows] * t.num_rows, type=pa.int64())
                    )
                summaries.append(t)
        if summaries:
            return pa.concat_tables(summaries)
        empty = pa.Table.from_pylist([], schema=SUMMARY_SCHEMA)
        if tags is not None:
            empty = (
                empty.append_column("shard_tag", pa.array([], type=pa.string()))
                .append_column("frag", pa.array([], type=pa.string()))
                .append_column("frag_rows", pa.array([], type=pa.int64()))
            )
        return empty


def write_sink_partitions(
    out: pa.Table, output_dir: str, shard_tag: str, gauges: dict[str, int] | None = None
) -> pa.Table:
    """Split a routed batch by sink, write each split as a parquet part
    file, and return the per-sink summary rows (the only data that
    reaches the driver / downstream aggregate).  ``gauges`` carries the
    actor's cache-size gauges into every summary row."""
    import os
    import uuid as uuidlib
    import zlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    gauges = gauges or {k: 0 for k in GAUGE_KEYS}
    part = uuidlib.uuid4().hex[:12]
    rows = []
    sink_col = out.column("sink")
    for sink_val in sorted(set(sink_col.to_pylist())):
        sub = out.filter(pc.equal(sink_col, sink_val))
        sink_dir = os.path.join(output_dir, sink_val)
        os.makedirs(sink_dir, exist_ok=True)
        path = os.path.join(sink_dir, f"part-{shard_tag}-{part}.parquet")
        # zstd-1 beats snappy on token arrays BOTH ways (measured on a
        # real sink part: 173->108 KiB and ~40% less encode CPU), and
        # the sink write is the pipeline's dominant disk consumer —
        # at 100 TB the sinks are storage-bound, so the smaller codec
        # is the scale choice, not a micro-tweak
        pq.write_table(sub, path, compression="zstd", compression_level=1)

        token_hash = 0
        col = sub.column("tokens").combine_chunks()
        offsets = col.offsets.to_numpy()
        values = pc.cast(col.values, pa.uint8(), safe=False).to_numpy(zero_copy_only=False).tobytes()
        for i, doc_id in enumerate(sub.column("doc_id").to_pylist()):
            payload = doc_id.encode() + values[offsets[i]: offsets[i + 1]]
            token_hash = (token_hash + zlib.crc32(payload)) % (1 << 61)

        rows.append(
            {
                "sink": sink_val,
                "rows": sub.num_rows,
                "failed_rows": int(pc.sum(pc.cast(sub.column("symbolicator_failed"), pa.int64())).as_py() or 0),
                "frames_processed": int(pc.sum(sub.column("frames_processed")).as_py() or 0),
                "frames_failed": int(pc.sum(sub.column("frames_failed")).as_py() or 0),
                "fetch_failures": int(pc.sum(sub.column("fetch_failures")).as_py() or 0),
                "symbolication_duration": float(pc.sum(sub.column("symbolication_duration")).as_py() or 0.0),
                **_duration_hist(sub.column("symbolication_duration")),
                **{k: int(gauges.get(k, 0)) for k in GAUGE_KEYS},
                "token_hash": token_hash,
                "file": path,
            }
        )
    return pa.Table.from_pylist(rows, schema=SUMMARY_SCHEMA)

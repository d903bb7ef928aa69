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

from ..codec import decode_batch_tokens, encode_batch_records
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


class SymbolicatorChain:
    def __init__(self, cfg: dict | PipelineConfig) -> None:
        if isinstance(cfg, dict):
            cfg = config_from_dict(cfg)
        self.cfg = cfg

        dsym_cfg = cfg.dsym
        self.dsym_stats = ProcessStats()
        self.dsym = DsymLogsProcessor(
            cfg=dsym_cfg,
            symbolicator=DsymSymbolicator(
                make_store(dsym_cfg.dsym_store, dsym_cfg.local_path, DsymStore),
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
                make_store(pg_cfg.proguard_store, pg_cfg.local_path, ProguardStore),
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
                make_store(js_cfg.source_map_store, js_cfg.local_path, SourceMapStore),
                timeout=js_cfg.timeout,
                cache_size=js_cfg.source_map_cache_size,
            ),
            stats=self.js_stats,
        )

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
        # Chain order mirrors the reference collector's logs pipeline
        # (config.yaml:28-31) with the traces-pipeline sourcemap processor
        # appended; disjoint language allowlists make the routes exclusive.
        if self.dsym.process_record(event_name, attrs, resource):
            sink = SINK_APPLE
        if self.proguard.process_attributes(attrs, resource):
            sink = SINK_ANDROID
        if self.js.process_attributes(attrs, resource):
            sink = SINK_JS

        failed = False
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        records = decode_batch_tokens(batch)
        sinks, faileds, fps, ffs, fetches = [], [], [], [], []
        for record in records:
            sink, failed, fp, ff, fetch = self.process_record(record)
            sinks.append(sink)
            faileds.append(failed)
            fps.append(fp)
            ffs.append(ff)
            fetches.append(fetch)

        tokens, n_tok = encode_batch_records(records)
        return pa.table(
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
            },
            schema=OUTPUT_SCHEMA,
        )

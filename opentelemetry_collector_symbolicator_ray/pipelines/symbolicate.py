"""The flagship routed symbolication pipeline (SURVEY.md §3.4, §7.1).

    read_parquet -> [salted routing-key repartition] ->
    map_batches(SymbolicatorChain actor pool) ->
    per-sink parquet writers + groupby("sink") aggregate,
    with per-shard checkpoint lineage (state/checkpoint.py).

Everything streams: the only driver-side materialization is the tiny
per-batch writer summaries and the 4-row aggregate table.
"""

from __future__ import annotations

import glob
import os
import re
import zlib

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..codec import _list_buffers
from ..config import PipelineConfig
from ..stages.symbolicate_stage import (
    SymbolicatorChain,
    config_to_dict,
)

SINKS = ("js", "android", "apple", "unsymbolicated")

# Telemetry columns mirroring the reference's metric catalog
# (sourcemapprocessor/metadata.yaml:16-60): wall-clock duration sums and
# cache-size gauges.  They are real measurements, hence nondeterministic —
# strip them when comparing two runs' aggregates for semantic equality.
TELEMETRY_KEYS = (
    "symbolication_duration",
    "dur_le_100us",
    "dur_le_1ms",
    "dur_le_10ms",
    "dur_gt_10ms",
    "sourcemap_cache_size",
    "proguard_cache_size",
    "dsym_cache_size",
)


def drop_telemetry(obj):
    """Remove nondeterministic telemetry keys from aggregate output —
    accepts a list of row dicts (per_sink_aggregates/.to_pylist()) or a
    {sink: counters} dict (run_checkpointed / CLI aggregates)."""
    if isinstance(obj, list):
        return [{k: v for k, v in row.items() if k not in TELEMETRY_KEYS} for row in obj]
    return {
        sink: {k: v for k, v in counters.items() if k not in TELEMETRY_KEYS}
        for sink, counters in obj.items()
    }


# Driver-owned handles keeping the shared artifact-cache coordinators
# alive for the session (a named actor created inside a pool worker
# would die with the pool).  Keyed by shard count: pipelines with
# different shardings each keep their own named-actor set alive.
_ARTIFACT_COORDINATORS: dict[int, list] = {}


def _ensure_artifact_coordinator(cfg: PipelineConfig) -> None:
    if cfg.shared_artifact_cache and cfg.artifact_cache_shards not in _ARTIFACT_COORDINATORS:
        from ..state.artifact_cache import get_or_create_coordinators

        _ARTIFACT_COORDINATORS[cfg.artifact_cache_shards] = get_or_create_coordinators(
            cfg.artifact_cache_shards
        )


def symbolicate(ds: "ray.data.Dataset", cfg: PipelineConfig, *, salted: bool = False) -> "ray.data.Dataset":
    """Attach the symbolizer actor-pool stage to a token Dataset."""
    _ensure_artifact_coordinator(cfg)
    if salted:
        ds = salted_repartition(ds, cfg)
    # (The chain's output schema intentionally omits the routing_shard
    # helper column, so no post-projection is needed.)
    return ds.map_batches(
        SymbolicatorChain,
        fn_constructor_args=(config_to_dict(cfg),),
        concurrency=cfg.concurrency,
        batch_size=cfg.batch_size,
        batch_format="pyarrow",
    )


# The routing key is extracted from the RAW canonical-JSON payload with
# compiled byte regexes (priority order mirroring _record-dict lookup:
# build_uuid > proguard_uuid > source_map_uuid > sdk language) — no
# second token decode on the routing path; the chain actor performs the
# only full decode.  Any deterministic payload->key function preserves
# cache affinity, and detection + routing share THIS one.
_DEBUG_ID_PATTERNS = tuple(
    re.compile(rb'"' + key + rb'":"([^"]*)"')
    for key in (
        rb"app\.debug\.build_uuid",
        rb"app\.debug\.proguard_uuid",
        rb"app\.debug\.source_map_uuid",
        rb"telemetry\.sdk\.language",
    )
)


def _payload_debug_id(raw) -> bytes:
    for pat in _DEBUG_ID_PATTERNS:
        m = pat.search(raw)
        if m:
            return m.group(1)
    return b""


def _routing_key_batch(
    batch: pa.Table, salt_buckets: int, hot_ids: frozenset | None = None
) -> pa.Table:
    """Stateless map_batches fn: derive a salted debug-id routing shard
    (SURVEY.md §7.3).  Salting spreads a hot debug-id over
    ``salt_buckets`` actors at the cost of duplicate artifact parses;
    with ``hot_ids`` given, only detected-hot ids are salted and cold
    ids keep full cache affinity."""
    offsets, data = _list_buffers(batch.column("tokens"))
    doc_ids = batch.column("doc_id").to_pylist()
    shards = []
    for i, doc_id in enumerate(doc_ids):
        debug_id = _payload_debug_id(data[offsets[i]: offsets[i + 1]])
        if hot_ids is None or debug_id.decode() in hot_ids:
            salt = zlib.crc32(doc_id.encode()) % salt_buckets
        else:
            salt = 0
        shard = (zlib.crc32(debug_id) * salt_buckets + salt) % (1 << 20)
        shards.append(shard)
    return batch.append_column("routing_shard", pa.array(shards, type=pa.int32()))


def detect_hot_debug_ids(
    input_paths: list[str],
    sample_rows: int = 4096,
    hot_fraction: float = 0.10,
) -> set[str]:
    """Cheap pre-count for skew handling (SURVEY.md §4): scan a small
    sample of raw payloads and return debug-ids holding more than
    ``hot_fraction`` of the sample.  Only hot ids get salted fan-out —
    cold ids keep full artifact-cache affinity.  Uses the same raw-bytes
    extractor as the routing stage, so hot-set membership and routing
    keys agree by construction."""
    sample = ray.data.read_parquet(input_paths).limit(sample_rows)
    counts: dict[str, int] = {}
    total = 0
    for batch in sample.iter_batches(batch_size=1024, batch_format="pyarrow"):
        offsets, data = _list_buffers(batch.column("tokens"))
        for i in range(len(offsets) - 1):
            key = _payload_debug_id(data[offsets[i]: offsets[i + 1]]).decode()
            counts[key] = counts.get(key, 0) + 1
            total += 1
    if total == 0:
        return set()
    return {key for key, n in counts.items() if n / total > hot_fraction}


def salted_repartition(
    ds: "ray.data.Dataset", cfg: PipelineConfig, hot_ids: frozenset | None = None
) -> "ray.data.Dataset":
    """Range-partition by salted debug-id so each symbolizer actor sees a
    cache-friendly, skew-bounded key range.  (Ray Data's sort is the
    range-shuffle primitive; a hash repartition-by-column would work
    equally.)  Opt-in: at small scale the per-actor LRU already covers
    the whole artifact set.  Pass ``hot_ids`` (from
    ``detect_hot_debug_ids``) to salt only the detected-hot keys."""
    ds = ds.map_batches(
        _routing_key_batch,
        fn_kwargs={"salt_buckets": cfg.salt_buckets, "hot_ids": hot_ids},
        batch_format="pyarrow",
    )
    return ds.sort("routing_shard")


def symbolicate_and_write(
    ds: "ray.data.Dataset",
    cfg: PipelineConfig,
    output_dir: str,
    shard_tag: str = "00000",
    *,
    salted: bool = False,
) -> "ray.data.Dataset":
    """Fused process+write stage: the symbolizer actor writes its own
    per-sink parquet parts and emits only tiny summary rows, so the bulk
    token payloads never transit the object store (the write-behind
    pattern for the 100 TB path)."""
    _ensure_artifact_coordinator(cfg)
    if salted:
        ds = salted_repartition(ds, cfg)
    return ds.map_batches(
        SymbolicatorChain,
        fn_constructor_args=(config_to_dict(cfg), "write", output_dir, shard_tag),
        concurrency=cfg.concurrency,
        batch_size=cfg.batch_size,
        batch_format="pyarrow",
    )


def symbolicate_files(
    files: list[str],
    cfg: PipelineConfig,
    output_dir: str,
    shard_tag: str = "00000",
) -> "ray.data.Dataset":
    """Fragment-level fully-fused pipeline: a Dataset of (path,
    row_group) descriptors streams into the SymbolicatorChainFromFiles
    actor pool, which reads, symbolicates, and writes per-sink parquet
    in place — only summary rows cross the object store."""
    import pyarrow.parquet as pq

    from ..stages.symbolicate_stage import SymbolicatorChainFromFiles

    frags = []
    for f in files:
        for rg in range(pq.read_metadata(f).num_row_groups):
            frags.append({"path": f, "row_group": rg})
    ds = ray.data.from_items(frags)
    return ds.map_batches(
        SymbolicatorChainFromFiles,
        fn_constructor_args=(config_to_dict(cfg), "write", output_dir, shard_tag),
        concurrency=cfg.concurrency,
        batch_size=1,
        batch_format="default",
    )


def aggregates_from_summaries(summary_ds: "ray.data.Dataset") -> pa.Table:
    """Reduce per-batch summaries (from symbolicate_and_write) to the
    per-sink aggregate table.  Duration sums (the reference's
    symbolication-duration histogram total); cache sizes are gauges and
    take the max observed."""
    from ray.data.aggregate import Max, Sum

    agg = summary_ds.groupby("sink").aggregate(
        Sum("rows", alias_name="rows"),
        Sum("failed_rows", alias_name="failed_rows"),
        Sum("frames_processed", alias_name="frames_processed"),
        Sum("frames_failed", alias_name="frames_failed"),
        Sum("fetch_failures", alias_name="fetch_failures"),
        Sum("symbolication_duration", alias_name="symbolication_duration"),
        Sum("dur_le_100us", alias_name="dur_le_100us"),
        Sum("dur_le_1ms", alias_name="dur_le_1ms"),
        Sum("dur_le_10ms", alias_name="dur_le_10ms"),
        Sum("dur_gt_10ms", alias_name="dur_gt_10ms"),
        Max("sourcemap_cache_size", alias_name="sourcemap_cache_size"),
        Max("proguard_cache_size", alias_name="proguard_cache_size"),
        Max("dsym_cache_size", alias_name="dsym_cache_size"),
    )
    return pa.Table.from_pylist(sorted(agg.take_all(), key=lambda r: r["sink"]))


def input_files(input_dir: str) -> list[str]:
        return sorted(glob.glob(os.path.join(input_dir, "*.parquet")))


def _accumulate_summary_row(sinks: dict, row: dict) -> str:
    """Fold one summary row into a per-shard {sink: counters} dict;
    returns the part-file path the row records."""
    from ..stages.symbolicate_stage import GAUGE_KEYS

    acc = sinks.setdefault(
        row["sink"],
        {
            "rows": 0,
            "failed_rows": 0,
            "frames_processed": 0,
            "frames_failed": 0,
            "fetch_failures": 0,
            "symbolication_duration": 0.0,
            **{k: 0 for k in GAUGE_KEYS},
            "token_hash": 0,
        },
    )
    for key in ("rows", "failed_rows", "frames_processed", "frames_failed", "fetch_failures"):
        acc[key] += int(row[key])
    acc["symbolication_duration"] += float(row["symbolication_duration"])
    for key in ("dur_le_100us", "dur_le_1ms", "dur_le_10ms", "dur_gt_10ms"):
        acc[key] = acc.get(key, 0) + int(row[key])
    for key in GAUGE_KEYS:
        acc[key] = max(acc[key], int(row[key]))
    acc["token_hash"] = (acc["token_hash"] + int(row["token_hash"])) % (1 << 61)
    return row["file"]


def _commit_shard(
    manifest, output_dir: str, sid: int, input_files_: list[str], sinks: dict, outputs: list[str]
) -> None:
    """Commit one shard's manifest entry and run exactly-once
    reconciliation: a retried task may have written a part file before
    dying whose summary never reached the driver; delete any
    shard-tagged file not recorded in the manifest."""
    manifest.clear_failure(sid)
    manifest.commit(
        sid,
        {"shard": sid, "input_files": input_files_, "sinks": sinks, "outputs": sorted(outputs)},
    )
    recorded = set(outputs)
    for path in glob.glob(os.path.join(output_dir, "*", f"part-{sid:05d}-*.parquet")):
        if path not in recorded:
            os.remove(path)


def _run_shards_pipelined(
    pending: list[tuple[int, list[str]]],
    output_dir: str,
    cfg: PipelineConfig,
    manifest,
) -> None:
    """All pending shards in ONE Dataset execution: the fragment
    descriptors of every shard stream through a SINGLE warm
    SymbolicatorChainFromFiles actor pool (no per-shard pool ramp — the
    structural fix for the sequential loop's ~4x throughput gap),
    summaries come back tagged (shard_tag, frag), and each shard's
    manifest commits the moment its last fragment reports.  Kill/resume
    semantics are identical to the sequential path: committed shards
    skip on resume, uncommitted shards' orphan parts are cleaned before
    scheduling and reconciled at commit."""
    import pyarrow.parquet as pq

    from ..stages.symbolicate_stage import SymbolicatorChainFromFiles

    _ensure_artifact_coordinator(cfg)
    frags: list[dict] = []
    expected: dict[int, set[str]] = {}
    inputs_by_sid: dict[int, list[str]] = {}
    # A shard whose metadata is unreadable (corrupt file) must not abort
    # the WHOLE run before anything commits: exclude it, process every
    # healthy shard, and raise at the end — strictly more progress than
    # the sequential path, which committed only the shards BEFORE the
    # bad one.
    bad_shards: dict[int, str] = {}
    for sid, shard_files in pending:
        exp: set[str] = set()
        shard_frags: list[dict] = []
        try:
            for f in shard_files:
                md = pq.read_metadata(f)
                for rg in range(md.num_row_groups):
                    if md.row_group(rg).num_rows == 0:
                        continue  # empty fragments never report a summary
                    shard_frags.append({"path": f, "row_group": rg, "shard_tag": f"{sid:05d}"})
                    exp.add(f"{f}:{rg}")
        except Exception as exc:
            bad_shards[sid] = f"{type(exc).__name__}: {exc}"
            continue
        manifest.clean_orphan_outputs(sid)
        inputs_by_sid[sid] = shard_files
        frags.extend(shard_frags)
        expected[sid] = exp
    pending = [(sid, fs) for sid, fs in pending if sid not in bad_shards]

    def raise_bad_shards() -> None:
        if bad_shards:
            raise RuntimeError(
                f"unreadable input in shard(s) {sorted(bad_shards)} "
                f"(healthy shards committed; resume retries only these): "
                f"{bad_shards}"
            )

    state = {
        sid: {"sinks": {}, "outputs": [], "done": set(), "got": {}}
        for sid, _ in pending
    }
    committed: set[int] = set()
    for sid, _ in pending:  # shards with no (nonempty) fragments
        if not expected[sid]:
            _commit_shard(manifest, output_dir, sid, inputs_by_sid[sid], {}, [])
            committed.add(sid)
    if not frags:
        raise_bad_shards()
        return

    summary_ds = ray.data.from_items(frags).map_batches(
        SymbolicatorChainFromFiles,
        fn_constructor_args=(config_to_dict(cfg), "write", output_dir, "00000"),
        concurrency=cfg.concurrency,
        batch_size=1,
        batch_format="default",
    )
    # streaming consumption with per-shard commits as fragments finish
    for batch in summary_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        touched: set[int] = set()
        for row in batch.to_pylist():
            sid = int(row["shard_tag"])
            st = state[sid]
            st["outputs"].append(_accumulate_summary_row(st["sinks"], row))
            # a fragment is done only when ALL its summary rows arrived
            # (frag_rows is stamped by the actor) — guards against Ray
            # splitting a map_batches output block mid-fragment, which
            # would otherwise commit a manifest with partial counters
            got = st["got"].get(row["frag"], 0) + 1
            st["got"][row["frag"]] = got
            if got == int(row["frag_rows"]):
                st["done"].add(row["frag"])
            touched.add(sid)
        for sid in touched:
            if sid not in committed and state[sid]["done"] == expected[sid]:
                _commit_shard(
                    manifest, output_dir, sid, inputs_by_sid[sid],
                    state[sid]["sinks"], state[sid]["outputs"],
                )
                committed.add(sid)
    missing = [sid for sid, _ in pending if sid not in committed]
    if missing:  # a fragment never reported — never commit partial shards
        raise RuntimeError(f"pipelined run finished with incomplete shards: {missing}")
    raise_bad_shards()


def run_checkpointed(
    input_dir: str,
    output_dir: str,
    cfg: PipelineConfig,
    *,
    shard_size: int = 4,
    salted: bool = False,
    max_shards: int | None = None,
    skip_failed_shards: bool = False,
    pipelined: bool | None = None,
) -> dict:
    """Process all pending shards; returns per-sink aggregate totals
    derived from committed manifests (resume-safe).

    By default (``pipelined=None`` -> auto) all pending shards run in
    ONE Dataset execution over fragment descriptors — a single warm
    actor pool, per-shard manifests committed as each shard's fragments
    drain (see _run_shards_pipelined).  ``salted`` and
    ``skip_failed_shards`` need per-shard isolation (a repartition
    barrier / per-shard failure containment) and use the sequential
    per-shard execution path.

    ``skip_failed_shards=True`` is the 100 TB resilience mode: a shard
    that raises (corrupt input file, poisoned payload) is recorded in
    ``manifest/failed-<sid>.json`` with its error and the run CONTINUES
    with the remaining shards.  Failed shards stay uncommitted, so a
    resume (after fixing the input) retries exactly them; committing a
    later run clears the failure note.  Default stays fail-loud."""
    from ..state.checkpoint import ShardManifest

    files = input_files(input_dir)
    shards = [files[i: i + shard_size] for i in range(0, len(files), shard_size)]
    manifest = ShardManifest(output_dir)

    pending: list[tuple[int, list[str]]] = []
    for sid, shard_files in enumerate(shards):
        if manifest.is_committed(sid):
            manifest.clear_failure(sid)
            continue
        if max_shards is not None and len(pending) >= max_shards:
            break
        pending.append((sid, shard_files))

    if pipelined is None:
        pipelined = not salted and not skip_failed_shards
    if pipelined:
        if salted or skip_failed_shards:
            raise ValueError(
                "pipelined checkpointed runs need per-shard isolation for "
                "salted / skip_failed_shards; use pipelined=False"
            )
        _run_shards_pipelined(pending, output_dir, cfg, manifest)
        return manifest.aggregates()

    for sid, shard_files in pending:
        manifest.clean_orphan_outputs(sid)
        try:
            ds = ray.data.read_parquet(shard_files)
            summaries = symbolicate_and_write(
                ds, cfg, output_dir, f"{sid:05d}", salted=salted
            ).take_all()
        except Exception as exc:
            if not skip_failed_shards:
                raise
            manifest.record_failure(sid, shard_files, f"{type(exc).__name__}: {exc}")
            manifest.clean_orphan_outputs(sid)
            continue

        sinks: dict[str, dict[str, int]] = {}
        outputs: list[str] = []
        for row in summaries:
            outputs.append(_accumulate_summary_row(sinks, row))
        _commit_shard(manifest, output_dir, sid, shard_files, sinks, outputs)

    return manifest.aggregates()


def per_sink_aggregates(out_ds: "ray.data.Dataset") -> pa.Table:
    """The per-sink aggregate shuffle (SURVEY.md §2.7): partial per-block
    combine inside map_batches (Arrow hash-aggregate kernels, no Python
    row loop), then a tiny 4-key groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "sink": batch.column("sink"),
                "failed": pc.cast(batch.column("symbolicator_failed"), pa.int64()),
                "frames_processed": batch.column("frames_processed"),
                "frames_failed": batch.column("frames_failed"),
                "fetch_failures": batch.column("fetch_failures"),
                "symbolication_duration": batch.column("symbolication_duration"),
            }
        )
        g = t.group_by("sink").aggregate(
            [
                ("sink", "count"),
                ("failed", "sum"),
                ("frames_processed", "sum"),
                ("frames_failed", "sum"),
                ("fetch_failures", "sum"),
                ("symbolication_duration", "sum"),
            ]
        )
        return g.rename_columns(
            [
                "sink",
                "rows",
                "failed_rows",
                "frames_processed",
                "frames_failed",
                "fetch_failures",
                "symbolication_duration",
            ]
        )

    from ray.data.aggregate import Sum

    partials = out_ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("sink").aggregate(
        Sum("rows", alias_name="rows"),
        Sum("failed_rows", alias_name="failed_rows"),
        Sum("frames_processed", alias_name="frames_processed"),
        Sum("frames_failed", alias_name="frames_failed"),
        Sum("fetch_failures", alias_name="fetch_failures"),
        Sum("symbolication_duration", alias_name="symbolication_duration"),
    )
    table = pa.Table.from_pylist(sorted(agg.take_all(), key=lambda r: r["sink"]))
    return table


# metadata.yaml `type` of the processor that owns each sink.  The chain's
# routes are exclusive (disjoint language allowlists; G4), so every routed
# row was symbolicated by exactly one processor and the reference's
# per-PROCESSOR telemetry (each processor's metadata.yaml declares its own
# processor_symbolication_duration histogram, frame counters, and a
# store-specific fetch-failure counter) is a regrouping of the per-sink
# rows.  Unsymbolicated rows map to no processor: the reference starts the
# duration timer only after the gate passes ("Start timing symbolication
# only when we actually perform it", sourcemapprocessor/processor.go:145),
# so skipped records record nothing.
SINK_PROCESSOR = {
    "js": "source_map_symbolicator",
    "android": "proguard_symbolicator",
    "apple": "dsym_symbolicator",
}
# the fetch-failure metric is named per store in each metadata.yaml
PROCESSOR_FETCH_METRIC = {
    "source_map_symbolicator": "processor_total_source_map_fetch_failures",
    "proguard_symbolicator": "processor_total_proguard_fetch_failures",
    "dsym_symbolicator": "processor_total_dsym_fetch_failures",
}


def per_processor_telemetry(out_ds: "ray.data.Dataset") -> pa.Table:
    """Reference-shaped per-PROCESSOR telemetry (metadata.yaml parity:
    sourcemapprocessor/dsymprocessor/proguardprocessor metadata.yaml
    each declare processor_symbolication_duration + frame counters +
    a store-specific fetch-failure counter keyed by processor type).

    Same map-side-partial shape as :func:`per_sink_aggregates`: the
    duration histogram is bucketed per block with vectorized
    ``searchsorted`` one-hots, partials hash-aggregate inside
    ``map_batches``, and only a <=3-row table ever reaches the driver."""
    import numpy as np

    from ..stages.symbolicate_stage import DURATION_BUCKETS

    edges = np.array([1e-4, 1e-3, 1e-2])

    def partial(batch: pa.Table) -> pa.Table:
        sinks = batch.column("sink").to_pylist()
        procs = [SINK_PROCESSOR.get(s) for s in sinks]
        mask = pa.array([p is not None for p in procs])
        batch = batch.filter(mask)
        if batch.num_rows == 0:
            # full partial schema, zero rows (blocks of pure
            # unsymbolicated records must still union cleanly)
            empty = {"processor": pa.array([], type=pa.string())}
            for c in (
                "processor_symbolication_duration_count",
                "processor_total_processed_frames",
                "processor_total_failed_frames",
                "processor_total_fetch_failures",
                "dur_le_100us",
                "dur_le_1ms",
                "dur_le_10ms",
                "dur_gt_10ms",
            ):
                empty[c] = pa.array([], type=pa.int64())
            empty["processor_symbolication_duration_sum"] = pa.array(
                [], type=pa.float64()
            )
            order = [
                "processor",
                "processor_symbolication_duration_count",
                "processor_symbolication_duration_sum",
                "processor_total_processed_frames",
                "processor_total_failed_frames",
                "processor_total_fetch_failures",
                "dur_le_100us",
                "dur_le_1ms",
                "dur_le_10ms",
                "dur_gt_10ms",
            ]
            return pa.table({k: empty[k] for k in order})
        durs = batch.column("symbolication_duration").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        idx = np.searchsorted(edges, durs, side="left")
        cols = {
            "processor": pa.array(
                [p for p in procs if p is not None], type=pa.string()
            ),
            "processor_symbolication_duration_count": pa.array(
                np.ones(len(idx), dtype=np.int64)
            ),
            "processor_symbolication_duration_sum": batch.column(
                "symbolication_duration"
            ),
            "processor_total_processed_frames": pc.cast(
                batch.column("frames_processed"), pa.int64()
            ),
            "processor_total_failed_frames": pc.cast(
                batch.column("frames_failed"), pa.int64()
            ),
            "processor_total_fetch_failures": pc.cast(
                batch.column("fetch_failures"), pa.int64()
            ),
        }
        for b, name in enumerate(DURATION_BUCKETS):
            cols[name] = pa.array((idx == b).astype(np.int64))
        t = pa.table(cols)
        value_cols = [c for c in t.column_names if c != "processor"]
        g = t.group_by("processor").aggregate([(c, "sum") for c in value_cols])
        return g.rename_columns(["processor"] + value_cols)

    from ray.data.aggregate import Sum

    partials = out_ds.map_batches(partial, batch_format="pyarrow")
    value_cols = [
        "processor_symbolication_duration_count",
        "processor_symbolication_duration_sum",
        "processor_total_processed_frames",
        "processor_total_failed_frames",
        "processor_total_fetch_failures",
        "dur_le_100us",
        "dur_le_1ms",
        "dur_le_10ms",
        "dur_gt_10ms",
    ]
    agg = partials.groupby("processor").aggregate(
        *[Sum(c, alias_name=c) for c in value_cols]
    )
    rows = sorted(
        (r for r in agg.take_all() if r["processor"] is not None),
        key=lambda r: r["processor"],
    )
    for r in rows:
        r["fetch_failure_metric"] = PROCESSOR_FETCH_METRIC[r["processor"]]
    return pa.Table.from_pylist(rows)


_MACHO_DEBUG_ID = "a1b2c3d4-e5f6-4711-8123-456789abcdef"


class _MachoSymtabLookup:
    """Actor-pool stage: parse a REAL Mach-O 64 binary (LC_UUID +
    LC_SYMTAB, the genuine dSYM DWARF/<binary> on-disk format) ONCE per
    actor in __init__ from a broadcast blob, then bisect-symbolicate
    address batches in __call__ — the reference's symbolic-go
    address->symbol layer (dsymprocessor/symbolicator.go:92-104) driven
    from Python-parsed nlist_64 records instead of synthetic tables."""

    def __init__(self, blob_ref) -> None:
        from ..functions.dsymfile import SymCache, parse_macho_archive

        data = ray.get(blob_ref)
        self.debug_id, symbols, dwarf = parse_macho_archive(data)
        self.cache = SymCache(symbols, dwarf=dwarf)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_pylist()
        addrs = batch.column("instr_addr").to_pylist()
        symbols, sym_addrs, paths, lines, n_frames = [], [], [], [], []
        for a in addrs:
            locs = self.cache.lookup(int(a))
            if locs:
                # locs[0] is the innermost (inline) frame, locs[-1] the
                # physical symbol — mirror the reference's 1->N frame
                # consumption by reporting innermost path/line with the
                # physical symbol and the chain length
                symbols.append(locs[-1].symbol)
                sym_addrs.append(locs[-1].sym_addr)
                paths.append(locs[0].path or None)
                lines.append(locs[0].line or None)
                n_frames.append(len(locs))
            else:
                symbols.append(None)
                sym_addrs.append(None)
                paths.append(None)
                lines.append(None)
                n_frames.append(0)
        return pa.table(
            {
                "event_id": pa.array(ids, type=pa.int64()),
                "instr_addr": pa.array(addrs, type=pa.int64()),
                "symbol": pa.array(symbols, type=pa.string()),
                "sym_addr": pa.array(sym_addrs, type=pa.int64()),
                "path": pa.array(paths, type=pa.string()),
                "line": pa.array(lines, type=pa.int64()),
                "n_frames": pa.array(n_frames, type=pa.int64()),
                "debug_id": pa.array([self.debug_id] * len(ids), type=pa.string()),
            }
        )


def macho_symtab_lookup(sf_dir: str, n_symbols: int = 64) -> "ray.data.Dataset":
    """Driver-visible exercise of the genuine-binary dSYM path: build a
    structurally valid Mach-O 64 symtab binary (synth_artifacts.
    build_macho_symtab — parseable by any Mach-O tool), ``ray.put`` the
    raw bytes ONCE, and symbolicate a deterministic address stream
    derived from the events table through an actor pool that parses the
    binary once per actor.  At 100 TB scale this is the shape of
    symbolicating against a broadcast store: the binary ships to each
    actor once, never per batch.  Rows-only (Mach-O parsing is not
    SQL-expressible); the address->symbol mapping itself is pinned by
    tests/test_dsym.py's roundtrip + end-to-end goldens."""
    from ..synth_artifacts import build_macho_symtab

    symbols = [(0x1000 + i * 0x40, f"func_{i:03d}") for i in range(n_symbols)]
    return _macho_lookup_pipeline(
        sf_dir, n_symbols, ray.put(build_macho_symtab(_MACHO_DEBUG_ID, symbols))
    )


def macho_dwarf_lookup(sf_dir: str, n_symbols: int = 64) -> "ray.data.Dataset":
    """Like macho_symtab_lookup but the broadcast binary additionally
    carries a REAL DWARF v4 ``__DWARF,__debug_line`` section (two line
    rows per function), so each resolved frame gains file/line from the
    genuine DWARF line-number program — the layer the reference gets
    from symbolic-go (dsymprocessor/symbolicator.go:95-104).  Rows-only
    (DWARF decoding is not SQL-expressible); the state machine itself is
    pinned by tests/test_dsym.py's hand-crafted-opcode goldens."""
    from ..synth_artifacts import build_macho_dwarf

    symbols = [(0x1000 + i * 0x40, f"func_{i:03d}") for i in range(n_symbols)]
    lines: list[tuple[int, str, int]] = []
    subprograms: list[dict] = []
    for i in range(n_symbols):
        base = 0x1000 + i * 0x40
        lines.append((base, f"src/mod_{i % 8}.swift", 10 + i))
        lines.append((base + 0x20, f"src/mod_{i % 8}.swift", 11 + i))
        sp = {"low": base, "high": base + 0x40, "name": f"func_{i:03d}", "inlines": []}
        if i % 4 == 0:
            # every 4th function inlines a helper over its upper half,
            # so the driver stream also exercises .debug_info unwinding
            sp["inlines"].append(
                {
                    "low": base + 0x20,
                    "high": base + 0x40,
                    "name": f"inl_{i:03d}",
                    "call_file": (i % 8) + 1,
                    "call_line": 10 + i,
                }
            )
        subprograms.append(sp)
    return _macho_lookup_pipeline(
        sf_dir,
        n_symbols,
        ray.put(
            build_macho_dwarf(_MACHO_DEBUG_ID, symbols, lines, subprograms=subprograms)
        ),
    )


def _macho_lookup_pipeline(
    sf_dir: str, n_symbols: int, blob_ref
) -> "ray.data.Dataset":

    def to_addrs(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = (
            batch.column("event_id").combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # deterministic content-keyed addresses spanning the whole
        # symbol range PLUS the below-first-symbol edge (addr < 0x1000
        # yields a null symbol, covering the miss path)
        addrs = 0x0800 + (ids % np.int64(n_symbols * 8)) * np.int64(0x10)
        return pa.table(
            {
                "event_id": pa.array(ids, type=pa.int64()),
                "instr_addr": pa.array(addrs, type=pa.int64()),
            }
        )

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return (
        events.map_batches(to_addrs, batch_format="pyarrow")
        .map_batches(
            _MachoSymtabLookup,
            fn_constructor_args=(blob_ref,),
            concurrency=2,
            batch_format="pyarrow",
        )
        .sort("event_id")
    )

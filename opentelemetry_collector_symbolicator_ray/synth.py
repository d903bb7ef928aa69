"""Deterministic synthetic corpus generator (FIXTURES.md §4).

Builds the pre-tokenized Parquet input tables (doc_id, tokens:list<int32>,
n_tok, source) plus the artifact fixture trees consumed by the symbolizer
actors.  Mix: ~40% js (half structured / half raw), ~25% android, ~20%
apple (3/4 generic, 1/4 MetricKit across both JSON shapes), ~15%
non-exception noise; ~5% edge rows per platform exercising every failure
attribute.  Debug-id distribution is Zipf-ish with one hot id (~30% of
rows in its platform) to exercise salted repartitioning.  Seeded and
fully deterministic: same (seed, num_rows) -> byte-identical corpus.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .codec import encode_batch_records
from .synth_artifacts import write_dsym, write_js_sourcemap, write_proguard_mapping

JS_FILES = [f"app-{i}.js" for i in range(4)]
JS_URL = "https://cdn.example.com/assets/{}"
JS_UUIDS = [
    "e63db37d-9886-452a-8e56-2250dcc20102",  # hot
    "11111111-2222-4333-8444-555555555501",
    "11111111-2222-4333-8444-555555555502",
]
PROGUARD_UUIDS = [
    "f63db37d-9886-452a-8e56-2250dcc20103",  # hot
    "22222222-3333-4444-8555-666666666601",
    "22222222-3333-4444-8555-666666666602",
]
APPLE_BUILDS = [
    ("6A8CB813-45F6-3652-AD33-778FD1EAB196", "Chateaux Bufeaux"),  # hot
    ("7B9DC924-56A7-4763-BE44-889FD2EAB207", "Example App"),
]
LIB_UUIDS = [
    "7821F73C-378B-3A10-BE90-EF526B7DBA93",
    "DCB9E73A-92BA-3782-BC6D-3E1906622689",
    "189FE480-5D5B-3B89-9289-58BC88624420",
]
MISSING_JS = "does-not-exist.js"
MISSING_PROGUARD_UUID = "deaddead-0000-4000-8000-000000000000"

SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def generate_artifacts(artifacts_dir: str) -> None:
    """Write the sourcemap / proguard / dsym fixture trees (idempotent)."""
    sm_dir = os.path.join(artifacts_dir, "sourcemaps")
    for i, name in enumerate(JS_FILES):
        write_js_sourcemap(sm_dir, name, fn_a=f"alpha{i}", fn_b=f"beta{i}")
        for uuid in JS_UUIDS:
            write_js_sourcemap(os.path.join(sm_dir, uuid), name, fn_a=f"alpha{i}", fn_b=f"beta{i}")
    pg_dir = os.path.join(artifacts_dir, "proguard")
    for uuid in PROGUARD_UUIDS:
        write_proguard_mapping(pg_dir, uuid)
    dsym_dir = os.path.join(artifacts_dir, "dsyms")
    for uuid, binary in APPLE_BUILDS:
        write_dsym(dsym_dir, uuid, binary)


def _pick_hot(rng: random.Random, items: list):
    """~30% hot first item, rest spread."""
    if rng.random() < 0.3 or len(items) == 1:
        return items[0]
    return items[1 + rng.randrange(len(items) - 1)]


def _js_record(i: int, rng: random.Random) -> tuple[dict, str]:
    lang = rng.choice(["webjs", "javascript"])
    resource = {"telemetry.sdk.language": lang, "service.name": "web-app"}
    use_uuid = rng.random() < 0.5
    if use_uuid:
        resource["app.debug.source_map_uuid"] = _pick_hot(rng, JS_UUIDS)
    file = _pick_hot(rng, JS_FILES)
    url = JS_URL.format(file)
    edge = rng.random() < 0.05
    structured = rng.random() < 0.5

    n = rng.randint(2, 5)
    frames = []
    for j in range(n):
        kind = rng.random()
        if kind < 0.1:
            frames.append(("fn%d" % j, "<anonymous>", 1, 1))
        elif kind < 0.2:
            frames.append(("call", "(native)" if structured else "[native]", 0, 0))
        else:
            frames.append((f"fn{i % 7}_{j}", url, rng.randint(1, 400), rng.randint(1, 5000)))

    attrs = {
        "exception.type": "Error",
        "exception.message": f"boom {i % 97}",
    }
    if structured:
        variant = "structured"
        attrs["exception.structured_stacktrace.functions"] = [f[0] for f in frames]
        attrs["exception.structured_stacktrace.urls"] = [
            ("[native code]" if f[1] == "[native]" else f[1]) for f in frames
        ]
        attrs["exception.structured_stacktrace.lines"] = [f[2] for f in frames]
        attrs["exception.structured_stacktrace.columns"] = [f[3] for f in frames]
        attrs["exception.stacktrace"] = "\n".join(
            f"    at {f[0]} ({f[1]}:{f[2]}:{f[3]})" for f in frames
        )
        if edge:
            kind = i % 3
            if kind == 0:
                attrs["exception.structured_stacktrace.lines"] = attrs[
                    "exception.structured_stacktrace.lines"
                ][:-1]  # mismatched lengths
                variant = "edge-mismatch"
            elif kind == 1:
                attrs["exception.structured_stacktrace.columns"] = [2**33] + attrs[
                    "exception.structured_stacktrace.columns"
                ][1:]  # uint32 overflow
                variant = "edge-overflow"
            else:
                attrs["exception.structured_stacktrace.urls"] = [
                    JS_URL.format(MISSING_JS)
                ] * len(frames)  # missing artifact
                variant = "edge-missing-artifact"
    else:
        variant = "raw"
        style = rng.choice(["chrome", "gecko", "rn", "safari", "opera11"])
        if style == "opera11":
            # Opera 11+ stacktrace format: frame line + source line pairs
            lines = []
            for idx, (fn, u, ln, col) in enumerate(frames):
                if u in ("<anonymous>", "(native)", "[native]"):
                    u = JS_URL.format(file)
                lead = "Error thrown at" if idx == 0 else "called from"
                lines.append(f"{lead} line {ln}, column {col} in {fn}() in {u}:")
                lines.append("    source();")
            attrs["exception.stacktrace"] = "\n".join(lines)
        else:
            lines = [f"Error: boom {i % 97}"]
            for f in frames:
                fn, u, ln, col = f
                if u == "<anonymous>":
                    lines.append(f"    at {fn} (<anonymous>)")
                elif u in ("(native)", "[native]"):
                    lines.append(
                        "    at call (native)"
                        if style not in ("gecko", "safari")
                        else "eval@[native code]"
                    )
                elif style == "chrome":
                    lines.append(f"    at {fn} ({u}:{ln}:{col})")
                elif style in ("gecko", "safari"):
                    lines.append(f"{fn}@{u}:{ln}:{col}")
                else:
                    lines.append(f"    at {fn} (address at {u}:{ln}:{col})")
            attrs["exception.stacktrace"] = "\n".join(lines)
        if edge:
            attrs["exception.stacktrace"] = "completely unparseable\ngarbage text"
            variant = "edge-unparseable"

    if rng.random() < 0.03:
        del resource["telemetry.sdk.language"]  # skipped by language gate
        variant += "-nolang"

    if rng.random() < 0.2:
        # Trace span carrying the exception as a span EVENT (the
        # reference traces pipeline processes span + span-event attrs;
        # sourcemapprocessor/processor.go:78-82).
        record = {
            "event_name": "span",
            "attributes": {"http.method": "GET", "span.kind": "client"},
            "resource_attributes": resource,
            "events": [{"name": "exception", "attributes": attrs}],
        }
        return record, f"synth-v1/js/span-{variant}"

    record = {"event_name": "exception", "attributes": attrs, "resource_attributes": resource}
    return record, f"synth-v1/js/{variant}"


def _android_record(i: int, rng: random.Random) -> tuple[dict, str]:
    lang = rng.choice(["java", "kotlin"])
    resource = {"telemetry.sdk.language": lang, "service.name": "droid-app"}
    uuid = _pick_hot(rng, PROGUARD_UUIDS)
    uuid_on_record = rng.random() < 0.5
    edge = rng.random() < 0.05
    structured = rng.random() < 0.5

    # obf frames over the generated mapping: class a.b.c methods a/d/e/f
    frame_pool = [
        ("a.b.c", "a", rng.randint(1, 10), "SourceFile"),
        ("a.b.c", "d", rng.randint(11, 12), "SourceFile"),
        ("a.b.c", "e", rng.randint(20, 29), "SourceFile"),
        ("a.b.d", "a", rng.randint(5, 15), "SourceFile"),
        ("com.x.Unmapped", "m", 42, "Unmapped.java"),
        ("com.x.Native", "n", -2, "Native Method"),
        ("com.x.Unknown", "u", -1, "Unknown Source"),
    ]
    n = rng.randint(2, 5)
    frames = [frame_pool[rng.randrange(len(frame_pool))] for _ in range(n)]

    attrs = {
        "exception.type": "java.lang.RuntimeException",
        "exception.message": f"kaput {i % 89}",
    }
    if uuid_on_record:
        attrs["app.debug.proguard_uuid"] = uuid
    else:
        resource["app.debug.proguard_uuid"] = uuid

    if structured:
        variant = "structured"
        attrs["exception.structured_stacktrace.classes"] = [f[0] for f in frames]
        attrs["exception.structured_stacktrace.methods"] = [f[1] for f in frames]
        attrs["exception.structured_stacktrace.lines"] = [f[2] for f in frames]
        attrs["exception.structured_stacktrace.source_files"] = [f[3] for f in frames]
        attrs["exception.stacktrace"] = "raw-placeholder"
        if edge:
            kind = i % 3
            if kind == 0:
                attrs["exception.structured_stacktrace.methods"] = attrs[
                    "exception.structured_stacktrace.methods"
                ][:-1]
                variant = "edge-mismatch"
            elif kind == 1:
                attrs["exception.structured_stacktrace.lines"] = [-5] + attrs[
                    "exception.structured_stacktrace.lines"
                ][1:]
                variant = "edge-invalid-line"
            else:
                attrs.pop("app.debug.proguard_uuid", None)
                resource.pop("app.debug.proguard_uuid", None)
                variant = "edge-missing-uuid"
    else:
        variant = "raw"
        lines = [f"java.lang.RuntimeException: kaput {i % 89}"]
        for cls, m, ln, src in frames:
            if ln == -2:
                lines.append(f"\tat {cls}.{m}(Native Method)")
            elif ln == -1:
                lines.append(f"\tat {cls}.{m}(Unknown Source)")
            else:
                lines.append(f"\tat {cls}.{m}({src}:{ln})")
        if rng.random() < 0.3:
            lines.insert(2, "Caused by: java.lang.IllegalStateException: root cause")
        attrs["exception.stacktrace"] = "\n".join(lines)
        if edge:
            if i % 2 == 0:
                attrs["exception.stacktrace"] = "\tat com.example.X.y(X.java:1)"  # no header
                variant = "edge-no-header"
            else:
                attrs["app.debug.proguard_uuid"] = MISSING_PROGUARD_UUID
                resource.pop("app.debug.proguard_uuid", None)
                variant = "edge-missing-mapping"

    record = {"event_name": "exception", "attributes": attrs, "resource_attributes": resource}
    return record, f"synth-v1/android/{variant}"


def _apple_record(i: int, rng: random.Random) -> tuple[dict, str]:
    resource = {"telemetry.sdk.language": "swift", "service.name": "ios-app"}
    uuid, binary = APPLE_BUILDS[0] if rng.random() < 0.6 else APPLE_BUILDS[1]
    resource["app.debug.build_uuid"] = uuid
    resource["app.bundle.executable"] = binary
    edge = rng.random() < 0.05
    metrickit = rng.random() < 0.25

    if not metrickit:
        variant = "generic"
        event_name = "error"
        lines = []
        n = rng.randint(3, 6)
        for j in range(n):
            kind = rng.random()
            addr = 0x100000000 + rng.randrange(0, 1 << 24)
            if kind < 0.3:
                lib_uuid = LIB_UUIDS[j % len(LIB_UUIDS)]
                lines.append(
                    f"{j}   CoreFoundation                      0x{addr:016x} {lib_uuid} + {rng.randint(1, 99999)}"
                )
            elif kind < 0.4:
                lines.append(
                    f"{j}   libobjc.A.dylib                     0x{addr:016x} objc_exception_throw + 88"
                )
            else:
                offset = rng.choice([rng.randint(4096, 8191), rng.randint(100372, 100999), rng.randint(101000, 101999)])
                lines.append(
                    f"{j}   {binary}{' ' * max(1, 36 - len(binary))}0x{addr:016x} {binary} + {offset}"
                )
        attrs = {"exception.stacktrace": "\n".join(lines)}
        if edge:
            if i % 2 == 0:
                del resource["app.debug.build_uuid"]
                variant = "edge-missing-build-uuid"
            else:
                # offset beyond every symbol -> lookup error -> failure
                attrs["exception.stacktrace"] = (
                    f"0   {binary}{' ' * max(1, 36 - len(binary))}0x0000000102577fd1 {binary} + 9999999999"
                )
                variant = "edge-bad-offset"
    else:
        event_name = "metrickit.diagnostic.crash"
        shape = rng.choice(["apple", "otel"])
        variant = f"metrickit-{shape}"
        app_frame = {
            "binaryUUID": uuid,
            "binaryName": binary,
        }
        lib_frame = {
            "binaryUUID": LIB_UUIDS[i % len(LIB_UUIDS)],
            "binaryName": "SwiftUI",
        }
        offset_key = "offsetIntoBinaryTextSegment" if shape == "apple" else "offsetAddress"
        app_frame[offset_key] = rng.randint(100372, 100999)
        lib_frame[offset_key] = rng.randint(1, 999999)
        if shape == "apple":
            inner = dict(app_frame)
            outer = dict(lib_frame)
            outer["subFrames"] = [inner]
            report = {"callStacks": [{"threadAttributed": True, "callStackRootFrames": [outer]}]}
        else:
            report = {
                "callStacks": [
                    {"threadAttributed": True, "callStackFrames": [lib_frame, app_frame]}
                ]
            }
        import json as _json

        attrs = {
            "metrickit.diagnostic.crash.exception.stacktrace_json": _json.dumps(report),
        }
        if rng.random() < 0.5:
            attrs["metrickit.diagnostic.crash.exception.signal.name"] = "SIGSEGV"
            attrs["metrickit.diagnostic.crash.exception.termination_reason"] = "Segfault"
        if rng.random() < 0.5:
            # exercise the gate order: stacktrace attr present + metrickit eventName
            attrs["exception.stacktrace"] = "unused"
        if edge:
            attrs["metrickit.diagnostic.crash.exception.stacktrace_json"] = "{invalid json"
            variant = "edge-invalid-json"

    record = {"event_name": event_name, "attributes": attrs, "resource_attributes": resource}
    return record, f"synth-v1/apple/{variant}"


def _noise_record(i: int, rng: random.Random) -> tuple[dict, str]:
    resource = {"service.name": "misc"}
    lang = rng.choice(["go", "python", None, "webjs"])
    if lang is not None:
        resource["telemetry.sdk.language"] = lang
    attrs = {
        "http.method": rng.choice(["GET", "POST"]),
        "http.status_code": rng.choice([200, 404, 500]),
        "http.url": f"https://api.example.com/v1/items/{i % 1000}",
    }
    record = {"event_name": "", "attributes": attrs, "resource_attributes": resource}
    return record, "synth-v1/noise/plain"


def make_record(i: int, seed: int = 42) -> tuple[str, dict, str]:
    """Deterministic record for global row index i: (doc_id, record, source)."""
    rng = random.Random((seed << 32) ^ i)
    r = rng.random()
    if r < 0.40:
        platform = "js"
        record, source = _js_record(i, rng)
    elif r < 0.65:
        platform = "android"
        record, source = _android_record(i, rng)
    elif r < 0.85:
        platform = "apple"
        record, source = _apple_record(i, rng)
    else:
        platform = "noise"
        record, source = _noise_record(i, rng)
    return f"doc-{platform}-{i:08d}", record, source


def generate_corpus(
    out_dir: str,
    num_rows: int,
    num_files: int = 8,
    seed: int = 42,
    with_artifacts: bool = True,
) -> str:
    """Write tokens-<k>.parquet shards + artifacts/ under out_dir.
    Idempotent: skips generation if the marker file matches."""
    marker = os.path.join(out_dir, f".complete-v4-{num_rows}-{num_files}-{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    if with_artifacts:
        generate_artifacts(os.path.join(out_dir, "artifacts"))

    rows_per_file = (num_rows + num_files - 1) // num_files
    for k in range(num_files):
        lo = k * rows_per_file
        hi = min(num_rows, lo + rows_per_file)
        doc_ids, records, sources = [], [], []
        for i in range(lo, hi):
            doc_id, record, source = make_record(i, seed)
            doc_ids.append(doc_id)
            records.append(record)
            sources.append(source)
        tokens, n_tok = encode_batch_records(records)
        table = pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "tokens": tokens,
                "n_tok": n_tok,
                "source": pa.array(sources, type=pa.string()),
            },
            schema=SCHEMA,
        )
        # Modest row groups give fragment-level readers a fine-grained
        # work unit (stages/symbolicate_stage.SymbolicatorChainFromFiles).
        pq.write_table(
            table, os.path.join(out_dir, f"tokens-{k:05d}.parquet"), row_group_size=4096
        )

    with open(marker, "w") as f:
        f.write("ok")
    return out_dir

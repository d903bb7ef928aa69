"""Loader for the reference collector's own ``config.yaml`` shape
(/root/reference/config.yaml, builder-config.yaml): a user switching
from the collector keeps their YAML — receivers.otlp protocols,
the three symbolicator processor sections (every mapstructure key from
sourcemapprocessor/config.go, dsymprocessor/config.go,
proguardprocessor/config.go), the batch processor, and
service.pipelines — and this module maps it onto the engine's
:class:`~opentelemetry_collector_symbolicator_ray.config.PipelineConfig`.

Key-for-key: flat processor keys share names with the engine dataclass
fields (both mirror the Go mapstructure tags); nested store blocks
(``local_source_maps.path``, ``s3_dsyms.bucket``, ``gcs_store.prefix``,
...) flatten onto the engine's store fields; Go duration strings
("5s", "250ms", "1m") parse to seconds.  Unknown keys raise, matching
the collector's strict config validation."""

from __future__ import annotations

import dataclasses
import re
from typing import Any

from .config import DsymConfig, PipelineConfig, ProguardConfig, SourceMapConfig

# collector processor id -> (engine dataclass, store-kind key, nested store blocks)
_PROCESSORS = {
    "source_map_symbolicator": (
        SourceMapConfig,
        "source_map_store",
        {
            "local_source_maps": "file_store",
            "s3_source_maps": "s3_store",
            "gcs_source_maps": "gcs_store",
        },
    ),
    "dsym_symbolicator": (
        DsymConfig,
        "dsym_store",
        {"local_dsyms": "file_store", "s3_dsyms": "s3_store", "gcs_dsyms": "gcs_store"},
    ),
    "proguard_symbolicator": (
        ProguardConfig,
        "proguard_store",
        {"local_store": "file_store", "s3_store": "s3_store", "gcs_store": "gcs_store"},
    ),
}

_DURATION_RE = re.compile(r"^(\d+(?:\.\d+)?)(ms|s|m|h)$")
_DURATION_UNITS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0}


def _parse_duration(v: Any) -> float:
    if isinstance(v, (int, float)):
        return float(v)
    m = _DURATION_RE.match(str(v).strip())
    if not m:
        raise ValueError(f"unparseable duration: {v!r}")
    return float(m.group(1)) * _DURATION_UNITS[m.group(2)]


def _load_processor(cls, store_key: str, store_blocks: dict, section: dict | None):
    cfg = cls()
    if not section:
        return cfg
    fields = {f.name for f in dataclasses.fields(cls)}
    # The collector selects the store backend SOLELY from the *_store key
    # (dsymprocessor/factory.go:54 switch symCfg.DSYMStoreKey); nested
    # blocks (s3_dsyms, gcs_store, ...) are parameters only.  So an
    # explicit *_store key always wins, and a nested block implies the
    # kind only when the key is absent — never YAML-key-order-dependent.
    explicit_kind = store_key in section
    for key, val in section.items():
        if key in store_blocks:
            # nested store block -> flat engine fields (+ store kind
            # only if not explicitly pinned)
            if not explicit_kind:
                setattr(cfg, store_key, store_blocks[key])
            block = val or {}
            for bk, bv in block.items():
                if bk == "path":
                    cfg.local_path = str(bv)
                elif bk == "bucket":
                    cfg.bucket = str(bv)
                elif bk == "region":
                    cfg.region = str(bv)
                elif bk == "prefix":
                    cfg.store_prefix = str(bv)
                else:
                    raise ValueError(f"unknown store key {key}.{bk}")
        elif key == "timeout":
            cfg.timeout = _parse_duration(val)
        elif key in fields:
            cur = getattr(cfg, key)
            if isinstance(cur, bool):
                setattr(cfg, key, bool(val))
            elif isinstance(cur, int) and not isinstance(cur, bool):
                setattr(cfg, key, int(val))
            elif isinstance(cur, float):
                setattr(cfg, key, float(val))
            elif isinstance(cur, list):
                setattr(cfg, key, list(val))
            else:
                setattr(cfg, key, str(val))
        else:
            raise ValueError(f"unknown config key for {cls.__name__}: {key}")
    return cfg


def load_collector_config(path: str, artifacts_dir: str | None = None) -> dict:
    """Parse a collector config.yaml into engine objects.

    Returns ``{"config": PipelineConfig, "pipelines": {name: [processor
    ids]}, "otlp": {"grpc": endpoint|None, "http": endpoint|None},
    "batch": {...}}``."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f) or {}

    procs = doc.get("processors") or {}
    parsed = {}
    batch: dict = {}
    batch_names: list[str] = []
    for name, section in procs.items():
        if name in _PROCESSORS:
            cls, store_key, blocks = _PROCESSORS[name]
            parsed[name] = _load_processor(cls, store_key, blocks, section)
        elif name == "batch" or name.startswith("batch/"):
            batch = dict(section or {})
            batch_names.append(name)
        else:
            raise ValueError(f"unknown processor: {name}")

    # a section that selects file_store but gives no path falls back to
    # the CLI artifacts layout (with_default_routing's subdirs) so
    # --artifacts keeps working under --collector-config
    _subdirs = {
        "source_map_symbolicator": "sourcemaps",
        "dsym_symbolicator": "dsyms",
        "proguard_symbolicator": "proguard",
    }
    if artifacts_dir:
        for name, pc_ in parsed.items():
            _, store_key, _ = _PROCESSORS[name]
            if getattr(pc_, store_key) == "file_store" and pc_.local_path == ".":
                pc_.local_path = f"{artifacts_dir}/{_subdirs[name]}"

    pipelines = {}
    for pname, psec in ((doc.get("service") or {}).get("pipelines") or {}).items():
        plist = list((psec or {}).get("processors") or [])
        # collector startup validation: a pipeline referencing a
        # processor id with no matching processors: section refuses to
        # start — it does NOT silently run with fewer processors
        for pid in plist:
            if pid not in parsed and pid not in batch_names:
                raise ValueError(
                    f"pipeline {pname!r} references unconfigured processor {pid!r}"
                )
        pipelines[pname] = plist

    # the inertness rule covers batch too: configured but wired into no
    # pipeline means its send_batch_size must not apply
    if pipelines and batch_names:
        wired = {pid for plist in pipelines.values() for pid in plist}
        if not (wired & set(batch_names)):
            batch = {}

    kw: dict[str, Any] = {}
    if "source_map_symbolicator" in parsed:
        kw["sourcemap"] = parsed["source_map_symbolicator"]
    if "dsym_symbolicator" in parsed:
        kw["dsym"] = parsed["dsym_symbolicator"]
    if "proguard_symbolicator" in parsed:
        kw["proguard"] = parsed["proguard_symbolicator"]
    if artifacts_dir:
        kw["artifacts_dir"] = artifacts_dir
    if "send_batch_size" in batch:
        kw["batch_size"] = int(batch["send_batch_size"])
    cfg = PipelineConfig(**kw)

    # service.pipelines parity: a processor configured but wired into no
    # pipeline is inert; with no service section, every configured
    # processor is active (the engine's single chain stands in for the
    # collector's per-signal pipelines)
    short = {
        "source_map_symbolicator": "sourcemap",
        "dsym_symbolicator": "dsym",
        "proguard_symbolicator": "proguard",
    }
    configured = {short[n] for n in parsed}
    referenced = {
        short[pid]
        for plist in pipelines.values()
        for pid in plist
        if pid in short
    }
    cfg.enabled_processors = sorted(configured & referenced if pipelines else configured)

    otlp = {"grpc": None, "http": None}
    recv = ((doc.get("receivers") or {}).get("otlp") or {}).get("protocols") or {}
    for proto in ("grpc", "http"):
        if proto in recv:
            otlp[proto] = (recv[proto] or {}).get("endpoint") or (
                "0.0.0.0:4317" if proto == "grpc" else "0.0.0.0:4318"
            )
    return {"config": cfg, "pipelines": pipelines, "otlp": otlp, "batch": batch}

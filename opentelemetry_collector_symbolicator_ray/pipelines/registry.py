"""PipelineStep registry — the engine's analogue of the collector's
processor-factory composition surface (SURVEY.md §2.11;
sourcemapprocessor/factory.go:122-130 and twins + builder-config.yaml).

A collector distro composes processors by NAME in config; here a
pipeline is a list of ``{"step": <name>, ...options}`` dicts folded over
a Dataset.  Steps are registered builders ``(ds, cfg, **options) ->
Dataset``; third parties register their own with ``@register_step``.

    spec = [
        {"step": "read_parquet", "input_dir": corpus},
        {"step": "salted_repartition"},
        {"step": "symbolicate"},
    ]
    ds = build_pipeline(spec, cfg)
"""

from __future__ import annotations

from typing import Any, Callable

import ray.data

from ..config import PipelineConfig

StepBuilder = Callable[..., "ray.data.Dataset"]

_REGISTRY: dict[str, StepBuilder] = {}


def register_step(name: str) -> Callable[[StepBuilder], StepBuilder]:
    """Register a pipeline step builder under ``name`` (the factory
    ``typeStr`` analogue).  Re-registering a name overwrites — same as a
    distro swapping in its own processor build."""

    def deco(fn: StepBuilder) -> StepBuilder:
        _REGISTRY[name] = fn
        return fn

    return deco


def available_steps() -> list[str]:
    return sorted(_REGISTRY)


def build_pipeline(spec: list[dict[str, Any]], cfg: PipelineConfig) -> "ray.data.Dataset":
    """Fold the step list over a Dataset.  The first step must be a
    source (takes ``ds=None``); unknown names raise with the available
    set (mirroring the collector's unknown-component config error)."""
    ds = None
    for entry in spec:
        entry = dict(entry)
        name = entry.pop("step", None)
        if name not in _REGISTRY:
            raise ValueError(
                f"unknown pipeline step: {name!r}; available: {available_steps()}"
            )
        ds = _REGISTRY[name](ds, cfg, **entry)
    return ds


# ---- built-in steps (the engine's "core distro") ----


@register_step("read_parquet")
def _read_parquet(ds, cfg: PipelineConfig, *, input_dir: str, **kw):
    from .symbolicate import input_files

    return ray.data.read_parquet(input_files(input_dir), **kw)


@register_step("read_otlp_jsonl")
def _read_otlp(ds, cfg: PipelineConfig, *, paths, **kw):
    from ..sources.otlp import read_otlp_jsonl

    return read_otlp_jsonl(paths)


@register_step("salted_repartition")
def _salted(ds, cfg: PipelineConfig, *, hot_ids=None):
    from .symbolicate import salted_repartition

    return salted_repartition(ds, cfg, hot_ids=frozenset(hot_ids) if hot_ids else None)


@register_step("symbolicate")
def _symbolicate(ds, cfg: PipelineConfig):
    from .symbolicate import symbolicate

    return symbolicate(ds, cfg)


@register_step("symbolicate_and_write")
def _symbolicate_write(ds, cfg: PipelineConfig, *, output_dir: str, shard_tag: str = "00000"):
    from .symbolicate import symbolicate_and_write

    return symbolicate_and_write(ds, cfg, output_dir, shard_tag)


@register_step("write_parquet")
def _write(ds, cfg: PipelineConfig, *, output_dir: str):
    ds.write_parquet(output_dir)
    return ds

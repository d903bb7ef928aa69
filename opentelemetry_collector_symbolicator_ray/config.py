"""Processor configuration objects.

Mirrors the reference's per-processor ``Config`` structs and factory
defaults (sourcemapprocessor/config.go:8-106 + factory.go:24-53,
proguardprocessor/config.go + factory.go:26-54, dsymprocessor/config.go +
factory.go:24-46).  Every attribute key is remappable, exactly like the
reference's ``*_attribute_key`` options.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Processor type strings / versions (sourcemapprocessor/factory.go:16-21,
# proguardprocessor/factory.go:18-23, dsymprocessor/factory.go:16-20).
SOURCEMAP_PROCESSOR_TYPE = "source_map_symbolicator"
SOURCEMAP_PROCESSOR_VERSION = "1.0.4"
PROGUARD_PROCESSOR_TYPE = "proguard_symbolicator"
PROGUARD_PROCESSOR_VERSION = "1.0.1"
DSYM_PROCESSOR_TYPE = "dsym_symbolicator"
DSYM_PROCESSOR_VERSION = "1.0.2"

DEFAULT_TIMEOUT_SECONDS = 5.0
DEFAULT_CACHE_SIZE = 128


@dataclass
class SourceMapConfig:
    """sourcemapprocessor defaults (sourcemapprocessor/factory.go:24-53)."""

    symbolicator_failure_attribute_key: str = "exception.symbolicator.failed"
    symbolicator_error_attribute_key: str = "exception.symbolicator.error"
    symbolicator_parsing_method_attribute_key: str = "exception.symbolicator.parsing_method"
    columns_attribute_key: str = "exception.structured_stacktrace.columns"
    functions_attribute_key: str = "exception.structured_stacktrace.functions"
    lines_attribute_key: str = "exception.structured_stacktrace.lines"
    urls_attribute_key: str = "exception.structured_stacktrace.urls"
    stack_trace_attribute_key: str = "exception.stacktrace"
    exception_type_attribute_key: str = "exception.type"
    exception_message_attribute_key: str = "exception.message"
    preserve_stack_trace: bool = True
    original_stack_trace_attribute_key: str = "exception.stacktrace.original"
    original_columns_attribute_key: str = "exception.structured_stacktrace.columns.original"
    original_functions_attribute_key: str = "exception.structured_stacktrace.functions.original"
    original_lines_attribute_key: str = "exception.structured_stacktrace.lines.original"
    original_urls_attribute_key: str = "exception.structured_stacktrace.urls.original"
    build_uuid_attribute_key: str = "app.debug.source_map_uuid"
    source_map_store: str = "file_store"
    local_path: str = "."
    # S3/GCS store config parity (S3SourceMapConfiguration /
    # GCSSourceMapConfiguration, sourcemapprocessor/config.go:114-128):
    # bucket name, AWS region, in-bucket key prefix.
    bucket: str = ""
    region: str = ""
    store_prefix: str = ""
    timeout: float = DEFAULT_TIMEOUT_SECONDS
    source_map_cache_size: int = DEFAULT_CACHE_SIZE
    language_attribute_key: str = "telemetry.sdk.language"
    allowed_languages: list[str] = field(default_factory=list)
    enable_parity_checking: bool = False


@dataclass
class ProguardConfig:
    """proguardprocessor defaults (proguardprocessor/factory.go:26-54)."""

    symbolicator_failure_attribute_key: str = "exception.symbolicator.failed"
    symbolicator_error_attribute_key: str = "exception.symbolicator.error"
    symbolicator_parsing_method_attribute_key: str = "exception.symbolicator.parsing_method"
    classes_attribute_key: str = "exception.structured_stacktrace.classes"
    methods_attribute_key: str = "exception.structured_stacktrace.methods"
    lines_attribute_key: str = "exception.structured_stacktrace.lines"
    source_files_attribute_key: str = "exception.structured_stacktrace.source_files"
    stack_trace_attribute_key: str = "exception.stacktrace"
    exception_type_attribute_key: str = "exception.type"
    exception_message_attribute_key: str = "exception.message"
    preserve_stack_trace: bool = True
    original_stack_trace_attribute_key: str = "exception.stacktrace.original"
    original_classes_attribute_key: str = "exception.structured_stacktrace.classes.original"
    original_methods_attribute_key: str = "exception.structured_stacktrace.methods.original"
    original_lines_attribute_key: str = "exception.structured_stacktrace.lines.original"
    original_source_files_attribute_key: str = "exception.structured_stacktrace.source_files.original"
    proguard_uuid_attribute_key: str = "app.debug.proguard_uuid"
    proguard_store: str = "file_store"
    local_path: str = "."
    # S3/GCS parity (proguardprocessor/config.go S3/GCS structs).
    bucket: str = ""
    region: str = ""
    store_prefix: str = ""
    timeout: float = DEFAULT_TIMEOUT_SECONDS
    proguard_cache_size: int = DEFAULT_CACHE_SIZE
    language_attribute_key: str = "telemetry.sdk.language"
    allowed_languages: list[str] = field(default_factory=list)


@dataclass
class DsymConfig:
    """dsymprocessor defaults (dsymprocessor/factory.go:24-46)."""

    symbolicator_failure_attribute_key: str = "exception.symbolicator.failed"
    symbolicator_error_attribute_key: str = "exception.symbolicator.error"
    stack_trace_attribute_key: str = "exception.stacktrace"
    metrickit_stack_trace_attribute_key: str = "metrickit.diagnostic.crash.exception.stacktrace_json"
    output_metrickit_stack_trace_attribute_key: str = "exception.stacktrace"
    output_metrickit_exception_type_attribute_key: str = "exception.type"
    output_metrickit_exception_message_attribute_key: str = "exception.message"
    preserve_stack_trace: bool = True
    original_stack_trace_attribute_key: str = "exception.stacktrace.original"
    build_uuid_attribute_key: str = "app.debug.build_uuid"
    app_executable_attribute_key: str = "app.bundle.executable"
    dsym_store: str = "file_store"
    local_path: str = "."
    # S3/GCS parity (dsymprocessor/config.go:81-95).
    bucket: str = ""
    region: str = ""
    store_prefix: str = ""
    timeout: float = DEFAULT_TIMEOUT_SECONDS
    dsym_cache_size: int = DEFAULT_CACHE_SIZE
    language_attribute_key: str = "telemetry.sdk.language"
    allowed_languages: list[str] = field(default_factory=list)


@dataclass
class PipelineConfig:
    """Config for the full routed symbolication pipeline.

    The chain mirrors the reference collector's logs pipeline
    (config.yaml:28-31: dsym -> proguard, plus the traces pipeline's
    sourcemap processor appended), with per-platform language allowlists
    used as the routing predicate (operator G4, SURVEY.md §2.2).
    """

    artifacts_dir: str = "."
    dsym: DsymConfig = field(default_factory=DsymConfig)
    proguard: ProguardConfig = field(default_factory=ProguardConfig)
    sourcemap: SourceMapConfig = field(default_factory=SourceMapConfig)
    # Actor-pool sizing for the symbolizer stage.
    concurrency: int | tuple[int, int] = 4
    batch_size: int = 512
    # Salt fan-out for hot debug-ids in the pre-symbolizer repartition.
    salt_buckets: int = 4
    # Cross-actor single-flight artifact fetch via the shared named
    # cache actor (state/artifact_cache.py) — the distributed analogue
    # of the reference's singleflight.Group.  Opt-in: with debug-id
    # affinity routing, cold misses rarely overlap, and the per-actor
    # LRU serves all warm traffic.
    shared_artifact_cache: bool = False
    # Number of coordinator shards for the shared cache (keys route by
    # crc32(key) % shards).  1 is right for a single node; large
    # clusters shard so cold-miss coordination scales horizontally.
    artifact_cache_shards: int = 1
    # Which processors are active (collector service.pipelines parity:
    # a processor absent from every pipeline must not touch records).
    enabled_processors: list[str] = field(
        default_factory=lambda: ["dsym", "proguard", "sourcemap"]
    )

    @staticmethod
    def with_default_routing(artifacts_dir: str, **kw) -> "PipelineConfig":
        """Routing config used by the flagship pipeline: disjoint
        per-platform language allowlists (js/android/apple)."""
        return PipelineConfig(
            artifacts_dir=artifacts_dir,
            dsym=DsymConfig(
                local_path=f"{artifacts_dir}/dsyms",
                allowed_languages=["swift"],
            ),
            proguard=ProguardConfig(
                local_path=f"{artifacts_dir}/proguard",
                allowed_languages=["java", "kotlin"],
            ),
            sourcemap=SourceMapConfig(
                local_path=f"{artifacts_dir}/sourcemaps",
                allowed_languages=["webjs", "javascript"],
            ),
            **kw,
        )

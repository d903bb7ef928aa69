"""JS (source map) symbolication: operators Y1/Y5/Y6/Y7 + the frame loop
of SURVEY.md §2.5, a behavioral port of sourcemapprocessor/processor.go
and symbolicator.go re-expressed as per-record functions executed inside
a Ray actor-pool ``map_batches`` stage.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from ..config import SOURCEMAP_PROCESSOR_TYPE, SOURCEMAP_PROCESSOR_VERSION, SourceMapConfig
from ..errors import (
    FetchError,
    MismatchedLengthError,
    MissingAttributeError,
    PartialSymbolicationError,
    SourceMapFetchError,
    StackTraceParseError,
    StoreError,
    SymbolicationError,
)
from ..functions.js_stack_parser import JsParseError, JsStackTrace, compute_stack_trace
from ..functions.sourcemap import SourceMapCache, SourceMapError
from ..sources.stores import SourceMapStore
from ..state.lru import LRUCache
from .attr_utils import get_slice, get_str, language_gate, value_int, value_str

MAX_UINT32 = 0xFFFFFFFF


def build_cache_key(url: str, build_uuid: str) -> str:
    """sourcemapprocessor/symbolicator.go:18-23."""
    if build_uuid == "":
        return url
    return url + "|" + build_uuid


@dataclass
class MappedStackFrame:
    function_name: str
    url: str
    line: int
    col: int


@dataclass
class ProcessStats:
    processed: bool = False
    frames_processed: int = 0
    frames_failed: int = 0
    fetch_failures: int = 0


class JsSymbolicator:
    """Per-actor stateful symbolizer: store client + LRU of parsed
    SourceMapCache objects (sourcemapprocessor/symbolicator.go:43-147).

    The reference's 1-slot semaphore (Y4) is deliberately replaced by
    actor-level serialization — an actor processes one batch at a time,
    and throughput scales with pool size instead.  The per-lookup timeout
    is retained as a wall-clock budget on fetch+parse producing the same
    FetchError("timeout") text."""

    def __init__(self, store: SourceMapStore, timeout: float = 5.0, cache_size: int = 128) -> None:
        self.store = store
        self.timeout = timeout
        self.cache: LRUCache[SourceMapCache] = LRUCache(cache_size)
        self.fetch_failures = 0

    def symbolicate(
        self, line: int, column: int, function: str, url: str, uuid: str
    ) -> MappedStackFrame:
        """sourcemapprocessor/symbolicator.go:78-109."""
        if column < 0 or column > MAX_UINT32:
            raise SymbolicationError(f"column must be uint32: {column}")
        if line < 0 or line > MAX_UINT32:
            raise SymbolicationError(f"line must be uint32: {line}")
        if url == "":
            # No URL => native-ish frame, pass through unchanged.
            return MappedStackFrame(function_name=function, url=url, line=line, col=column)

        token = self._limited_symbolicate(line, column, url, uuid)
        return MappedStackFrame(
            function_name=token.function_name, url=token.src, line=token.line, col=token.col
        )

    def _limited_symbolicate(self, line: int, column: int, url: str, uuid: str):
        cache_key = build_cache_key(url, uuid)
        smc = self.cache.get(cache_key)
        if smc is None:
            started = time.monotonic()
            try:
                source, source_map = self.store.get_source_map(url, uuid)
            except StoreError as exc:
                self.fetch_failures += 1
                raise SourceMapFetchError(url, exc)
            if time.monotonic() - started > self.timeout:
                raise SourceMapFetchError(url, SymbolicationError("timeout"))
            smc = SourceMapCache(source.decode("utf-8", errors="replace"),
                                 source_map.decode("utf-8", errors="replace"))
            self.cache.put(cache_key, smc)
        try:
            return smc.lookup(line, column, 0)
        except SourceMapError as exc:
            raise SymbolicationError(str(exc))


def format_stack_frame(sf: MappedStackFrame) -> str:
    """sourcemapprocessor/processor.go:113-117."""
    return f"    at {sf.function_name}({sf.url}:{sf.line}:{sf.col})"


@dataclass
class JsLogProcessor:
    """processAttributes / processThrow (sourcemapprocessor/processor.go:
    120-391), mutating plain-dict attribute maps in place."""

    cfg: SourceMapConfig
    symbolicator: JsSymbolicator | object = None
    stats: ProcessStats = field(default_factory=ProcessStats)

    def process_attributes(self, attributes: dict, resource_attributes: dict) -> bool:
        """Returns True when the record was processed (gate G1 + G4
        passed); used by the pipeline for sink routing."""
        cfg = self.cfg
        if cfg.stack_trace_attribute_key not in attributes:
            return False
        if not language_gate(
            attributes, resource_attributes, cfg.language_attribute_key, cfg.allowed_languages
        ):
            return False

        attributes["honeycomb.processor_type"] = SOURCEMAP_PROCESSOR_TYPE
        attributes["honeycomb.processor_version"] = SOURCEMAP_PROCESSOR_VERSION

        try:
            self._process_throw(attributes, resource_attributes)
        except SymbolicationError as err:
            attributes[cfg.symbolicator_failure_attribute_key] = True
            attributes[cfg.symbolicator_error_attribute_key] = str(err)
        else:
            attributes[cfg.symbolicator_failure_attribute_key] = False
        return True

    def _process_throw(self, attributes: dict, resource_attributes: dict) -> None:
        cfg = self.cfg

        exception_type, has_type = get_str(attributes, cfg.exception_type_attribute_key)
        exception_message, has_message = get_str(attributes, cfg.exception_message_attribute_key)

        lines, has_lines = get_slice(attributes, cfg.lines_attribute_key)
        columns, has_columns = get_slice(attributes, cfg.columns_attribute_key)
        functions, has_functions = get_slice(attributes, cfg.functions_attribute_key)
        urls, has_urls = get_slice(attributes, cfg.urls_attribute_key)
        raw_stack, has_raw = get_str(attributes, cfg.stack_trace_attribute_key)

        parsed: JsStackTrace | None = None
        if not (has_lines and has_columns and has_functions and has_urls):
            if not has_raw:
                raise MissingAttributeError(
                    "missing structured stack trace attributes and "
                    f"{cfg.stack_trace_attribute_key} attribute is missing"
                )
            try:
                parsed = compute_stack_trace(exception_type, exception_message, raw_stack)
            except JsParseError as exc:
                raise StackTraceParseError(cfg.stack_trace_attribute_key, str(exc))

            attributes[cfg.exception_type_attribute_key] = parsed.name
            exception_type, has_type = get_str(attributes, cfg.exception_type_attribute_key)
            attributes[cfg.exception_message_attribute_key] = parsed.message
            exception_message, has_message = get_str(
                attributes, cfg.exception_message_attribute_key
            )
            attributes[cfg.symbolicator_parsing_method_attribute_key] = "processor_parsed"
        else:
            attributes[cfg.symbolicator_parsing_method_attribute_key] = (
                "structured_stacktrace_attributes"
            )

        if (
            cfg.enable_parity_checking
            and has_raw
            and has_lines
            and has_columns
            and has_functions
            and has_urls
        ):
            parity_started = time.monotonic()
            try:
                collector_parsed = compute_stack_trace(exception_type, exception_message, raw_stack)
            except JsParseError:
                collector_parsed = None
            add_parity_check_attributes(
                attributes, lines, columns, functions, urls, collector_parsed,
                time.monotonic() - parity_started,
            )

        build_uuid = ""
        if cfg.build_uuid_attribute_key in resource_attributes:
            build_uuid = value_str(resource_attributes[cfg.build_uuid_attribute_key])

        stack: list[str] = []
        symbolication_failed = False

        if has_type and has_message:
            stack.append(f"{exception_type}: {exception_message}")

        fetch_error_cache: dict[str, SymbolicationError] = {}

        mapped_columns: list = []
        mapped_functions: list = []
        mapped_lines: list = []
        mapped_urls: list = []

        if parsed is not None:
            iter_count = len(parsed.frames)
            if cfg.preserve_stack_trace:
                attributes[cfg.original_stack_trace_attribute_key] = raw_stack
        else:
            iter_count = len(columns)
            # PutEmptySlice on the output keys happens BEFORE the length
            # check (processor.go:253-267): a mismatched record is left
            # with emptied structured attrs.
            attributes[cfg.columns_attribute_key] = mapped_columns
            attributes[cfg.functions_attribute_key] = mapped_functions
            attributes[cfg.lines_attribute_key] = mapped_lines
            attributes[cfg.urls_attribute_key] = mapped_urls

            if not (len(columns) == len(functions) == len(lines) == len(urls)):
                raise MismatchedLengthError(
                    f"({cfg.columns_attribute_key} {len(columns)}) "
                    f"({cfg.functions_attribute_key} {len(functions)}) "
                    f"({cfg.lines_attribute_key} {len(lines)}) "
                    f"({cfg.urls_attribute_key} {len(urls)})"
                )

            if cfg.preserve_stack_trace:
                attributes[cfg.original_columns_attribute_key] = list(columns)
                attributes[cfg.original_functions_attribute_key] = list(functions)
                attributes[cfg.original_lines_attribute_key] = list(lines)
                attributes[cfg.original_urls_attribute_key] = list(urls)
                attributes[cfg.original_stack_trace_attribute_key] = raw_stack

        for i in range(iter_count):
            if parsed is not None:
                frame = parsed.frames[i]
                url = frame.url
                function = frame.func_name
                line = frame.line if frame.line is not None else -1
                column = frame.column if frame.column is not None else -1
            else:
                url = value_str(urls[i])
                line = value_int(lines[i])
                column = value_int(columns[i])
                function = value_str(functions[i])

            self.stats.frames_processed += 1

            if url == "<anonymous>":
                stack.append(f"    at {function} (<anonymous>)")
                if parsed is None:
                    mapped_columns.append(column)
                    mapped_functions.append(function)
                    mapped_lines.append(line)
                    mapped_urls.append(url)
                continue

            if url in ("(native)", "[native code]"):
                stack.append(f"    at {function} (native)")
                if parsed is None:
                    mapped_columns.append(column)
                    mapped_functions.append(function)
                    mapped_lines.append(line)
                    mapped_urls.append(url)
                continue

            cache_key = build_cache_key(url, build_uuid)

            mapped: MappedStackFrame | None = None
            err: SymbolicationError | None = None
            if cache_key in fetch_error_cache:
                err = fetch_error_cache[cache_key]
            else:
                try:
                    mapped = self.symbolicator.symbolicate(line, column, function, url, build_uuid)
                except SymbolicationError as exc:
                    err = exc
                    # Only FetchErrors are cached (processor.go:349-355).
                    if isinstance(exc, FetchError):
                        fetch_error_cache[cache_key] = exc

            if err is not None:
                symbolication_failed = True
                stack.append(
                    f"\tFailed to symbolicate {function} at {url}:{line}:{column}: {err}"
                )
                if parsed is None:
                    mapped_columns.append(-1)
                    mapped_functions.append("")
                    mapped_lines.append(-1)
                    mapped_urls.append("")
                self.stats.frames_failed += 1
            else:
                stack.append(format_stack_frame(mapped))
                if parsed is None:
                    mapped_columns.append(mapped.col)
                    mapped_functions.append(mapped.function_name)
                    mapped_lines.append(mapped.line)
                    mapped_urls.append(mapped.url)

        attributes[cfg.stack_trace_attribute_key] = "\n".join(stack)

        if symbolication_failed:
            raise PartialSymbolicationError()


def add_parity_check_attributes(
    attributes: dict,
    tracekit_lines: list,
    tracekit_columns: list,
    tracekit_functions: list,
    tracekit_urls: list,
    parsed: JsStackTrace | None,
    duration_seconds: float,
) -> None:
    """Parity-checking mode (sourcemapprocessor/parity.go:41-127)."""
    attributes["tracekit.lines"] = list(tracekit_lines)
    attributes["tracekit.columns"] = list(tracekit_columns)
    attributes["tracekit.functions"] = list(tracekit_functions)
    attributes["tracekit.urls"] = list(tracekit_urls)

    processor_lines: list = []
    processor_columns: list = []
    processor_functions: list = []
    processor_urls: list = []
    if parsed is not None:
        for frame in parsed.frames:
            processor_urls.append(frame.url if frame.url != "" else None)
            processor_functions.append(frame.func_name if frame.func_name != "" else None)
            processor_lines.append(frame.line)
            processor_columns.append(frame.column)
    attributes["processorParser.lines"] = processor_lines
    attributes["processorParser.columns"] = processor_columns
    attributes["processorParser.functions"] = processor_functions
    attributes["processorParser.urls"] = processor_urls

    tracekit_valid = (
        len(tracekit_lines) == len(tracekit_columns)
        and len(tracekit_lines) == len(tracekit_functions)
        and len(tracekit_lines) == len(tracekit_urls)
    )
    processor_valid = parsed is not None

    status = "consistent"
    total_mismatches = 0
    comparisons: list[str] = []
    attributes["parity.stackframe.comparison"] = comparisons

    if not tracekit_valid and not processor_valid:
        status = "all-parsing-failed"
    elif not tracekit_valid and processor_valid:
        status = "tracekit-failed"
    elif tracekit_valid and not processor_valid:
        status = "processor-parser-failed"
    elif len(tracekit_columns) != len(processor_columns):
        status = "different"
    else:
        for i in range(len(processor_columns)):
            if (
                value_int(processor_columns[i]) != value_int(tracekit_columns[i])
                or value_int(processor_lines[i]) != value_int(tracekit_lines[i])
                or value_str(processor_functions[i]) != value_str(tracekit_functions[i])
                or value_str(processor_urls[i]) != value_str(tracekit_urls[i])
            ):
                comparisons.append("different")
                status = "different"
                total_mismatches += 1
            else:
                comparisons.append("consistent")

    attributes["parity.status"] = status
    attributes["parity.totalMismatches"] = total_mismatches
    attributes["parity.processorParsingDuration"] = duration_seconds

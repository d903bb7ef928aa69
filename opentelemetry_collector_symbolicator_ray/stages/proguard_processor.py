"""Android (ProGuard) symbolication: operators Y2/Y5/Y6/Y7 + the frame
loop of SURVEY.md §2.5, a behavioral port of
proguardprocessor/log_processor.go and symbolicator.go.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from ..config import PROGUARD_PROCESSOR_TYPE, PROGUARD_PROCESSOR_VERSION, ProguardConfig
from ..errors import (
    FetchError,
    MismatchedLengthError,
    MissingAttributeError,
    PartialSymbolicationError,
    ProguardFetchError,
    StackTraceParseError,
    StoreError,
    SymbolicationError,
)
from ..functions.java_stack_parser import JavaParseError, JavaStackTrace, parse_stack_trace
from ..functions.proguard import ProguardMapper, RemappedJavaFrame
from ..sources.stores import ProguardStore
from ..state.lru import LRUCache
from .attr_utils import get_slice, get_str, language_gate, value_int, value_str

MAX_UINT32 = 0xFFFFFFFF


class ProguardSymbolicator:
    """Per-actor stateful symbolizer: store client + LRU of parsed
    ProguardMapper objects (proguardprocessor/symbolicator.go:34-143)."""

    def __init__(self, store: ProguardStore, timeout: float = 5.0, cache_size: int = 128) -> None:
        self.store = store
        self.timeout = timeout
        self.cache: LRUCache[ProguardMapper] = LRUCache(cache_size)
        self.fetch_failures = 0

    def symbolicate(
        self, uuid: str, class_name: str, method: str, line: int
    ) -> list[RemappedJavaFrame]:
        mapper = self.cache.get(uuid)
        if mapper is None:
            started = time.monotonic()
            try:
                mapping_bytes = self.store.get_proguard_mapping(uuid)
            except StoreError as exc:
                self.fetch_failures += 1
                raise ProguardFetchError(uuid, exc)
            if time.monotonic() - started > self.timeout:
                raise ProguardFetchError(uuid, SymbolicationError("timeout"))
            mapper = ProguardMapper(mapping_bytes.decode("utf-8", errors="replace"))
            self.cache.put(uuid, mapper)
        return mapper.remap_frame(class_name, method, line)


@dataclass
class ProguardLogProcessor:
    """processLogRecord / processLogRecordThrow
    (proguardprocessor/log_processor.go:66-314)."""

    cfg: ProguardConfig
    symbolicator: ProguardSymbolicator | object = None
    stats: object = None

    def __post_init__(self):
        if self.stats is None:
            from .js_processor import ProcessStats

            self.stats = ProcessStats()

    def process_attributes(self, attributes: dict, resource_attributes: dict) -> bool:
        cfg = self.cfg
        if cfg.stack_trace_attribute_key not in attributes:
            return False
        if not language_gate(
            attributes, resource_attributes, cfg.language_attribute_key, cfg.allowed_languages
        ):
            return False

        attributes["honeycomb.processor_type"] = PROGUARD_PROCESSOR_TYPE
        attributes["honeycomb.processor_version"] = PROGUARD_PROCESSOR_VERSION

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

        # ProGuard UUID from record or resource attrs
        # (log_processor.go:117-124).
        if cfg.proguard_uuid_attribute_key in attributes:
            uuid = value_str(attributes[cfg.proguard_uuid_attribute_key])
        elif cfg.proguard_uuid_attribute_key in resource_attributes:
            uuid = value_str(resource_attributes[cfg.proguard_uuid_attribute_key])
        else:
            raise MissingAttributeError(cfg.proguard_uuid_attribute_key)

        exception_type, has_type = get_str(attributes, cfg.exception_type_attribute_key)
        exception_message, has_message = get_str(attributes, cfg.exception_message_attribute_key)

        classes, has_classes = get_slice(attributes, cfg.classes_attribute_key)
        methods, has_methods = get_slice(attributes, cfg.methods_attribute_key)
        lines, has_lines = get_slice(attributes, cfg.lines_attribute_key)
        source_files, has_source_files = get_slice(attributes, cfg.source_files_attribute_key)
        raw_stack, has_raw = get_str(attributes, cfg.stack_trace_attribute_key)

        parsed: JavaStackTrace | None = None
        if not (has_classes and has_methods and has_lines and has_source_files):
            if not has_raw:
                raise MissingAttributeError(
                    "missing structured stack trace attributes and "
                    f"{cfg.stack_trace_attribute_key} attribute is missing"
                )
            try:
                parsed = parse_stack_trace(raw_stack)
            except JavaParseError as exc:
                raise StackTraceParseError(cfg.stack_trace_attribute_key, str(exc))

            attributes[cfg.exception_type_attribute_key] = parsed.exception_type
            exception_type, has_type = get_str(attributes, cfg.exception_type_attribute_key)
            attributes[cfg.exception_message_attribute_key] = parsed.exception_message
            exception_message, has_message = get_str(
                attributes, cfg.exception_message_attribute_key
            )
            attributes[cfg.symbolicator_parsing_method_attribute_key] = "processor_parsed"
        else:
            attributes[cfg.symbolicator_parsing_method_attribute_key] = (
                "structured_stacktrace_attributes"
            )

        stack: list[str] = []
        symbolication_failed = False

        if has_type and has_message:
            stack.append(f"{exception_type}: {exception_message}")

        fetch_error_cache: dict[str, SymbolicationError] = {}

        mapped_classes: list = []
        mapped_methods: list = []
        mapped_lines: list = []

        if parsed is not None:
            iter_count = len(parsed.elements)
            if cfg.preserve_stack_trace:
                attributes[cfg.original_stack_trace_attribute_key] = raw_stack
        else:
            iter_count = len(classes)
            attributes[cfg.classes_attribute_key] = mapped_classes
            attributes[cfg.methods_attribute_key] = mapped_methods
            attributes[cfg.lines_attribute_key] = mapped_lines
            # NOTE: source_files attr is intentionally NOT rebuilt
            # (log_processor.go:192-194 only clears classes/methods/lines).

            if not (len(classes) == len(methods) == len(lines) == len(source_files)):
                raise MismatchedLengthError(
                    f"({cfg.classes_attribute_key} {len(classes)}) "
                    f"({cfg.methods_attribute_key} {len(methods)}) "
                    f"({cfg.lines_attribute_key} {len(lines)}) "
                    f"({cfg.source_files_attribute_key} {len(source_files)})"
                )

            if cfg.preserve_stack_trace:
                attributes[cfg.original_classes_attribute_key] = list(classes)
                attributes[cfg.original_methods_attribute_key] = list(methods)
                attributes[cfg.original_lines_attribute_key] = list(lines)
                attributes[cfg.original_source_files_attribute_key] = list(source_files)
                attributes[cfg.original_stack_trace_attribute_key] = raw_stack

        for i in range(iter_count):
            if parsed is not None:
                element = parsed.elements[i]
                if element.line != "":
                    # Preserve raw lines that couldn't be parsed as frames
                    # (log_processor.go:223-227).
                    stack.append(element.line)
                    continue
                class_name = element.frame.class_name
                method = element.frame.method
                line = element.frame.line
                source_file = element.frame.source_file
            else:
                class_name = value_str(classes[i])
                method = value_str(methods[i])
                line = value_int(lines[i])
                source_file = value_str(source_files[i])

            # -2 = native method, -1 = unknown source (Android docs);
            # anything below/beyond is invalid (log_processor.go:240-245).
            if line < -2 or line > MAX_UINT32:
                stack.append(f"\tInvalid line number {line} for {class_name}.{method}")
                symbolication_failed = True
                continue

            self.stats.frames_processed += 1

            mapped_frames: list[RemappedJavaFrame] | None = None
            err: SymbolicationError | None = None
            if uuid in fetch_error_cache:
                err = fetch_error_cache[uuid]
            else:
                try:
                    mapped_frames = self.symbolicator.symbolicate(uuid, class_name, method, line)
                except SymbolicationError as exc:
                    err = exc
                    if isinstance(exc, FetchError):
                        fetch_error_cache[uuid] = exc

            if err is not None:
                stack.append(f"\tFailed to symbolicate {class_name}.{method}({line}): {err}")
                symbolication_failed = True
                self.stats.frames_failed += 1
                continue

            if not mapped_frames:
                # No mapping found or needed: echo original frame
                # (log_processor.go:274-293).
                if parsed is None:
                    mapped_classes.append(class_name)
                    mapped_methods.append(method)
                    mapped_lines.append(line)

                if line == -2:
                    stack.append(f"\tat {class_name}.{method}(Native Method)")
                elif line == -1:
                    stack.append(f"\tat {class_name}.{method}(Unknown Source)")
                else:
                    stack.append(f"\tat {class_name}.{method}({source_file}:{line})")
                continue

            for mf in mapped_frames:
                if parsed is None:
                    mapped_classes.append(mf.class_name)
                    mapped_methods.append(mf.method_name)
                    mapped_lines.append(mf.line_number)
                stack.append(
                    f"\tat {mf.class_name}.{mf.method_name}({mf.source_file}:{mf.line_number})"
                )

        attributes[cfg.stack_trace_attribute_key] = "\n".join(stack)

        if symbolication_failed:
            raise PartialSymbolicationError()

"""Apple (dSYM) symbolication: operators Y3/Y5/Y6/Y7, the Apple
stack-line matcher (P5), the MetricKit JSON walker (P6/P7) and signal
dispatch (G3) — a behavioral port of dsymprocessor/logs_processor.go and
symbolicator.go.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field

from ..config import DSYM_PROCESSOR_TYPE, DSYM_PROCESSOR_VERSION, DsymConfig
from ..errors import DsymFetchError, FetchError, StoreError, SymbolicationError
from ..functions.dsymfile import DsymArchive, DsymLocation
from ..sources.stores import DsymStore
from ..state.lru import LRUCache
from .attr_utils import language_gate, value_str
from .js_processor import ProcessStats

# dsymprocessor/logs_processor.go:210-211.
# groups: stack index, library name, hex address, uuid or binary name, offset
_STACK_LINE_RE = re.compile(
    r"^([0-9]+)\s+([\w _\-\.]+[\w_\-\.])\s+(0x[\da-f]+)\s+([\w _\-\.]*) \+ (\d+)",
    re.A,  # RE2 \w/\d/\s are ASCII-only
)
_UUID_RE = re.compile(r"[0-9A-Z]{8}-[0-9A-Z]{4}-[0-9A-Z]{4}-[0-9A-Z]{4}-[0-9A-Z]{12}")

ERR_PARTIAL = "symbolication failed for some stack frames"


def is_uuid(maybe: str) -> bool:
    return _UUID_RE.search(maybe) is not None


class DsymSymbolicator:
    """Per-actor stateful symbolizer: store client + LRU of parsed
    archives keyed by "<debugId>/<binaryName>"
    (dsymprocessor/symbolicator.go:35-130)."""

    def __init__(self, store: DsymStore, timeout: float = 5.0, cache_size: int = 128) -> None:
        self.store = store
        self.timeout = timeout
        self.cache: LRUCache[DsymArchive] = LRUCache(cache_size)
        self.fetch_failures = 0

    def symbolicate_frame(self, debug_id: str, binary_name: str, addr: int) -> list[DsymLocation]:
        cache_key = f"{debug_id}/{binary_name}"
        archive = self.cache.get(cache_key)
        if archive is None:
            started = time.monotonic()
            try:
                dsym_bytes = self.store.get_dsym(debug_id, binary_name)
            except StoreError as exc:
                self.fetch_failures += 1
                raise DsymFetchError(debug_id, exc)
            if time.monotonic() - started > self.timeout:
                raise DsymFetchError(debug_id, SymbolicationError("timeout"))
            archive = DsymArchive(dsym_bytes)
            self.cache.put(cache_key, archive)
        return archive.lookup(debug_id, addr)


def _is_dsym_missing(err: Exception) -> bool:
    """errors.Is(err, errFailedToFindDSYM) equivalent — matches the bare
    store sentinel and a FetchError wrapping it."""
    return bool(getattr(err, "dsym_missing", False))


def format_stack_frames(prefix: str, binary_name: str, offset: int, frames: list[DsymLocation]) -> str:
    """dsymprocessor/logs_processor.go:126-133."""
    return "\n".join(
        f"{prefix} {loc.symbol} (in {binary_name}) ({loc.path}:{loc.line}) + {offset}"
        for loc in frames
    )


def format_metrickit_stack_frames(frame: dict, frames: list[DsymLocation]) -> str:
    """dsymprocessor/logs_processor.go:276-290."""
    offset = 0
    if frame.get("offsetIntoBinaryTextSegment") is not None:
        offset = frame["offsetIntoBinaryTextSegment"]
    elif frame.get("offsetAddress") is not None:
        offset = frame["offsetAddress"]
    binary = frame.get("binaryName", "")
    return "\n".join(
        f"{binary}\t\t\t0x{offset:X} {loc.symbol} ({loc.path}:{loc.line}) + {loc.sym_addr}"
        for loc in frames
    )


def get_first_available_string(attributes: dict, keys: list[str], fallback: str) -> str:
    for key in keys:
        if key in attributes:
            return value_str(attributes[key])
    return fallback


@dataclass
class DsymLogsProcessor:
    """Per-record routing + both symbolication routes
    (dsymprocessor/logs_processor.go:71-469)."""

    cfg: DsymConfig
    symbolicator: DsymSymbolicator | object = None
    stats: ProcessStats = field(default_factory=ProcessStats)

    def process_record(self, event_name: str, attributes: dict, resource_attributes: dict) -> bool:
        """Signal dispatch (G3 + G4): returns True when this processor
        handled the record (logs_processor.go:80-122)."""
        cfg = self.cfg
        if not language_gate(
            attributes, resource_attributes, cfg.language_attribute_key, cfg.allowed_languages
        ):
            return False

        if cfg.stack_trace_attribute_key in attributes:
            if event_name.startswith("metrickit.diagnostic."):
                self.process_metrickit_attributes(attributes)
            else:
                self.process_stack_trace_attributes(attributes, resource_attributes)
            return True

        if cfg.metrickit_stack_trace_attribute_key in attributes:
            self.process_metrickit_attributes(attributes)
            return True

        # neither attribute exists, do nothing (debug-log in reference)
        return False

    # ------- generic text route -------

    def process_stack_trace_attributes(self, attributes: dict, resource_attributes: dict) -> None:
        cfg = self.cfg
        attributes["honeycomb.processor_type"] = DSYM_PROCESSOR_TYPE
        attributes["honeycomb.processor_version"] = DSYM_PROCESSOR_VERSION
        try:
            self._process_stack_trace_throws(attributes, resource_attributes)
        except SymbolicationError as err:
            attributes[cfg.symbolicator_failure_attribute_key] = True
            attributes["exception.symbolicator.error"] = str(err)
        else:
            attributes[cfg.symbolicator_failure_attribute_key] = False

    def _process_stack_trace_throws(self, attributes: dict, resource_attributes: dict) -> None:
        cfg = self.cfg
        raw_stack = value_str(attributes.get(cfg.stack_trace_attribute_key, ""))

        if cfg.build_uuid_attribute_key not in resource_attributes:
            raise SymbolicationError(f"missing attribute: {cfg.build_uuid_attribute_key}")
        build_uuid = value_str(resource_attributes[cfg.build_uuid_attribute_key])

        if cfg.app_executable_attribute_key not in resource_attributes:
            raise SymbolicationError(f"missing attribute: {cfg.app_executable_attribute_key}")
        binary_name = value_str(resource_attributes[cfg.app_executable_attribute_key])

        lines = raw_stack.split("\n")
        res = []
        symbolication_failed = False
        fetch_error_cache: dict[str, SymbolicationError] = {}

        for line in lines:
            try:
                res.append(
                    self._symbolicate_stack_line(line, binary_name, build_uuid, fetch_error_cache)
                )
            except SymbolicationError:
                # Keep the original line, mark the record failed
                # (logs_processor.go:186-195).
                res.append(line)
                symbolication_failed = True

        if cfg.preserve_stack_trace:
            attributes[cfg.original_stack_trace_attribute_key] = raw_stack
        attributes[cfg.stack_trace_attribute_key] = "\n".join(res)

        if symbolication_failed:
            raise SymbolicationError(ERR_PARTIAL)

    def _symbolicate_stack_line(
        self,
        line: str,
        binary_name: str,
        build_uuid: str,
        fetch_error_cache: dict[str, SymbolicationError],
    ) -> str:
        """dsymprocessor/logs_processor.go:213-270."""
        m = _STACK_LINE_RE.search(line)
        if m is None:
            # not formatted the way we expect, skip it
            return line

        lib_name = m.group(2)
        uuid_or_binary = m.group(4)
        offset = int(m.group(5))

        if is_uuid(uuid_or_binary):
            uuid = uuid_or_binary
            bin_ = lib_name
        elif uuid_or_binary == binary_name:
            uuid = build_uuid
            bin_ = binary_name
        else:
            return line

        # Cached-error path returns the failure WITHOUT re-checking the
        # dsym-missing sentinel — a deliberate mirror of
        # logs_processor.go:241-243 (first miss leaves the line unchanged,
        # later frames with the same uuid mark the record failed).
        if uuid in fetch_error_cache:
            raise fetch_error_cache[uuid]

        err: SymbolicationError | None = None
        locations: list[DsymLocation] | None = None
        try:
            locations = self.symbolicator.symbolicate_frame(uuid, bin_, offset)
        except SymbolicationError as exc:
            err = exc
        self.stats.frames_processed += 1

        if err is not None and isinstance(err, FetchError):
            fetch_error_cache[uuid] = err

        if err is not None and _is_dsym_missing(err):
            return line
        if err is not None:
            self.stats.frames_failed += 1
            raise err

        # keep everything up to the end of match group 3 (the hex address)
        prefix = line[: m.end(3)]
        return format_stack_frames(prefix, bin_, offset, locations)

    # ------- MetricKit JSON route -------

    def process_metrickit_attributes(self, attributes: dict) -> None:
        cfg = self.cfg
        attributes["honeycomb.processor_type"] = DSYM_PROCESSOR_TYPE
        attributes["honeycomb.processor_version"] = DSYM_PROCESSOR_VERSION
        try:
            self._process_metrickit_throws(attributes)
        except SymbolicationError as err:
            attributes[cfg.symbolicator_failure_attribute_key] = True
            attributes["exception.symbolicator.error"] = str(err)
        else:
            attributes[cfg.symbolicator_failure_attribute_key] = False

    def _process_metrickit_throws(self, attributes: dict) -> None:
        cfg = self.cfg
        raw = value_str(attributes.get(cfg.metrickit_stack_trace_attribute_key, ""))

        try:
            report = json.loads(raw)
        except ValueError as exc:
            raise SymbolicationError(str(exc))
        if not isinstance(report, dict):
            raise SymbolicationError("invalid MetricKit crash report")

        call_stacks = report.get("callStacks") or []
        stacks: list[str] = []
        fetch_error_cache: dict[str, SymbolicationError] = {}

        for call_stack in call_stacks:
            symbolicated: list[str] = []

            # Old Apple format: depth-first along subFrames[0] chains
            # (logs_processor.go:366-382).
            root_frames = call_stack.get("callStackRootFrames")
            if root_frames:
                frame = root_frames[0]
                while frame is not None:
                    symbolicated.append(self._symbolicate_metrickit_frame(frame, fetch_error_cache))
                    sub = frame.get("subFrames")
                    frame = sub[0] if sub else None

            # New OTel flat format (logs_processor.go:385-393).
            flat = call_stack.get("callStackFrames")
            if flat is not None:
                for frame in flat:
                    symbolicated.append(self._symbolicate_metrickit_frame(frame, fetch_error_cache))

            stacks.append("\n    ".join(symbolicated))

        attributes[cfg.output_metrickit_stack_trace_attribute_key] = "\n\n\n".join(stacks)
        if not cfg.preserve_stack_trace:
            attributes.pop(cfg.metrickit_stack_trace_attribute_key, None)

        self._set_metrickit_exception_attrs(attributes)

    def _symbolicate_metrickit_frame(
        self, frame: dict, fetch_error_cache: dict[str, SymbolicationError]
    ) -> str:
        """dsymprocessor/logs_processor.go:435-469."""
        binary_uuid = frame.get("binaryUUID", "")
        binary_name = frame.get("binaryName", "")

        if binary_uuid in fetch_error_cache:
            raise fetch_error_cache[binary_uuid]

        offset = 0
        if frame.get("offsetAddress") is not None:
            offset = frame["offsetAddress"]
        if frame.get("offsetIntoBinaryTextSegment") is not None:
            offset = frame["offsetIntoBinaryTextSegment"]

        err: SymbolicationError | None = None
        locations: list[DsymLocation] | None = None
        try:
            locations = self.symbolicator.symbolicate_frame(binary_uuid, binary_name, offset)
        except SymbolicationError as exc:
            err = exc
        self.stats.frames_processed += 1

        if err is not None and isinstance(err, FetchError):
            fetch_error_cache[binary_uuid] = err

        if err is not None and _is_dsym_missing(err):
            return f"{binary_name}({binary_uuid}) +{offset}"
        if err is not None:
            self.stats.frames_failed += 1
            raise err

        return format_metrickit_stack_frames(frame, locations)

    def _set_metrickit_exception_attrs(self, attributes: dict) -> None:
        """dsymprocessor/logs_processor.go:409-433."""
        cfg = self.cfg
        exception_type = get_first_available_string(
            attributes,
            [
                "metrickit.diagnostic.crash.exception.objc.type",
                "metrickit.diagnostic.crash.exception.mach_exception.name",
                "metrickit.diagnostic.crash.exception.signal.name",
            ],
            "Unknown Error",
        )
        exception_msg = get_first_available_string(
            attributes,
            [
                "metrickit.diagnostic.crash.exception.objc.message",
                "metrickit.diagnostic.crash.exception.mach_exception.description",
                "metrickit.diagnostic.crash.exception.signal.description",
                "metrickit.diagnostic.crash.exception.termination_reason",
            ],
            "Unknown Error",
        )
        attributes[cfg.output_metrickit_exception_type_attribute_key] = exception_type
        attributes[cfg.output_metrickit_exception_message_attribute_key] = exception_msg

"""Error types whose messages are part of the row-equality surface.

The reference embeds error strings into symbolicated stack lines and the
``exception.symbolicator.error`` attribute, so message formats are ported
verbatim (sourcemapprocessor/symbolicator.go:25-37,
proguardprocessor/symbolicator.go:16-28, dsymprocessor/symbolicator.go:16-29,
processor error vars in each processor file).
"""

from __future__ import annotations

# Shared processor-level error texts (sourcemapprocessor/processor.go:20-24,
# proguardprocessor/log_processor.go:20-24, dsymprocessor/logs_processor.go:22-25).
ERR_MISSING_ATTRIBUTE = "missing attribute"
ERR_MISMATCHED_LENGTH = "mismatched stacktrace attribute lengths"
ERR_PARTIAL_SYMBOLICATION = "symbolication failed for some stack frames"

# Store sentinels (sourcemapprocessor/store.go:21-25, dsymprocessor/store.go:18-20).
ERR_FAILED_TO_FIND_SOURCE_FILE = "failed to find source file"
ERR_FAILED_TO_FIND_SOURCE_MAP_LOCATION = "failed to find source map location"
ERR_FAILED_TO_FIND_SOURCE_MAP = "failed to find source map"
ERR_FAILED_TO_FIND_DSYM = "failed to find dSYM file"


class SymbolicationError(Exception):
    """Base class; ``str(err)`` must equal the Go error text."""


class PartialSymbolicationError(SymbolicationError):
    def __init__(self) -> None:
        super().__init__(ERR_PARTIAL_SYMBOLICATION)


class MissingAttributeError(SymbolicationError):
    """Rendered as ``missing attribute: <detail>`` like Go %w wrapping."""

    def __init__(self, detail: str) -> None:
        super().__init__(f"{ERR_MISSING_ATTRIBUTE}: {detail}")


class MismatchedLengthError(SymbolicationError):
    def __init__(self, detail: str) -> None:
        super().__init__(f"{ERR_MISMATCHED_LENGTH}: {detail}")


class StackTraceParseError(SymbolicationError):
    """``failed to parse raw stack trace from <key>: <cause>``."""

    def __init__(self, attribute_key: str, cause: str) -> None:
        super().__init__(f"failed to parse raw stack trace from {attribute_key}: {cause}")


class StoreError(SymbolicationError):
    """A store-level miss; wrapped into a FetchError by symbolizers."""

    def __init__(self, message: str, *, dsym_missing: bool = False) -> None:
        super().__init__(message)
        # errFailedToFindDSYM identity survives FetchError wrapping
        # (dsymprocessor/logs_processor.go:256-258 uses errors.Is).
        self.dsym_missing = dsym_missing


class FetchError(SymbolicationError):
    """Cacheable fetch failure (404 / timeout).

    Only this error family is stored in the per-record negative cache
    (sourcemapprocessor/processor.go:349-355 and twins).
    """

    def __init__(self, message: str, cause: Exception | None = None) -> None:
        super().__init__(message)
        self.cause = cause

    @property
    def dsym_missing(self) -> bool:
        return isinstance(self.cause, StoreError) and self.cause.dsym_missing


class SourceMapFetchError(FetchError):
    """sourcemapprocessor/symbolicator.go:31-33."""

    def __init__(self, url: str, cause: Exception) -> None:
        super().__init__(f"failed to fetch source map for {url}: {cause}", cause)
        self.url = url


class ProguardFetchError(FetchError):
    """proguardprocessor/symbolicator.go:22-24."""

    def __init__(self, uuid: str, cause: Exception) -> None:
        super().__init__(f"failed to fetch ProGuard mapping for {uuid}: {cause}", cause)
        self.uuid = uuid


class DsymFetchError(FetchError):
    """dsymprocessor/symbolicator.go:23-25."""

    def __init__(self, debug_id: str, cause: Exception) -> None:
        super().__init__(f"failed to fetch dSYM for {debug_id}: {cause}", cause)
        self.debug_id = debug_id

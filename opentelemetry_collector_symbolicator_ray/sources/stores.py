"""Debug-artifact stores (operators S4-S9, SURVEY.md §2.1).

Each store mirrors the key-derivation and error semantics of its Go
counterpart (sourcemapprocessor/store.go:21-92, proguardprocessor/
store.go:18-55, dsymprocessor/store.go:18-45).  Stores are plain Python
objects constructed once per symbolizer actor (``__init__``), so artifact
reads happen inside the actor pool, never on the driver.

The ``fetch`` callable abstracts the backend: local filesystem by
default; any ``pyarrow.fs``-resolvable URI (s3://, gs://) via
``pyarrow_fetcher`` — the Ray-native equivalent of the reference's
S3/GCS store variants (sourcemapprocessor/store.go:94-166).
"""

from __future__ import annotations

import posixpath
import re
from typing import Callable
from urllib.parse import urlparse

from ..errors import (
    ERR_FAILED_TO_FIND_DSYM,
    ERR_FAILED_TO_FIND_SOURCE_FILE,
    ERR_FAILED_TO_FIND_SOURCE_MAP,
    ERR_FAILED_TO_FIND_SOURCE_MAP_LOCATION,
    StoreError,
)

# sourcemapprocessor/store.go:21 — the LAST match wins (store.go:64-65).
_MAPPING_URL_RE = re.compile(rb"//[#@]\s*sourceMappingURL\s*=\s*(\S+)")

Fetch = Callable[[str], bytes]


def _go_base(path: str) -> str:
    """filepath.Base semantics (trailing slashes stripped, "" -> ".")."""
    if path == "":
        return "."
    path = path.rstrip("/")
    if path == "":
        return "/"
    return path.rsplit("/", 1)[-1]


def _go_join(*parts: str) -> str:
    """filepath.Join semantics: join then Clean, "" parts skipped."""
    parts = tuple(p for p in parts if p != "")
    if not parts:
        return ""
    return posixpath.normpath(posixpath.join(*parts))


def local_fetcher() -> Fetch:
    def fetch(key: str) -> bytes:
        with open(key, "rb") as f:
            return f.read()

    return fetch


def object_store_fetcher(bucket_uri: str, fs=None) -> Fetch:
    """S3/GCS object fetch mirroring the reference's bucket stores
    (sourcemapprocessor/store.go:94-166, dsymprocessor/store.go and
    proguardprocessor/store.go twins): the store-derived key loses ONE
    leading slash (Go ``strings.TrimPrefix(key, "/")`` — object keys
    can't start with "/"), then ``GetObject(bucket, key)``.

    ``bucket_uri`` is ``s3://bucket`` / ``gs://bucket`` resolved via
    pyarrow.fs once per actor (construction only; no I/O until fetch).
    Tests inject ``fs`` (any pyarrow FileSystem, e.g. a local mock
    rooted at a fake bucket) to exercise the identical key derivation
    without network."""
    if fs is None:
        import pyarrow.fs as pafs

        fs, root = pafs.FileSystem.from_uri(bucket_uri)
    else:
        root = bucket_uri

    def fetch(key: str) -> bytes:
        if key.startswith("/"):
            key = key[1:]
        with fs.open_input_stream(root + "/" + key if root else key) as f:
            return f.read()

    return fetch


# Backwards-compatible alias (round-1 name).
pyarrow_fetcher = object_store_fetcher


class SourceMapStore:
    """GetSourceMap (sourcemapprocessor/store.go:33-78): URL -> basename,
    optional uuid prefix dir, preserved query string; fetch minified
    source; resolve the last ``sourceMappingURL`` comment relative to the
    source's directory; fetch the map."""

    def __init__(self, prefix: str, fetch: Fetch | None = None) -> None:
        self.prefix = prefix
        self.fetch = fetch or local_fetcher()

    def get_source_map(self, url: str, uuid: str) -> tuple[bytes, bytes]:
        u = urlparse(url)
        base = _go_base(u.path)
        if uuid != "":
            base = _go_join(uuid, base)
        path = _go_join(self.prefix, base)
        if u.query != "":
            path += "?" + u.query

        try:
            source = self.fetch(path)
        except OSError:
            raise StoreError(f"{ERR_FAILED_TO_FIND_SOURCE_FILE}: {path}")

        matches = _MAPPING_URL_RE.findall(source)
        if not matches:
            raise StoreError(f"{ERR_FAILED_TO_FIND_SOURCE_MAP_LOCATION}: {path}")
        map_name = matches[-1].decode("utf-8", errors="replace")

        # the map name is relative to the source file (store.go:67-68)
        path = _go_join(posixpath.dirname(path), map_name)

        try:
            source_map = self.fetch(path)
        except OSError:
            raise StoreError(f"{ERR_FAILED_TO_FIND_SOURCE_MAP}: {path}")

        return source, source_map


class ProguardStore:
    """GetProguardMapping (proguardprocessor/store.go:24-40):
    key = <prefix>/<uuid>.txt."""

    def __init__(self, prefix: str, fetch: Fetch | None = None) -> None:
        self.prefix = prefix
        self.fetch = fetch or local_fetcher()

    def get_proguard_mapping(self, uuid: str) -> bytes:
        key = _go_join(self.prefix, f"{uuid}.txt")
        try:
            return self.fetch(key)
        except OSError:
            # Mirrors Go's wrapped os.ReadFile error text
            # (proguardprocessor/store.go:32-35).
            raise StoreError(
                f"failed to fetch proguard mapping: open {key}: no such file or directory"
            )


class DsymStore:
    """GetDSYM (dsymprocessor/store.go:28-38):
    key = <prefix>/<debugId>.dSYM/Contents/Resources/DWARF/<binaryName>;
    misses carry the errFailedToFindDSYM sentinel identity, which the
    processor uses to leave frames untouched
    (dsymprocessor/logs_processor.go:256-258)."""

    def __init__(self, prefix: str, fetch: Fetch | None = None) -> None:
        self.prefix = prefix
        self.fetch = fetch or local_fetcher()

    def get_dsym(self, debug_id: str, binary_name: str) -> bytes:
        path = _go_join(
            self.prefix, f"{debug_id}.dSYM", "Contents", "Resources", "DWARF", binary_name
        )
        try:
            return self.fetch(path)
        except OSError:
            raise StoreError(f"{ERR_FAILED_TO_FIND_DSYM}: {path}", dsym_missing=True)


def make_store(
    kind: str,
    local_path: str,
    store_cls,
    *,
    bucket: str = "",
    region: str = "",
    prefix: str = "",
    fs=None,
):
    """Store selection by config key (operator S9;
    sourcemapprocessor/factory.go:62-69 and twins).

    - ``file_store``: local filesystem rooted at ``local_path``
      (LocalSourceMapConfiguration.Path).
    - ``s3_store`` / ``gcs_store``: object store fetch against
      ``bucket`` with the in-bucket ``prefix`` (S3/GCS *Configuration
      {bucket, prefix}; ``region`` keeps S3 config parity —
      pyarrow.fs.S3FileSystem resolves it at construction).  ``fs``
      injects a filesystem for tests (local mock bucket).
    """
    if kind == "file_store":
        return store_cls(local_path)
    if kind == "s3_store":
        uri = bucket if fs is not None else f"s3://{bucket}" + (f"?region={region}" if region else "")
        return store_cls(prefix, fetch=object_store_fetcher(uri, fs=fs))
    if kind == "gcs_store":
        uri = bucket if fs is not None else f"gs://{bucket}"
        return store_cls(prefix, fetch=object_store_fetcher(uri, fs=fs))
    raise ValueError(f"unknown store kind: {kind}")

"""S3/GCS store fetch-path tests against a mocked filesystem.

Mirrors the reference's bucket-store key semantics
(sourcemapprocessor/store.go:94-166: key = filepath.Join(prefix, ...)
with ONE leading "/" trimmed before GetObject(bucket, key); dsym and
proguard twins identical).  The mock records every derived key so the
tests assert the exact object paths a real S3/GCS client would see.
"""

from __future__ import annotations

import os

import pytest

from opentelemetry_collector_symbolicator_ray.errors import StoreError
from opentelemetry_collector_symbolicator_ray.sources.stores import (
    DsymStore,
    ProguardStore,
    SourceMapStore,
    make_store,
)


class RecordingFS:
    """Minimal pyarrow-FileSystem stand-in rooted at a local dir: the
    'bucket' is a subdirectory; every requested object key is recorded."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.keys: list[str] = []

    def open_input_stream(self, path: str):
        self.keys.append(path)
        full = os.path.join(self.root, path)
        if not os.path.isfile(full):
            raise FileNotFoundError(full)
        return open(full, "rb")


def put(root: str, key: str, data: bytes) -> None:
    full = os.path.join(root, key)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(data)


@pytest.fixture
def bucket(tmp_path):
    return RecordingFS(str(tmp_path))


def test_s3_sourcemap_key_derivation(bucket, tmp_path):
    """URL basename + uuid dir + prefix, fetched as bucket/prefix/...;
    the sourceMappingURL resolves relative to the source's directory."""
    put(
        str(tmp_path),
        "bkt/maps/abc123/app.min.js",
        b"code\n//# sourceMappingURL=app.min.js.map\n",
    )
    put(str(tmp_path), "bkt/maps/abc123/app.min.js.map", b'{"version":3}')

    store = make_store("s3_store", ".", SourceMapStore, bucket="bkt", prefix="maps", fs=bucket)
    source, source_map = store.get_source_map("https://cdn.example.com/assets/app.min.js", "abc123")
    assert source_map == b'{"version":3}'
    assert bucket.keys == ["bkt/maps/abc123/app.min.js", "bkt/maps/abc123/app.min.js.map"]


def test_s3_leading_slash_prefix_trimmed(bucket, tmp_path):
    """A '/'-rooted prefix loses exactly one leading slash before
    GetObject (store.go:112-117) — object keys can't start with '/'."""
    put(str(tmp_path), "bkt/maps/u1/a.js", b"x\n//# sourceMappingURL=a.js.map\n")
    put(str(tmp_path), "bkt/maps/u1/a.js.map", b"{}")

    store = make_store("s3_store", ".", SourceMapStore, bucket="bkt", prefix="/maps", fs=bucket)
    store.get_source_map("https://x/a.js", "u1")
    assert bucket.keys[0] == "bkt/maps/u1/a.js"


def test_sourcemap_query_string_preserved(bucket, tmp_path):
    """store.go:48-50: the raw query survives into the object key."""
    put(str(tmp_path), "bkt/maps/b.js?v=7", b"x\n//# sourceMappingURL=b.js.map\n")
    put(str(tmp_path), "bkt/maps/b.js.map", b"{}")

    store = make_store("s3_store", ".", SourceMapStore, bucket="bkt", prefix="maps", fs=bucket)
    store.get_source_map("https://x/assets/b.js?v=7", "")
    assert bucket.keys[0] == "bkt/maps/b.js?v=7"
    # the map resolves relative to the source's DIRECTORY (query dropped
    # with the basename), store.go:67-68
    assert bucket.keys[1] == "bkt/maps/b.js.map"


def test_gcs_proguard_key(bucket, tmp_path):
    """proguardprocessor/store.go: key = <prefix>/<uuid>.txt."""
    put(str(tmp_path), "pg-bkt/mappings/uuid-1.txt", b"a.B -> c:\n")
    store = make_store("gcs_store", ".", ProguardStore, bucket="pg-bkt", prefix="mappings", fs=bucket)
    assert store.get_proguard_mapping("uuid-1") == b"a.B -> c:\n"
    assert bucket.keys == ["pg-bkt/mappings/uuid-1.txt"]


def test_s3_dsym_key(bucket, tmp_path):
    """dsymprocessor/store.go: <prefix>/<debugId>.dSYM/Contents/
    Resources/DWARF/<binaryName>."""
    key = "d-bkt/dsyms/BUILD-1.dSYM/Contents/Resources/DWARF/MyApp"
    put(str(tmp_path), key, b"symbols")
    store = make_store("s3_store", ".", DsymStore, bucket="d-bkt", prefix="dsyms", fs=bucket)
    assert store.get_dsym("BUILD-1", "MyApp") == b"symbols"
    assert bucket.keys == [key]


def test_object_store_miss_keeps_error_texts(bucket):
    """Misses through the bucket path raise the same reference error
    sentinels as the file path (G6 failure flagging unchanged)."""
    sm = make_store("s3_store", ".", SourceMapStore, bucket="bkt", prefix="maps", fs=bucket)
    with pytest.raises(StoreError, match="failed to find source file"):
        sm.get_source_map("https://x/missing.js", "u")

    ds = make_store("gcs_store", ".", DsymStore, bucket="bkt", prefix="d", fs=bucket)
    with pytest.raises(StoreError, match="failed to find dSYM"):
        ds.get_dsym("NOPE", "Bin")


def test_unknown_store_kind_rejected():
    with pytest.raises(ValueError, match="unknown store kind"):
        make_store("ftp_store", ".", SourceMapStore)


def test_real_s3_gcs_filesystem_construction():
    """The un-mocked make_store path constructs REAL pyarrow
    S3FileSystem / GcsFileSystem instances from the `s3://bucket?region=`
    and `gs://bucket` URIs (construction + key derivation only — the
    sandbox has no network, and neither does construction need it when
    the region is explicit).  Exercises sources/stores.py make_store's
    non-injected branch end-to-end up to the GetObject call."""
    import pyarrow.fs as pafs

    from opentelemetry_collector_symbolicator_ray.sources.stores import (
        object_store_fetcher,
    )

    fs, root = pafs.FileSystem.from_uri("s3://test-bucket?region=us-east-1")
    assert type(fs).__name__ == "S3FileSystem"
    assert root == "test-bucket"
    assert fs.region == "us-east-1"

    # the real-construction store derives the same keys as the mocked
    # path; the fetch itself would need network, so only build it
    store = make_store(
        "s3_store", "", SourceMapStore, bucket="test-bucket",
        region="us-east-1", prefix="maps",
    )
    assert store.prefix == "maps"
    assert callable(store.fetch)

    gstore = make_store("gcs_store", "", ProguardStore, bucket="test-bucket", prefix="pg")
    assert callable(gstore.fetch)

    # leading-slash trim happens before GetObject regardless of backend
    recording = RecordingFS("/nonexistent-root")
    f = object_store_fetcher("bkt", fs=recording)
    with pytest.raises(FileNotFoundError):
        f("/maps/abc/app.js.map")
    assert recording.keys == ["bkt/maps/abc/app.js.map"]

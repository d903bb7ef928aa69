"""Multimodal column plumbing tests: deterministic container decode,
actor-pool stages, codec stub behavior."""

from __future__ import annotations

import numpy as np
import pytest

from opentelemetry_collector_symbolicator_ray.pipelines.multimodal import (
    AudioFeatureStage,
    ImageResizeStage,
    MediaDecoder,
    MediaStatsStage,
    VideoFrameSampleStage,
    decode_real_codec,
    media_stats,
    synth_media,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("media"))
    return synth_media(d, 60, seed=7)


def _load(media_dir):
    import pyarrow.parquet as pq
    import glob
    import pyarrow as pa

    return pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(f"{media_dir}/kind=*/*.parquet"))]
    )


def test_synth_deterministic(media_dir, tmp_path):
    other = synth_media(str(tmp_path / "m2"), 60, seed=7)
    a, b = _load(media_dir), _load(other)
    assert a.equals(b)
    assert set(a.column("kind").to_pylist()) == {"image", "audio", "video"}


def test_decoder_roundtrip(media_dir):
    table = _load(media_dir)
    dec = MediaDecoder()
    for kind, payload in zip(table.column("kind").to_pylist()[:12],
                             table.column("payload").to_pylist()[:12]):
        d = dec.decode(payload, "ocsr-raw")
        assert d["kind"] == kind
        if kind == "image":
            assert d["pixels"].shape[0] == d["width"] * d["height"]
        elif kind == "audio":
            assert d["samples"].dtype == np.int8
        else:
            assert d["frames"].shape[0] == d["n_frames"]
    assert dec.decoded == 12


def test_real_codec_stubbed():
    with pytest.raises(NotImplementedError, match="media library"):
        decode_real_codec("jpeg")
    dec = MediaDecoder()
    with pytest.raises(NotImplementedError):
        dec.decode(b"\xff\xd8\xff", "jpeg")


def test_stats_stage(media_dir):
    table = _load(media_dir)
    out = MediaStatsStage()(table)
    assert out.num_rows == table.num_rows
    assert set(out.column_names) == {
        "media_id", "kind", "dims", "n_items", "payload_bytes", "mean_value"
    }


def test_resize_stage(media_dir):
    table = _load(media_dir)
    out = ImageResizeStage(size=8)(table)
    assert out.num_rows == sum(1 for k in table.column("kind").to_pylist() if k == "image")
    assert set(out.column("width").to_pylist()) == {8}
    # re-encoded payloads decode again
    dec = MediaDecoder()
    d = dec.decode(out.column("payload")[0].as_py(), "ocsr-raw")
    assert (d["width"], d["height"]) == (8, 8)


def test_audio_and_video_stages(media_dir):
    table = _load(media_dir)
    audio = AudioFeatureStage()(table)
    assert audio.num_rows == sum(1 for k in table.column("kind").to_pylist() if k == "audio")
    assert all(v >= 0 for v in audio.column("rms_mean").to_pylist())
    video = VideoFrameSampleStage(stride=4)(table)
    assert video.num_rows > 0
    assert all(i % 4 == 0 for i in video.column("frame_index").to_pylist())


def test_media_pipeline_e2e(ray_session):
    ds = media_stats("/root/testdata/sf0.001")
    rows = ds.take_all()
    assert len(rows) >= 120
    # deterministic across runs
    rows2 = media_stats("/root/testdata/sf0.001").take_all()
    assert rows == rows2


def test_image_phash_and_near_dupes(ray_session):
    """dHash fingerprints + banded-LSH Hamming dedup find BOTH the
    planted exact duplicates (dist 0) and the noised near-duplicates
    (0 < dist <= max_dist), and nothing else."""
    from opentelemetry_collector_symbolicator_ray.pipelines.multimodal import (
        image_phash,
        image_phash_dupes,
    )

    ph = image_phash("/root/testdata/sf0.001")
    rows = ph.take_all()
    assert len(rows) >= 40
    assert all(isinstance(r["phash"], int) for r in rows)

    pairs = image_phash_dupes("/root/testdata/sf0.001").to_pylist()
    assert len(pairs) > 0
    dists = {r["dist"] for r in pairs}
    assert 0 in dists  # exact duplicates collide on all bands
    assert any(d > 0 for d in dists)  # noised near-dups survive banding
    assert all(0 <= r["dist"] <= 6 for r in pairs)
    assert all(r["media_a"] < r["media_b"] for r in pairs)
    # deterministic across runs
    pairs2 = image_phash_dupes("/root/testdata/sf0.001").to_pylist()
    assert pairs == pairs2


def test_video_scene_changes(ray_session):
    """v3 clips have 0-2 planted scene cuts; the detector finds strong
    boundaries (diff >> intra-scene noise) and nothing in single-scene
    clips beyond them."""
    from opentelemetry_collector_symbolicator_ray.pipelines.multimodal import (
        video_scene_changes,
    )

    rows = video_scene_changes("/root/testdata/sf0.001").take_all()
    assert len(rows) > 0
    assert all(r["frame_index"] >= 1 for r in rows)
    # planted cuts are hard (uniform-random base swap): diff scores far
    # above the +-4 intra-scene noise level
    assert all(r["diff_score"] > 20 for r in rows)
    # deterministic
    rows2 = video_scene_changes("/root/testdata/sf0.001").take_all()
    assert rows == rows2


def test_embedding_quantization_roundtrip(ray_session):
    """int8 quantization preserves geometry: reconstruction cosine vs
    the original > 0.999 for every vector; rmse small and recorded."""
    import numpy as np
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines.similarity import (
        quantize_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    q = quantize_embeddings(sf).take_all()
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pylist()
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in t}
    assert len(q) == len(orig)
    for r in q[:50]:
        rec = np.frombuffer(r["codes"], dtype=np.int8).astype(np.float64) * r["scale"]
        o = orig[r["vec_id"]]
        cos = float(rec @ o / (np.linalg.norm(rec) * np.linalg.norm(o)))
        assert cos > 0.999
        assert 0 <= r["rmse"] < 0.01


def test_audio_fingerprint_dupes(ray_session):
    """Envelope-hash dedup finds the planted exact and dithered audio
    duplicates across the banded-LSH path shared with image dedup."""
    from opentelemetry_collector_symbolicator_ray.pipelines.multimodal import (
        audio_fingerprint,
        audio_fingerprint_dupes,
    )

    fps = audio_fingerprint("/root/testdata/sf0.001").take_all()
    assert len(fps) >= 40
    pairs = audio_fingerprint_dupes("/root/testdata/sf0.001").to_pylist()
    assert len(pairs) > 0
    assert all(0 <= r["dist"] <= 6 for r in pairs)
    assert all(r["media_a"] < r["media_b"] for r in pairs)
    assert pairs == audio_fingerprint_dupes("/root/testdata/sf0.001").to_pylist()


def test_banded_hamming_degenerate_bucket_star_cap(ray_session):
    """A 1000-member hash bucket (all-identical fingerprints, e.g.
    thousands of near-black images) emits the O(n) star around the min
    id, not the 499500-pair clique — mirroring the text-LSH star cap."""
    import time

    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_symbolicator_ray.pipelines.multimodal import (
        banded_hamming_dupes,
    )

    n = 1000
    tbl = pa.table(
        {
            "media_id": pa.array([f"m{i:04d}" for i in range(n)], type=pa.string()),
            "hash64": pa.array([0x1234ABCD5678EF00] * n, type=pa.int64()),
        }
    )
    t0 = time.monotonic()
    pairs = banded_hamming_dupes(
        ray.data.from_arrow(tbl), "media_id", "hash64", max_dist=6, max_bucket=256
    ).to_pylist()
    elapsed = time.monotonic() - t0

    assert len(pairs) == n - 1  # star, not clique
    assert all(r["media_a"] == "m0000" for r in pairs)
    assert sorted(r["media_b"] for r in pairs) == [f"m{i:04d}" for i in range(1, n)]
    assert all(r["dist"] == 0 for r in pairs)
    assert elapsed < 120


def test_banded_hamming_small_bucket_still_clique(ray_session):
    """Below the cap the full verified clique is returned, with exact
    Hamming distances from the vectorized popcount."""
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_symbolicator_ray.pipelines.multimodal import (
        banded_hamming_dupes,
    )

    base = 0x0F0F0F0F0F0F0F0F
    tbl = pa.table(
        {
            "media_id": pa.array(["a", "b", "c"], type=pa.string()),
            "hash64": pa.array([base, base ^ 0b11, base ^ 0b100], type=pa.int64()),
        }
    )
    pairs = banded_hamming_dupes(
        ray.data.from_arrow(tbl), "media_id", "hash64", max_dist=6
    ).to_pylist()
    got = {(r["media_a"], r["media_b"]): r["dist"] for r in pairs}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 3}


def test_kind_partition_pruning(media_dir):
    """Single-kind scans list ONLY that kind's partition files — the
    other kinds' payload bytes never leave storage (VERDICT r3 #3)."""
    import os

    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines.multimodal import (
        MEDIA_COLUMNS,
        media_files,
    )

    all_files = media_files(media_dir)
    img_files = media_files(media_dir, "image")
    assert img_files and set(img_files) < set(all_files)
    assert all(f"{os.sep}kind=image{os.sep}" in p for p in img_files)
    for p in img_files:
        kinds = set(pq.read_table(p, columns=["kind"]).column("kind").to_pylist())
        assert kinds == {"image"}
    # the pruned scan reads ~1/3 of the table's payload bytes
    total = sum(os.path.getsize(p) for p in all_files)
    image_only = sum(os.path.getsize(p) for p in img_files)
    assert image_only < 0.6 * total
    assert "source" not in MEDIA_COLUMNS  # provenance col never shipped

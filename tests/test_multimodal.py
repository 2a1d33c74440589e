"""Multimodal plumbing: feature extraction, resize, frame sampling —
schemas, batch shapes and determinism (kernels stubbed by design)."""

from __future__ import annotations

import pytest

from waddleml_spark.llmops import multimodal
from waddleml_spark.session import read_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.docs_as_media(read_table(spark, SF_SMOKE, "documents")).cache()


def test_extract_features_schema_and_determinism(spark, media):
    out = multimodal.extract_features(media)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 500
    r0 = rows[0]
    assert r0.feat_dim == 8 and 0.0 <= r0.feat_mean <= 1.0
    assert len(r0.payload_sha) == 64
    # deterministic across runs
    again = {r.media_id: r.payload_sha for r in multimodal.extract_features(media).collect()}
    assert again[0] == r0.payload_sha


def test_resize_images_tracks_dims(spark, media):
    out = multimodal.resize_images(media.limit(50), 64, 32).collect()
    assert len(out) == 50
    assert all(r.width == 64 and r.height == 32 for r in out)
    assert all(len(r.payload) == 64 * 32 // 64 for r in out)


def test_sample_frames_fans_out(spark, media):
    frames = multimodal.sample_frames(media.limit(20), every_nth=2, max_frames=3).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert set(by_media) <= set(range(20)) and by_media
    for idxs in by_media.values():
        assert len(idxs) <= 3
        assert idxs == sorted(idxs)
        assert all(i % 2 == 0 for i in idxs)


def test_payload_stats_metadata_only(spark, media):
    row = multimodal.payload_stats(media).head()
    assert row.modality == "image" and row.n == 500
    assert row.min_bytes > 0 and row.total_bytes >= row.n * row.min_bytes


def test_frame_neardup_pairs_finds_shared_prefix(spark):
    from waddleml_spark.llmops.multimodal import chunk_fingerprints, frame_neardup_pairs

    base = bytes(range(256))  # 8 aligned 32-byte chunks
    rows = [
        (1, base),
        (2, base + b"tail-edit-only"),        # shares all 8 chunks with 1
        (3, bytes(reversed(base))),           # different content entirely
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {(r.id_a, r.id_b): r.shared_chunks for r in frame_neardup_pairs(media).collect()}
    assert pairs == {(1, 2): 8}
    fps = chunk_fingerprints(media).filter("media_id = 1").collect()
    assert len(fps) == 8 and len({r.chunk_sha for r in fps}) == 8

"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas — schema fidelity, 1->N frame fan-out, dedup by content hash,
and the documented real-decoder integration point."""

from __future__ import annotations

import pytest

from xboard_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", "image/png", 64, 64, None),
        (2, "image", b"\x89PNG-fake-bytes-1", "image/png", 64, 64, None),  # dup
        (3, "audio", b"RIFF-fake-wav", "audio/wav", None, None, 2500),
        (4, "video", b"ftyp-fake-mp4", "video/mp4", 320, 240, 3500),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_extract_features_schema_and_determinism(media):
    out = mm.extract_features(media)
    assert out.schema == mm.FEATURES_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1].content_sha == rows[2].content_sha  # same bytes, same hash
    assert rows[1].features == rows[2].features
    assert len(rows[1].features) == mm.FEATURE_DIM
    assert rows[1].n_bytes == len(b"\x89PNG-fake-bytes-1")


def test_sample_frames_fanout(media):
    frames = mm.sample_frames(media, every_ms=1000).collect()
    # only the video row fans out: 3500ms at 1000ms -> frames at 0,1000,2000,3000
    assert {r.media_id for r in frames} == {4}
    assert [r.frame_ms for r in sorted(frames, key=lambda r: r.frame_idx)] == [
        0,
        1000,
        2000,
        3000,
    ]
    assert len({r.frame_sha for r in frames}) == 4  # per-frame determinism


def test_media_summary_dedup_by_hash(media):
    summary = {r.kind: r for r in mm.media_summary(mm.extract_features(media)).collect()}
    assert summary["image"].n_media == 2
    assert summary["image"].n_distinct == 1  # the two images are byte-identical
    assert summary["video"].n_media == 1


def test_real_decoder_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, decoder="real")
    with pytest.raises(NotImplementedError):
        mm.sample_frames(media, decoder="real")

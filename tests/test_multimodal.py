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


def test_real_decoder_wav_ppm_end_to_end(spark):
    """decoder="real" actually decodes in this container: a generated
    RIFF/PCM WAV (audio) and a PPM P6 raster (image) go through the same
    mapInPandas plumbing and come back with physically-correct features."""
    import math
    import struct as st

    rate, dur, amp = 8000, 0.5, 0.5
    n = int(rate * dur)
    pcm = b"".join(
        st.pack("<h", int(amp * 32767 * math.sin(2 * math.pi * 440 * i / rate)))
        for i in range(n)
    )
    fmt = st.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    wav = (
        b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"data" + st.pack("<I", len(pcm)) + pcm
    )
    ppm = b"P6\n# test raster\n4 2\n255\n" + bytes([255, 0, 0]) * 8  # all red
    rows = [
        (10, "audio", wav, "audio/wav", None, None, 500),
        (11, "image", ppm, "image/x-portable-pixmap", 4, 2, None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in mm.extract_features(media, decoder="real").collect()
    }
    f = out[10].features
    assert abs(f[0] - dur) < 1e-6                      # duration_s
    assert abs(f[1] - rate / 48000.0) < 1e-6           # sample rate
    assert f[2] == 1.0                                 # mono
    assert abs(f[3] - amp / math.sqrt(2)) < 0.01       # sine rms = A/sqrt(2)
    assert abs(f[4] - amp) < 0.01                      # peak = A
    g = out[11].features
    assert abs(g[2] - 2.0) < 1e-6                      # aspect = 4/2
    assert abs(g[3] - 1.0) < 0.01 and g[4] < 0.01      # mean R=1, G=0
    assert len(f) == len(g) == mm.FEATURE_DIM


def test_real_decoder_gates_stay_explicit(spark, media):
    """Formats without a dependency-free codec still fail loudly at the
    documented integration point (mp4 video -> ffmpeg; non-WAV audio)."""
    with pytest.raises(Exception, match="ffmpeg"):  # fake mp4 bytes
        mm.extract_features(
            media.filter("kind = 'video'"), decoder="real"
        ).collect()
    with pytest.raises(Exception, match="WAV|ffmpeg"):  # fake RIFF bytes
        mm.extract_features(
            media.filter("kind = 'audio'"), decoder="real"
        ).collect()
    with pytest.raises(Exception, match="YUV4MPEG2|ffmpeg"):  # mp4 frames
        mm.sample_frames(media, decoder="real").collect()


def _y4m(w=4, h=2, fps=10, n_frames=5):
    """Minimal valid YUV4MPEG2 stream: C420, luma plane = frame index
    everywhere (so consecutive-frame motion is exactly 1/255)."""
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
    chroma = (w // 2) * (h // 2)
    frames = b"".join(
        b"FRAME\n" + bytes([i]) * (w * h) + b"\x80" * (2 * chroma)
        for i in range(n_frames)
    )
    return head + frames


def test_real_video_decoder_y4m(spark):
    """decoder="real" decodes y4m video in this container: geometry, fps,
    luma stats, and the frame-to-frame motion proxy all come from the
    actual planes, and frame sampling emits true frame indexes/hashes."""
    import hashlib

    payload = _y4m(w=4, h=2, fps=10, n_frames=5)
    media = spark.createDataFrame(
        [(9, "video", payload, "video/x-yuv4mpeg", 4, 2, 500)],
        mm.MEDIA_SCHEMA,
    )
    feats = mm.extract_features(media, decoder="real").collect()[0].features
    assert feats[0] == pytest.approx(4 / 1000)  # width
    assert feats[1] == pytest.approx(2 / 1000)  # height
    assert feats[3] == pytest.approx(5 / 100)  # n_frames
    assert feats[4] == pytest.approx(10 / 60)  # fps
    assert feats[5] == pytest.approx(0.5)  # duration s
    assert feats[6] == pytest.approx((0 + 1 + 2 + 3 + 4) / 5 / 255)  # luma mean
    assert feats[8] == pytest.approx(1 / 255)  # motion: +1 luma per frame

    # sample every 200ms at 10fps -> every 2nd frame: 0, 2, 4
    frames = sorted(
        mm.sample_frames(media, every_ms=200, decoder="real").collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in frames] == [0, 2, 4]
    assert [r.frame_ms for r in frames] == [0, 200, 400]
    assert frames[1].frame_sha == hashlib.sha256(bytes([2]) * 8).hexdigest()[:16]


def _ppm_bytes(pixels):
    """pixels: 2-D list of (r,g,b) rows -> PPM P6 payload."""
    h, w = len(pixels), len(pixels[0])
    body = bytes(c for row in pixels for px in row for c in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def test_image_ahash_and_neardup_pairs(spark):
    import xboard_spark.operators.multimodal as mm

    # 16x16 half-black/half-white pattern; a copy with ONE flipped pixel
    # (near-dup); and its inverse (far)
    base = [
        [(255, 255, 255) if x < 8 else (0, 0, 0) for x in range(16)]
        for _ in range(16)
    ]
    tweaked = [row[:] for row in base]
    tweaked[0][15] = (200, 200, 200)  # light pixel in the dark half
    inverse = [
        [(0, 0, 0) if x < 8 else (255, 255, 255) for x in range(16)]
        for _ in range(16)
    ]
    rows = [
        (1, "image", bytearray(_ppm_bytes(base)), "image/x-ppm", 16, 16, 0),
        (2, "image", bytearray(_ppm_bytes(tweaked)), "image/x-ppm", 16, 16, 0),
        (3, "image", bytearray(_ppm_bytes(inverse)), "image/x-ppm", 16, 16, 0),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    hashes = {r.media_id: r.ahash for r in mm.image_ahash(media).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(hashes[1], hashes[2]) <= 5
    assert ham(hashes[1], hashes[3]) > 5  # inverse flips every bit
    pairs = mm.image_neardup_pairs(media).collect()
    assert {(r.media_a, r.media_b) for r in pairs} == {(1, 2)}


def test_audio_ahash_and_neardup_pairs(spark):
    import math
    import struct as st

    import xboard_spark.operators.multimodal as mm

    def wav_bytes(samples):
        data = b"".join(
            st.pack("<h", max(-32768, min(32767, int(s * 32767))))
            for s in samples
        )
        hdr = (
            b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + st.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + st.pack("<I", len(data))
        )
        return hdr + data

    # loud burst then silence; a half-volume copy keeps the envelope
    # SHAPE; constant-amplitude tone has a flat (far) envelope
    burst = [math.sin(i / 3.0) for i in range(4000)] + [0.0] * 4000
    half = [0.5 * s for s in burst]
    tone = [0.8 * math.sin(i / 3.0) for i in range(8000)]
    rows = [
        (1, "audio", bytearray(wav_bytes(burst)), "audio/wav", 0, 0, 1000),
        (2, "audio", bytearray(wav_bytes(half)), "audio/wav", 0, 0, 1000),
        (3, "audio", bytearray(wav_bytes(tone)), "audio/wav", 0, 0, 1000),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    hashes = {r.media_id: r.ahash for r in mm.audio_ahash(media).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(hashes[1], hashes[2]) <= 5  # level shift preserves shape
    pairs = mm.audio_neardup_pairs(media).collect()
    assert (1, 2) in {(r.media_a, r.media_b) for r in pairs}
    assert (1, 3) not in {(r.media_a, r.media_b) for r in pairs}


def test_resize_images_geometry_and_neardup_property(spark):
    import xboard_spark.operators.multimodal as mm

    base = [
        [(255, 255, 255) if x < 8 else (0, 0, 0) for x in range(16)]
        for _ in range(16)
    ]
    rows = [(1, "image", bytearray(_ppm_bytes(base)), "image/x-ppm", 16, 16, 0),
            (2, "audio", bytearray(b"RIFF"), "audio/wav", 0, 0, 0)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    out = mm.resize_images(media, out_w=8, out_h=8).collect()
    # non-image rows are excluded; geometry and payload size are exact
    assert [r.media_id for r in out] == [1]
    r = out[0]
    assert (r.width, r.height) == (8, 8)
    body = bytes(r.content)
    assert body.startswith(b"P6\n8 8\n255\n")
    assert r.n_bytes == len(body) == len(b"P6\n8 8\n255\n") + 8 * 8 * 3
    # the resized payload decodes with the SAME decoder (round-trip)
    w, h, rgb = mm._ppm_decode(body)
    assert (w, h) == (8, 8)
    # structure preserved: left half light, right half dark
    assert rgb[:, :4].mean() > 0.9 and rgb[:, 4:].mean() < 0.1

    # near-dup property: a resized copy stays within ahash distance 5 of
    # the original (the whole point of perceptual dedup on thumbnails)
    both = spark.createDataFrame(
        [
            (1, "image", bytearray(_ppm_bytes(base)), "image/x-ppm", 16, 16, 0),
            (2, "image", bytearray(body), "image/x-ppm", 8, 8, 0),
        ],
        mm.MEDIA_SCHEMA,
    )
    pairs = mm.image_neardup_pairs(both, max_hamming=5).collect()
    assert any({p.media_a, p.media_b} == {1, 2} for p in pairs)


def _tiny_wav() -> bytes:
    import struct as st

    pcm = st.pack("<8h", 0, 8000, 16000, 8000, 0, -8000, -16000, -8000)
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (
        b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"data" + st.pack("<I", len(pcm)) + pcm
    )


def _write_shim(tmp_path, payload: bytes, rc: int = 0) -> str:
    """A stand-in ffmpeg: ignores its args, drains stdin, emits a fixed
    payload — tests the subprocess plumbing (argv shape, pipe I/O, error
    propagation) without the real binary, which this container lacks."""
    import base64

    shim = tmp_path / "ffmpeg-shim"
    shim.write_text(
        "#!/bin/sh\ncat > /dev/null\n"
        f"printf '%s' '{base64.b64encode(payload).decode()}' | base64 -d\n"
        f"exit {rc}\n"
    )
    shim.chmod(0o755)
    return str(shim)


def test_ffmpeg_fallback_transcodes_via_shim(tmp_path):
    """An 'mp3' payload (not RIFF) routed through the ffmpeg fallback
    produces EXACTLY the features of the WAV the transcode emitted —
    proving the fallback re-feeds the native decoder, not a second
    feature definition."""
    wav = _tiny_wav()
    shim = _write_shim(tmp_path, wav)
    out = mm._ffmpeg_transcode("audio", b"\xff\xfb-fake-mp3", binary=shim)
    assert out == wav
    direct = mm._wav_features(wav)
    via_env = None
    import os

    os.environ["XBOARD_FFMPEG"] = shim
    try:
        via_env = mm._real_features("audio", b"\xff\xfb-fake-mp3")
    finally:
        del os.environ["XBOARD_FFMPEG"]
    assert via_env == direct


def test_ffmpeg_fallback_failure_is_honest(tmp_path):
    """ffmpeg exiting non-zero (or emitting nothing) surfaces as the same
    NotImplementedError family as the no-binary gate — never a silent
    empty feature row."""
    shim = _write_shim(tmp_path, b"", rc=1)
    with pytest.raises(NotImplementedError, match="transcode"):
        mm._ffmpeg_transcode("audio", b"\xff\xfb-fake-mp3", binary=shim)


def test_ffmpeg_absent_gate_names_the_boundary(monkeypatch):
    monkeypatch.delenv("XBOARD_FFMPEG", raising=False)
    monkeypatch.setattr(mm.shutil, "which", lambda _: None)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm._real_features("audio", b"\xff\xfb-fake-mp3")


def _audit_expected(doc_id: int):
    """Pure-numpy recompute of the media_decode_audit facts straight from
    the formulas — the same independent derivation the DuckDB twin does."""
    import numpy as np

    kind = ("audio", "image", "video")[doc_id % 3]
    if kind == "audio":
        n = 256 + (doc_id % 7) * 64
        vals = (
            1103515245 * (doc_id + 1) + 12345 * np.arange(n, dtype=np.int64)
        ) % 65521 - 32760
        payload_bytes = 44 + 2 * n
    elif kind == "image":
        w, h = 16 + (doc_id % 5) * 4, 12 + (doc_id % 4) * 4
        vals = (doc_id * 31 + np.arange(3 * w * h, dtype=np.int64) * 17) % 256
        payload_bytes = len(f"P6\n{w} {h}\n255\n") + 3 * w * h
    else:
        w, h = 16 + (doc_id % 4) * 8, 8 + (doc_id % 2) * 8
        nf = 3 + (doc_id % 5)
        vals = np.concatenate(
            [
                (doc_id * 13 + f * 7 + np.arange(w * h, dtype=np.int64) * 5) % 256
                for f in range(nf)
            ]
        )
        payload_bytes = len(f"YUV4MPEG2 W{w} H{h} F10:1 C420\n") + nf * (
            6 + (3 * w * h) // 2
        )
    return kind, payload_bytes, len(vals), int(vals.sum()), int(vals.min()), int(vals.max())


def test_media_decode_audit_matches_formula_recompute(spark):
    """The audit's decoded statistics equal an independent pure-numpy
    derivation from the generation formulas — i.e. the REAL decoders
    recover every sample/pixel/luma byte exactly (the property the
    DuckDB twin hash-checks cross-engine)."""
    docs = spark.createDataFrame(
        [(i,) for i in range(0, 160)], "doc_id long"
    )
    out = mm.media_decode_audit(docs, modulus=11, residue=3, limit=45).collect()
    ids = [3 + 11 * k for k in range(15)]  # 45 capped by the 160-id universe
    assert [r.media_id for r in out] == ids[: len(out)]
    assert {r.kind for r in out} == {"audio", "image", "video"}
    for r in out:
        kind, pb, n, vsum, vmin, vmax = _audit_expected(r.media_id)
        assert (
            r.kind,
            r.payload_bytes,
            r.n_units,
            r.value_sum,
            r.value_min,
            r.value_max,
            r.decode_ok,
        ) == (kind, pb, n, vsum, vmin, vmax, True)


def test_media_decode_audit_catches_plane_math_corruption(monkeypatch):
    """Sensitivity: if the y4m decoder's C420 plane-size term were wrong
    (chroma bytes per luma byte), the parser would land off the next
    FRAME boundary and the audit could not silently pass — it raises
    executor-side (task failure -> the driver records an err row) rather
    than producing formula-matching sums. Driver-side call: a Spark-side
    monkeypatch would not reach the re-imported worker module."""
    monkeypatch.setitem(mm._Y4M_PLANE_RATIO, "420", 0.25)
    with pytest.raises(NotImplementedError, match="FRAME marker"):
        mm._y4m_parse(mm._synth_y4m(47))  # 47 % 3 == 2: a video doc_id


def test_media_decode_audit_catches_payload_corruption(monkeypatch):
    """Sensitivity at the bytes level: a single flipped sample byte in a
    generated WAV payload shifts the decoded sum away from the formula
    derivation — the decoded statistics really come from the bytes, not
    from the generation parameters."""
    import numpy as np

    payload = bytearray(mm._synth_wav(3))  # 3 % 3 == 0: an audio doc_id
    payload[44 + 100] ^= 0xFF  # flip one data byte past the 44-byte header
    x, _rate, _n_ch = mm._wav_decode(bytes(payload))
    got = int(np.rint(x * 32768.0).astype(np.int64).sum())
    _kind, _pb, _n, vsum, _vmin, _vmax = _audit_expected(3)
    assert got != vsum


def test_media_decode_audit_roundtrip_property():
    """Hypothesis sweep beyond the registered 45-id fixture: for ANY
    doc_id the synthetic payload round-trips bit-exactly through the
    real decoder (the fixture's exactness is not an artifact of the
    particular ids the registry selects). Driver-side — the property is
    about the codec pair, not the Spark plumbing."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(doc_id=st.integers(0, 10**7))
    def check(doc_id):
        kind, pb, n, vsum, vmin, vmax = _audit_expected(doc_id)
        if kind == "audio":
            p = mm._synth_wav(doc_id)
            x, _r, _c = mm._wav_decode(p)
            vals = np.rint(x * 32768.0).astype(np.int64)
        elif kind == "image":
            p = mm._synth_ppm(doc_id)
            _w, _h, rgb = mm._ppm_decode(p)
            vals = np.rint(rgb * 255.0).astype(np.int64).ravel()
        else:
            p = mm._synth_y4m(doc_id)
            _w, _h, _f, _cs, frames = mm._y4m_parse(p)
            vals = np.concatenate(
                [np.frombuffer(f, dtype=np.uint8) for f in frames]
            ).astype(np.int64)
        assert (len(p), len(vals), int(vals.sum()), int(vals.min()), int(vals.max())) == (
            pb, n, vsum, vmin, vmax
        )

    check()

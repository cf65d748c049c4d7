"""Multimodal decode paths (VERDICT r01 item 9): audio/wav, image/png,
video/y4m and image/jpeg headers are REALLY decoded (stdlib RIFF/WAVE +
PCM stats; PNG chunk walk + CRC + inflate + un-filter; YUV4MPEG2 stream
parse + frame-sampling; JPEG marker walk to SOFn) inside mapInPandas
kernels; text/plain passes through; compressed video / JPEG pixels
still raise the documented stub. Fixtures are synthesized
deterministically (no external data)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.multimodal import (
    extract_features,
    extract_media_features,
    make_wav,
)

RATE = 8000


def _sine(n: int, freq: float, amp: int = 10_000) -> list[int]:
    return [int(amp * math.sin(2 * math.pi * freq * i / RATE)) for i in range(n)]


@pytest.fixture(scope="module")
def mixed_blobs(spark):
    wav_a = make_wav(_sine(400, 440.0), RATE)
    wav_b = make_wav([0] * 250, RATE)  # silence → rms 0
    txt = b"plain text payload"
    rows = [
        (1, wav_a, "audio/wav"),
        (2, wav_b, "audio/wav"),
        (3, txt, "text/plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, media_type string")
    return df.select(
        "doc_id", "payload",
        F.struct(
            F.col("media_type"),
            F.length("payload").cast("int").alias("n_bytes"),
            F.sha2("payload", 256).alias("sha256"),
        ).alias("meta"),
    )


def test_wav_rows_really_decode(spark, mixed_blobs):
    got = {r["doc_id"]: r for r in extract_media_features(mixed_blobs).collect()}
    assert set(got) == {1, 2, 3}
    a = got[1]
    assert (a["sample_rate"], a["n_channels"], a["n_frames"]) == (RATE, 1, 400)
    samples = _sine(400, 440.0)
    expected_rms = int(math.sqrt(sum(s * s for s in samples) / len(samples)) * 10_000)
    assert a["rms_e4"] == expected_rms
    assert got[2]["n_frames"] == 250 and got[2]["rms_e4"] == 0
    t = got[3]
    assert (t["sample_rate"], t["n_frames"], t["rms_e4"]) == (0, 0, 0)
    assert t["n_bytes"] == len(b"plain text payload")


def test_byte_features_accept_wav(spark, mixed_blobs):
    """The byte-domain extractor no longer raises on audio/wav (done
    condition: a non-text/plain fixture row without raising)."""
    rows = extract_features(mixed_blobs).collect()
    assert len(rows) == 3


def test_unknown_media_still_stubbed(spark):
    df = spark.createDataFrame(
        [(9, b"\x00\x00\x00\x18ftypmp42", "video/mp4")],
        "doc_id long, payload binary, media_type string",
    ).select(
        "doc_id", "payload",
        F.struct(F.col("media_type"),
                 F.length("payload").cast("int").alias("n_bytes"),
                 F.sha2("payload", 256).alias("sha256")).alias("meta"),
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL/ffmpeg"):
        extract_media_features(df).collect()


# ------------------------------------------------------------- image/png


def test_png_roundtrip_and_all_filter_types():
    """Pure-kernel check: encoder→decoder roundtrip, plus un-filtering
    of every PNG filter type (0-4, RFC 2083 §6) on a hand-built
    gradient where each filter produces distinct deltas."""
    from search_engine_spark.ops.multimodal import (
        _decode_png,
        _png_unfilter,
        make_png,
    )

    for i in [0, 7, 123, 255, 511]:
        feat = _decode_png(make_png(4 + i % 8, 2 + i % 5, i % 256))
        assert feat == {
            "width": 4 + i % 8, "height": 2 + i % 5,
            "bit_depth": 8, "px_mean_e4": (i % 256) * 10_000,
        }

    rows = [bytes([10, 20, 30]), bytes([15, 25, 35])]

    def encode_with(ftype: int) -> bytes:
        out, prev = b"", bytes(3)
        for line in rows:
            fl = bytearray()
            for i in range(3):
                a = line[i - 1] if i else 0
                b, c = prev[i], (prev[i - 1] if i else 0)
                pred = {
                    0: 0, 1: a, 2: b, 3: (a + b) // 2,
                }.get(ftype)
                if pred is None:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                fl.append((line[i] - pred) & 0xFF)
            out += bytes([ftype]) + bytes(fl)
            prev = line
        return out

    for ftype in range(5):
        assert bytes(_png_unfilter(encode_with(ftype), 3, 2)) == b"".join(rows)


def test_png_crc_corruption_detected():
    from search_engine_spark.ops.multimodal import _decode_png, make_png

    p = bytearray(make_png(5, 3, 77))
    p[20] ^= 0xFF  # flip a bit inside IHDR body → CRC must fail
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(p))


def test_png_rows_really_decode(spark):
    from search_engine_spark.ops.multimodal import (
        extract_image_features,
        with_image_blob,
    )

    docs = spark.createDataFrame(
        [(i,) for i in [0, 3, 300]], "doc_id long"
    )
    got = {r["doc_id"]: r for r in
           extract_image_features(with_image_blob(docs)).collect()}
    for i in [0, 3, 300]:
        r = got[i]
        assert (r["width"], r["height"], r["bit_depth"], r["px_mean_e4"]) == (
            4 + i % 8, 2 + i % 5, 8, (i % 256) * 10_000
        )


# ------------------------------------------------------------ video/y4m


def test_y4m_roundtrip_and_sampling():
    """Pure-kernel check: encoder→parser roundtrip; sampling keeps
    exactly frames 0, every, 2·every, …; luma means are integer-exact."""
    from search_engine_spark.ops.multimodal import _decode_y4m, make_y4m

    lumas = [5, 250, 17, 0, 128, 99, 200]
    payload = make_y4m(6, 4, lumas)
    got = _decode_y4m(payload, sample_every=3)
    assert [f["frame_idx"] for f in got] == [0, 3, 6]
    for f in got:
        assert (f["width"], f["height"]) == (6, 4)
        assert f["luma_mean_e4"] == lumas[f["frame_idx"]] * 10_000
    # every=1 keeps all frames
    assert len(_decode_y4m(payload, sample_every=1)) == len(lumas)


def test_y4m_chroma_420_luma_plane_first():
    """A hand-built C420jpeg stream: the parser must skip the chroma
    planes (w·h/2 extra bytes per frame) and still read frame 1's luma
    correctly."""
    from search_engine_spark.ops.multimodal import _decode_y4m

    w, h = 4, 2
    header = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
    def frame(y_val, c_val):
        return (b"FRAME\n" + bytes([y_val]) * (w * h)
                + bytes([c_val]) * (w * h // 2))
    payload = header + frame(10, 99) + frame(20, 77)
    got = _decode_y4m(payload, sample_every=1)
    assert [f["luma_mean_e4"] for f in got] == [100_000, 200_000]


def test_y4m_truncated_frame_detected():
    from search_engine_spark.ops.multimodal import _decode_y4m, make_y4m

    payload = make_y4m(8, 8, [1, 2])[:-5]  # chop the last frame short
    with pytest.raises(ValueError, match="truncated"):
        _decode_y4m(payload, sample_every=1)


def test_y4m_rows_really_decode(spark):
    from search_engine_spark.ops.multimodal import (
        sample_video_frames,
        with_video_blob,
    )

    ids = [0, 3, 300]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = sample_video_frames(with_video_blob(docs)).collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in rows}
    for i in ids:
        n_frames = 3 + i % 4
        kept = [t for t in range(n_frames) if t % 2 == 0]
        assert sorted(t for (d, t) in got if d == i) == kept
        for t in kept:
            r = got[(i, t)]
            assert (r["width"], r["height"]) == (4 + i % 4, 2 + i % 3)
            assert r["luma_mean_e4"] == ((i + 17 * t) % 256) * 10_000


# ----------------------------------------------------------- image/jpeg


def test_jpeg_header_roundtrip():
    from search_engine_spark.ops.multimodal import (
        _decode_jpeg_header,
        make_jpeg_shell,
    )

    for w, h, nc in [(16, 8, 1), (31, 15, 3), (640, 480, 3)]:
        feat = _decode_jpeg_header(make_jpeg_shell(w, h, nc))
        assert feat == {"width": w, "height": h, "bit_depth": 8,
                        "n_comp": nc, "progressive": 0}
    with pytest.raises(ValueError, match="not a JPEG"):
        _decode_jpeg_header(b"\x89PNG\r\n\x1a\n")


def test_jpeg_skips_non_sof_segments():
    """Marker walk must hop over APPn/COM/DQT segments (including ones
    containing 0xFFC0-looking bytes in their bodies) before SOF."""
    import struct as _s

    from search_engine_spark.ops.multimodal import _decode_jpeg_header

    com_body = b"decoy \xff\xc0 inside a comment"
    dqt_body = bytes([0]) + bytes(range(64))
    sof = _s.pack(">BHHB", 8, 99, 177, 3) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    payload = (
        b"\xff\xd8"
        + b"\xff\xfe" + _s.pack(">H", 2 + len(com_body)) + com_body
        + b"\xff\xdb" + _s.pack(">H", 2 + len(dqt_body)) + dqt_body
        + b"\xff\xc2" + _s.pack(">H", 2 + len(sof)) + sof  # progressive
        + b"\xff\xd9"
    )
    feat = _decode_jpeg_header(payload)
    assert feat == {"width": 177, "height": 99, "bit_depth": 8,
                    "n_comp": 3, "progressive": 1}


def test_jpeg_rows_really_decode(spark):
    from search_engine_spark.ops.multimodal import (
        extract_jpeg_dims,
        with_jpeg_blob,
    )

    ids = [0, 5, 300]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r for r in
           extract_jpeg_dims(with_jpeg_blob(docs)).collect()}
    for i in ids:
        r = got[i]
        assert (r["width"], r["height"], r["bit_depth"], r["n_comp"]) == (
            16 + i % 16, 8 + i % 8, 8, 1 + 2 * (i % 2)
        )


# ---------------------------------------------------------- image resize


def test_resize_nearest_kernel():
    """Pure-kernel check against an explicit hand-resample."""
    import numpy as np

    from search_engine_spark.ops.multimodal import (
        _png_pixels,
        _resize_nearest,
        make_png_gradient,
    )

    w, h, base = 7, 5, 40
    _, _, _, px = _png_pixels(make_png_gradient(w, h, base))
    assert px.shape == (h, w)
    assert px[2, 3] == (base + 3 * 2 + 5 * 3) % 256
    r = _resize_nearest(px, 4, 3)
    assert r.shape == (3, 4)
    for y in range(3):
        for x in range(4):
            assert r[y, x] == px[(y * h) // 3, (x * w) // 4]
    # upscale also works (indices repeat)
    up = _resize_nearest(px, 14, 10)
    assert up.shape == (10, 14) and up[0, 0] == px[0, 0]
    assert np.array_equal(up[::2, ::2], px)


def test_resize_rows_really_decode(spark):
    from search_engine_spark.ops.multimodal import (
        resize_image_features,
        with_gradient_image_blob,
    )

    ids = [0, 5, 300]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r for r in
           resize_image_features(with_gradient_image_blob(docs)).collect()}
    for i in ids:
        w, h, base = 5 + i % 6, 3 + i % 4, i % 256
        tot = sum(
            (base + 3 * ((y * h) // 3) + 5 * ((x * w) // 4)) % 256
            for y in range(3) for x in range(4)
        )
        r = got[i]
        assert (r["width"], r["height"]) == (4, 3)
        assert r["px_mean_e4"] == tot * 10_000 // 12


def test_avi_mjpeg_roundtrip_and_sampling():
    """RIFF walk + per-frame JPEG decode: every 2nd synthesized frame
    comes back with its closed-form DC-only pixel mean."""
    from search_engine_spark.ops.jpegcodec import make_jpeg_gray_blocks
    from search_engine_spark.ops.multimodal import (
        _decode_avi_mjpeg,
        make_avi_mjpeg,
    )

    grays = [[10, 200], [77, 99], [8, 247], [128, 128], [1, 255]]
    frames = [make_jpeg_gray_blocks(16, 8, g) for g in grays]
    avi = make_avi_mjpeg(frames, 16, 8)
    got = _decode_avi_mjpeg(avi, sample_every=2)
    assert [f["frame_idx"] for f in got] == [0, 2, 4]
    for f in got:
        g = grays[f["frame_idx"]]
        # decoder clamps to uint8 (g=255 → 256 → 255)
        px = [min(255, 2 * ((v - 127) // 2) + 128) for v in g]
        assert (f["width"], f["height"]) == (16, 8)
        assert f["px_mean_e4"] == 5000 * sum(px)
    # sample_every=1 keeps all frames
    assert len(_decode_avi_mjpeg(avi, sample_every=1)) == 5


def test_avi_word_alignment_with_odd_frames():
    """RIFF pads odd-sized chunks; JPEG frame sizes are naturally odd,
    so the movi walk must skip pad bytes or desync."""
    from search_engine_spark.ops.jpegcodec import make_jpeg_gray_blocks
    from search_engine_spark.ops.multimodal import (
        _decode_avi_mjpeg,
        make_avi_mjpeg,
    )

    # hunt a gray pair giving an odd-length JPEG, then alternate frames
    odd = next(
        f for v in range(256)
        if len(f := make_jpeg_gray_blocks(16, 8, [v, 255 - v])) % 2 == 1
    )
    even = next(
        f for v in range(256)
        if len(f := make_jpeg_gray_blocks(16, 8, [v, v])) % 2 == 0
    )
    avi = make_avi_mjpeg([odd, even, odd, even], 16, 8)
    got = _decode_avi_mjpeg(avi, sample_every=1)
    assert [f["frame_idx"] for f in got] == [0, 1, 2, 3]


def test_avi_malformed_payloads_detected():
    import struct as _s

    import pytest as _pt

    from search_engine_spark.ops.jpegcodec import make_jpeg_gray_blocks
    from search_engine_spark.ops.multimodal import (
        _decode_avi_mjpeg,
        make_avi_mjpeg,
    )

    frames = [make_jpeg_gray_blocks(16, 8, [50, 60])]
    avi = make_avi_mjpeg(frames, 16, 8)
    with _pt.raises(ValueError):
        _decode_avi_mjpeg(b"RIFX" + avi[4:])
    with _pt.raises(ValueError):  # truncated vs declared RIFF size
        _decode_avi_mjpeg(avi[:-10])
    # avih/movi frame-count cross-check: claim 2 frames, ship 1
    lied = avi.replace(_s.pack("<I", 1), _s.pack("<I", 2), 1)
    with _pt.raises(ValueError):
        _decode_avi_mjpeg(lied)


def test_mjpeg_rows_really_decode(spark):
    from search_engine_spark.ops.multimodal import (
        sample_mjpeg_frames,
        with_mjpeg_blob,
    )

    ids = [0, 3, 41]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {}
    for r in sample_mjpeg_frames(with_mjpeg_blob(docs)).collect():
        got[(r["doc_id"], r["frame_idx"])] = r
    for i in ids:
        n = 3 + i % 4
        kept = [t for t in range(n) if t % 2 == 0]
        assert {k[1] for k in got if k[0] == i} == set(kept)
        for t in kept:
            px = [
                2 * (((8 + (i * 7 + 29 * t + 13 * b) % 240) - 127) // 2) + 128
                for b in range(2)
            ]
            r = got[(i, t)]
            assert (r["width"], r["height"]) == (16, 8)
            assert r["px_mean_e4"] == 5000 * sum(px)

"""Multimodal decode paths (VERDICT r01 item 9): audio/wav and
image/png rows are REALLY decoded (stdlib RIFF/WAVE + PCM stats;
PNG chunk walk + CRC + inflate + un-filter) inside mapInPandas kernels;
text/plain passes through; video/JPEG still raise the documented
PIL/ffmpeg stub. Fixtures are synthesized deterministically (no
external data)."""

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

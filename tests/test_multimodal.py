"""Multimodal decode path (VERDICT r01 item 9): audio/wav rows are
REALLY decoded (stdlib RIFF/WAVE parse + PCM stats) inside the
mapInPandas kernel; text/plain passes through; image/* still raises the
documented PIL/ffmpeg stub. Fixtures are synthesized deterministically
(no external data)."""

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
        [(9, b"\x89PNG\r\n\x1a\n....", "image/png")],
        "doc_id long, payload binary, media_type string",
    ).select(
        "doc_id", "payload",
        F.struct(F.col("media_type"),
                 F.length("payload").cast("int").alias("n_bytes"),
                 F.sha2("payload", 256).alias("sha256")).alias("meta"),
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL/ffmpeg"):
        extract_media_features(df).collect()

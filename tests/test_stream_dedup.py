"""Streaming exact dedup (streaming/dedup.py): first-arrival-wins on
the content digest, watermark-bounded state, incremental across
availableNow runs over the same checkpoint.

Fixture: synthetic doc rows with planted duplicate texts and event
times inside one watermark horizon — every duplicate must be dropped,
every distinct digest kept exactly once, and a second run must admit
only genuinely-new digests.
"""

from __future__ import annotations

import sys
from datetime import datetime, timedelta
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from search_engine_spark.streaming.dedup import (  # noqa: E402
    DOCS_STREAM_SCHEMA,
    dedup_stream,
    read_docs_stream,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _rows(spec):
    """spec: list of (doc_id, minutes_after_t0, text)."""
    return [
        (i, T0 + timedelta(minutes=m), text, "en", "synth")
        for (i, m, text) in spec
    ]


@pytest.fixture()
def stream_dirs(tmp_path):
    return tmp_path / "in", tmp_path / "chk", tmp_path / "out"


def _drain(spark, in_dir, chk, out):
    q = (
        dedup_stream(read_docs_stream(spark, str(in_dir)))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(out))


def test_stream_dedup_first_arrival_wins(spark, stream_dirs):
    in_dir, chk, out = stream_dirs
    spec = [
        (1, 0, "alpha beta"),
        (2, 1, "alpha beta"),   # dup of 1, within watermark
        (3, 2, "gamma delta"),
        (4, 3, "alpha beta"),   # another dup
        (5, 4, "epsilon"),
    ]
    spark.createDataFrame(_rows(spec), DOCS_STREAM_SCHEMA).coalesce(1).write.parquet(str(in_dir))
    got = _drain(spark, in_dir, chk, out).collect()
    by_digest = {}
    for r in got:
        assert r["digest"] not in by_digest, "digest emitted twice"
        by_digest[r["digest"]] = r["doc_id"]
    assert len(by_digest) == 3  # alpha-beta, gamma-delta, epsilon
    assert set(by_digest.values()) <= {1, 2, 3, 4, 5}


def test_stream_dedup_incremental_run(spark, stream_dirs):
    in_dir, chk, out = stream_dirs
    first = [(1, 0, "alpha beta"), (2, 1, "gamma delta")]
    spark.createDataFrame(_rows(first), DOCS_STREAM_SCHEMA).coalesce(1).write.parquet(str(in_dir))
    n1 = _drain(spark, in_dir, chk, out).count()
    assert n1 == 2
    # second batch: one dup (same horizon) + one new digest
    second = [(3, 5, "alpha beta"), (4, 6, "zeta eta")]
    spark.createDataFrame(_rows(second), DOCS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    rows = _drain(spark, in_dir, chk, out).collect()
    assert len(rows) == 3  # only the new digest was admitted
    assert {r["doc_id"] for r in rows} == {1, 2, 4}

"""Streaming percolation ≡ the batch percolate op, exactly-once across
incremental runs (the stream-twin contract every streaming module here
honors)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from search_engine_spark.ops.search_sql import percolate
from search_engine_spark.streaming.dedup import read_docs_stream
from search_engine_spark.streaming.percolate import (
    percolate_stream,
    percolator_registry,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)

DOCS = [
    (1, 0, "filter join filter"),          # conj q_all_filter_join
    (2, 1, "filter only here"),            # no conj (join missing)
    (3, 2, "the stream flows"),            # any q_any_stream_window
    (4, 3, "window seat"),                 # any q_any_stream_window
    (5, 4, "table scan table scan scan"),  # conj q_all_table_scan
    (6, 5, "nothing relevant at all"),
    (7, 6, "merge commit merge"),          # any (both terms, n_hit 2)
]


def _write_batch(spark, in_dir, rows):
    in_dir.mkdir(parents=True, exist_ok=True)
    df = spark.createDataFrame(
        [
            (i, T0 + timedelta(minutes=m), text, "en", "synth")
            for (i, m, text) in rows
        ],
        "doc_id long, ts timestamp, text string, lang string, source string",
    )
    df.coalesce(1).write.mode("append").parquet(str(in_dir))


def _drain(spark, in_dir, chk, out):
    q = (
        percolate_stream(
            read_docs_stream(spark, str(in_dir)),
            percolator_registry(spark),
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(out))


@pytest.fixture()
def dirs(tmp_path):
    return tmp_path / "in", tmp_path / "chk", tmp_path / "out"


def test_stream_matches_equal_batch_op(spark, dirs):
    in_dir, chk, out = dirs
    _write_batch(spark, in_dir, DOCS)
    got = {
        (r["doc_id"], r["qid"], r["n_hit"])
        for r in _drain(spark, in_dir, chk, out).collect()
    }
    batch_docs = spark.createDataFrame(
        [(i, text) for (i, _m, text) in DOCS], "doc_id long, text string"
    )
    want = {
        (r["doc_id"], r["qid"], r["n_hit"])
        for r in percolate(spark, batch_docs).collect()
    }
    assert got == want and got
    # spot semantics: conj needs both terms, any fires on one
    assert (1, "q_all_filter_join", 2) in got
    assert not any(d == 2 and q == "q_all_filter_join" for d, q, _ in got)
    assert (3, "q_any_stream_window", 1) in got
    assert (7, "q_any_commit_merge", 2) in got
    assert not any(d == 6 for d, _q, _n in got)


def test_incremental_runs_are_exactly_once(spark, dirs):
    in_dir, chk, out = dirs
    _write_batch(spark, in_dir, DOCS[:3])
    first = _drain(spark, in_dir, chk, out).collect()
    # second drain with no new data emits nothing new
    again = _drain(spark, in_dir, chk, out).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))
    # late files percolate once, earlier matches never re-emit
    _write_batch(spark, in_dir, DOCS[3:])
    final = {
        (r["doc_id"], r["qid"]) for r in _drain(spark, in_dir, chk, out).collect()
    }
    batch_docs = spark.createDataFrame(
        [(i, text) for (i, _m, text) in DOCS], "doc_id long, text string"
    )
    want = {
        (r["doc_id"], r["qid"]) for r in percolate(spark, batch_docs).collect()
    }
    assert final == want

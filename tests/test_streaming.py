"""Structured Streaming rollup ≡ batch rollup, and availableNow resume.

Drives streaming/windowed.py over the driver's events table split into
multiple files; complete-mode memory sink compares against the batch
twin (ops/relational.events_hourly aggregates, approx distinct aside);
a second availableNow run over the same checkpoint must be a no-op
(exactly-once), and new files must be picked up incrementally.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from search_engine_spark.streaming.windowed import (  # noqa: E402
    hourly_rollup_stream,
    read_events_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory) -> Path:
    out = tmp_path_factory.mktemp("stream") / "events_in"
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.parquet(
        str(out)
    )
    return out


def _run_complete_to_memory(spark, path: str, name: str):
    stream = hourly_rollup_stream(read_events_stream(spark, path))
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_rollup_matches_batch(spark, events_dir):
    from pyspark.sql import functions as F

    got = _run_complete_to_memory(spark, str(events_dir), "rollup_a")
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 3).alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )
    g = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got.collect()
    }
    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert g == b
    assert len(b) > 0


def test_available_now_incremental(spark, events_dir, tmp_path):
    """File-sink run drains the backlog (and emits rows); rerun with the
    same checkpoint is a no-op; a NEW input file is then processed
    incrementally — row count grows only by newly-closed windows, with
    no duplicate (window_start, event_type) emissions."""
    from pyspark.sql import functions as F

    from search_engine_spark.streaming.windowed import run_available_now

    # private copy: this test appends a file to the input dir
    events_in = tmp_path / "events_in"
    src = spark.read.parquet(str(events_dir))
    src.write.parquet(str(events_in))
    max_ts = src.agg(F.max("ts")).collect()[0][0]

    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    stream = hourly_rollup_stream(read_events_stream(spark, str(events_in)))
    run_available_now(stream, str(ckpt), str(out))
    n1 = spark.read.parquet(str(out)).count()
    assert n1 > 0  # the 2h watermark must have closed most windows

    # rerun, no new input: exactly-once means no new rows
    stream2 = hourly_rollup_stream(read_events_stream(spark, str(events_in)))
    run_available_now(stream2, str(ckpt), str(out))
    n2 = spark.read.parquet(str(out)).count()
    assert n2 == n1

    # drop a new file far past the watermark: closes the straggler
    # windows AND creates new ones; the run must emit only those
    late = src.limit(50).withColumn(
        "ts", F.col("ts").cast("timestamp") + F.expr("INTERVAL 240 HOURS")
    ).withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
    late.write.mode("append").parquet(str(events_in))
    stream3 = hourly_rollup_stream(read_events_stream(spark, str(events_in)))
    run_available_now(stream3, str(ckpt), str(out))
    sink = spark.read.parquet(str(out))
    n3 = sink.count()
    assert n3 > n2
    # exactly-once: no (window_start, event_type) emitted twice
    assert sink.select("window_start", "event_type").distinct().count() == n3
    # the growth is exactly the windows that had not been emitted before
    new_rows = sink.where(F.col("window_start") > max_ts).count()
    old_straggler_rows = n3 - n2 - new_rows
    assert new_rows >= 0 and old_straggler_rows >= 0


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization ≡ the batch twin
    (ops/relational.sessionize): same sessions, same per-user numbering,
    once the watermark (advanced by a far-future sentinel event) has
    closed every real session. Exactly-once on rerun."""
    from pyspark.sql import functions as F

    from search_engine_spark.ops.relational import sessionize
    from search_engine_spark.streaming.sessionize import sessionize_stream

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    span = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span_hours = int((span["hi"] - span["lo"]).total_seconds() // 3600) + 2
    wm = f"{span_hours} hours"  # nothing in the real data is ever 'late'

    events_in = tmp_path / "events_in"
    events.repartition(4).write.parquet(str(events_in))
    # sentinel: one far-future event advances the watermark past every
    # real session's close point (2×delay + gap margin)
    sentinel = events.limit(1).select(
        F.lit(99_999_999).alias("event_id"),
        (F.col("ts") + F.expr(f"INTERVAL {3 * span_hours} HOURS")).alias("ts"),
        F.lit(999_999_999).alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sentinel.write.mode("append").parquet(str(events_in))

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", 2).parquet(str(events_in))
    out = tmp_path / "sessions_out"
    ckpt = tmp_path / "ckpt"
    q = (
        sessionize_stream(stream, watermark=wm)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["session_id"], r["n_events"],
         r["first_event"], r["last_event"])
        for r in spark.read.parquet(str(out))
        .where(F.col("user_id") != 999_999_999).collect()
    }
    expected = {
        (r["user_id"], r["session_id"], r["n_events"],
         r["first_event"], r["last_event"])
        for r in sessionize(events).collect()
    }
    assert got == expected
    assert len(got) > 0

    # rerun with the same checkpoint and no new input: exactly-once
    n1 = spark.read.parquet(str(out)).count()
    stream2 = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", 2).parquet(str(events_in))
    q2 = (
        sessionize_stream(stream2, watermark=wm)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(str(out)).count() == n1


def test_trending_terms_stream_equals_batch(spark, events_dir):
    """Streaming windowed term counts ≡ the same expression tree run
    batch over the full input (complete-mode memory sink)."""
    from pyspark.sql import functions as F

    from search_engine_spark.ops.sqltwin import tokens_col
    from search_engine_spark.streaming.windowed import trending_terms_stream

    # the driver's props column is numeric JSON (no tokens); trend over
    # a synthesized text-bearing stream split across files
    from datetime import datetime

    tmp = events_dir.parent / "trend_in"
    rows = []
    terms = ["merge", "sort", "join", "scan", "filter"]
    for i in range(200):
        t = datetime(2024, 5, 1, i % 13, (i * 7) % 60, 0)
        txt = f"{terms[i % 5]} {terms[(i * 3) % 5]} query"
        rows.append((i, t, i % 9, "search", 0.0, txt))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).repartition(4).write.mode("overwrite").parquet(str(tmp))

    stream = trending_terms_stream(read_events_stream(spark, str(tmp)))
    q = (
        stream.writeStream.format("memory")
        .queryName("trending_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["window_start"]), r["term"]): r["n"]
        for r in spark.sql("SELECT * FROM trending_mem").collect()
    }
    batch = (
        spark.read.parquet(str(tmp))
        .select("ts", F.explode(tokens_col("props")).alias("term"))
        .groupBy(F.window("ts", "1 hour"), "term")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("window.start").alias("window_start"), "term", "n")
    )
    want = {
        (str(r["window_start"]), r["term"]): r["n"] for r in batch.collect()
    }
    assert got == want and got
    # sink-side per-window top-3 is well-defined on the final counts
    top = sorted(got.items(), key=lambda kv: (kv[0][0], -kv[1], kv[0][1]))
    assert top

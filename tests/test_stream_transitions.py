"""Streaming stateful event-transitions ≡ the batch Markov op
(ops/relational.event_transitions), once a far-future sentinel has
advanced the watermark past every real event."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_stream_transitions_match_batch(spark, tmp_path):
    from search_engine_spark.ops.relational import event_transitions
    from search_engine_spark.streaming.transitions import transitions_stream

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    span = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span_hours = int((span["hi"] - span["lo"]).total_seconds() // 3600) + 2
    wm = f"{span_hours} hours"  # nothing in the real data is ever 'late'

    events_in = tmp_path / "events_in"
    events.repartition(4).write.parquet(str(events_in))
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
    out, ckpt = tmp_path / "pairs_out", tmp_path / "ckpt"
    q = (
        transitions_stream(stream, watermark=wm)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    got = (
        spark.read.parquet(str(out))
        .where(F.col("user_id") != 999_999_999)
        .groupBy("event_type", "next_type")
        .agg(F.count("*").cast("long").alias("n_transitions"))
        .collect()
    )
    want = {
        (r["event_type"], r["next_type"]): r["n_transitions"]
        for r in event_transitions(events).collect()
    }
    assert {
        (r["event_type"], r["next_type"]): r["n_transitions"] for r in got
    } == want

    # exactly-once: a second availableNow run over the same checkpoint
    # appends nothing
    n1 = spark.read.parquet(str(out)).count()
    q2 = (
        transitions_stream(
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ).option("maxFilesPerTrigger", 2).parquet(str(events_in)),
            watermark=wm,
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(600)
    assert spark.read.parquet(str(out)).count() == n1


def test_lone_tail_state_evicted_after_idle_ttl(spark, tmp_path):
    """Aggregate-state bound (ADVICE r3): a user whose last event has
    landed keeps a 1-event buffer only until the watermark passes
    tail_ts + IDLE_TTL — after eviction, a much-later event for that
    user starts a FRESH chain (no pair across the TTL gap), while a
    user whose gap stays under the TTL still pairs normally."""
    import datetime as dt

    from search_engine_spark.streaming.transitions import transitions_stream

    t0 = dt.datetime(2024, 1, 1)

    def row(eid, hours, uid, etype):
        return (eid, t0 + dt.timedelta(hours=hours), uid, etype, 0.0, "{}")

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    d = 240  # hours: 10 days
    files = [
        # u1 tail at t0; u2 chain starts near the 10-day mark
        [row(1, 0, 1, "a"), row(2, d, 2, "x")],
        # watermark advance past t0 + TTL(24h): u1's eviction timer fires
        [row(90, d + 2, 999, "s")],
        # u1's successor AFTER eviction; u2's successor within TTL
        [row(3, d + 3, 1, "b"), row(4, d + 3, 2, "y")],
        # final advance: finalize everything still pending
        [row(91, d + 700, 999, "s")],
    ]
    events_in = tmp_path / "ev_in"
    events_in.mkdir()
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(events_in / f"f{i}.parquet")
        )
        import time

        time.sleep(1.1)  # distinct mtimes: file source processes in order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(events_in / "*.parquet"))
    )
    out, ckpt = tmp_path / "ttl_out", tmp_path / "ttl_ckpt"
    q = (
        transitions_stream(
            stream, watermark="1 hour", idle_ttl_ms=24 * 3600 * 1000
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    from pyspark.sql import functions as F

    got = {
        (r["user_id"], r["event_type"], r["next_type"])
        for r in spark.read.parquet(str(out))
        .where(F.col("user_id") != 999)
        .collect()
    }
    # u2 pairs (gap under TTL); u1 does NOT (tail evicted before 'b')
    assert got == {(2, "x", "y")}

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

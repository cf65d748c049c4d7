"""Structured Streaming ingestion: incremental windowed event rollups.

The reference has no stream processing (SURVEY §2.6) — its incremental
behavior is poll-loops over mutable tables. The Spark-native replacement for that
pattern is Structured Streaming with ``availableNow``: each run
processes exactly the new files since the last checkpoint, then stops —
the same "drain the backlog, checkpoint, exit" contract as the
reference's monitoring tick loop, but with exactly-once state. (The
Spark-native replacement, not a port.)

``hourly_rollup_stream`` is the streaming twin of
``ops/relational.events_hourly`` (same output schema): event-time
tumbling windows + a watermark bounding state. On a real cluster this
runs continuously against an object-store drop zone; the test drives it
with ``availableNow`` over a local directory and asserts it matches the
batch op exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup; late rows beyond the
    watermark are dropped instead of growing state without bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def trending_terms_stream(
    events: DataFrame, watermark: str = "2 hours", text_col: str = "props"
) -> DataFrame:
    """Watermarked per-window term counts over a text-bearing event
    stream — the state backbone of a "trending queries/terms" feature:
    (window_start, term, n). Tokenization (the frozen §8.1 JVM
    expression) and the explode run INSIDE the stream, so state is
    keyed by (window, term) and bounded by watermark eviction ×
    vocabulary (Heaps-sublinear), never by event count. Per-window
    top-k ranking is a batch query over the sink — streaming append
    mode emits each window's final counts exactly once at watermark
    expiry, which is what makes the sink-side rank correct.
    The batch twin (same expression tree on a static frame) is
    asserted identical in tests."""
    from search_engine_spark.ops.sqltwin import tokens_col

    return (
        events.withWatermark("ts", watermark)
        .select("ts", F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(F.window("ts", "1 hour"), "term")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("window.start").alias("window_start"), "term", "n")
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, out_dir: str
) -> None:
    """Drain the current backlog into a parquet sink and stop — the
    batch-incremental contract (resume = same checkpoint dir)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

"""Streaming exact deduplication: keep the first arrival of each
content digest across micro-batches.

The batch twin is ``ops/dedup.exact_dedup`` (md5 hash-groupBy); the
streaming version is the ingest-time shape a training pipeline runs on
a document drop zone — duplicates must be rejected AS data arrives, not
in a nightly pass. ``dropDuplicates`` keys the state store on the
digest, and ``withWatermark`` bounds that state: a duplicate arriving
within the watermark horizon of its original is dropped exactly; one
arriving later than the horizon may be re-admitted (the documented,
standard trade-off — Spark Structured Streaming programming guide,
"Streaming Deduplication"). At 100 TB the state store holds digests
only (16 bytes + key overhead per distinct doc in the horizon), never
content.

`dropDuplicatesWithinWatermark` (Spark 3.5+) is the variant used: state
for a digest is evictable once its event time passes the watermark,
which is the production-correct bound when the dedup key itself never
expires logically (content digests don't) but arrival skew is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_STREAM_SCHEMA = (
    "doc_id long, ts timestamp, text string, lang string, source string"
)


def read_docs_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def dedup_stream(docs: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """First-arrival-wins exact dedup on the content digest.

    Output rows carry the digest so the sink is joinable back to the
    batch ``exact_dedup`` canonical mapping for verification."""
    return (
        docs.withColumn("digest", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["digest"])
        .select("doc_id", "ts", "digest", "lang", "source")
    )

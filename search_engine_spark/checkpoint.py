"""Checkpoint + lineage tables: resumable builds (SURVEY §2.6 I7).

The reference coordinates incremental work with a ``pages.indexed``
claim flag (`services/indexer/src/core/psql.rs:36-57`, FOR UPDATE SKIP
LOCKED) and a ``monitor_state`` k/v table
(`migration/schema.sql:47-51`). The Spark-native equivalent is an
append-only per-partition lineage table:

``build_checkpoint(stage, partition_id, status, rows_in, rows_out,
sha_xor, attempt, started_at, finished_at)``

- **append-only**: every attempt appends rows; readers take the latest
  attempt per (stage, partition_id). Appends of small parquet files are
  atomic-enough (a torn write at kill time loses at worst the rows of
  the in-flight attempt, which then simply re-runs — idempotent because
  stage outputs use dynamic partition overwrite keyed by partition_id).
- **resume = anti-join**: pending partitions = all partitions minus
  those whose latest row is status='done' (north_rule requirement).
- ``sha_xor`` is the XOR of per-row sha256 prefixes within the
  partition — a cheap order-independent digest letting two builds be
  compared without rescanning content (input_hint integrity).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_SCHEMA = (
    "stage string, partition_id int, status string, rows_in long, "
    "rows_out long, sha_xor long, attempt int, started_at double, "
    "finished_at double"
)


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe (any scheme). Probing BEFORE reading a
    maybe-absent table matters cosmetically: ``spark.read.parquet`` on a
    missing path logs a full FileNotFoundException stack at ERROR on the
    JVM side even when Python catches it, which reads as a crash in CLI
    output."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    return bool(fs.exists(hpath))


class CheckpointLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        if not fs_exists(self.spark, self.path):
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        try:
            return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)
        except Exception:  # noqa: BLE001 - torn dir (no files yet)
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)

    def latest(self) -> DataFrame:
        """Latest attempt per (stage, partition_id)."""
        log = self.read()
        latest = log.groupBy("stage", "partition_id").agg(
            F.max("attempt").alias("attempt")
        )
        return log.join(latest, ["stage", "partition_id", "attempt"])

    def completed_partitions(self, stage: str) -> set[int]:
        rows = (
            self.latest()
            .where((F.col("stage") == stage) & (F.col("status") == "done"))
            .select("partition_id")
            .collect()
        )
        return {r["partition_id"] for r in rows}

    def next_attempt(self, stage: str) -> int:
        row = self.read().where(F.col("stage") == stage).agg(
            F.coalesce(F.max("attempt"), F.lit(0))
        ).collect()[0]
        return int(row[0]) + 1

    def append(self, rows: list[dict]) -> None:
        if not rows:
            return
        from search_engine_spark.functions.inline import inline_table

        # inline_table (pure-JVM VALUES) not createDataFrame: a Python-
        # RDD-backed append costs a Python worker spawn per write (~4 s
        # on this host) — lineage writes must stay JVM-only
        df = inline_table(
            self.spark,
            [
                (
                    r["stage"], r["partition_id"], r["status"],
                    r.get("rows_in"), r.get("rows_out"), r.get("sha_xor"),
                    r["attempt"], float(r.get("started_at", time.time())),
                    float(r.get("finished_at", time.time())),
                )
                for r in rows
            ],
            CHECKPOINT_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

"""Build/query metrics table (SURVEY §2.4 A10, §2.6 I3).

The reference's monitoring service samples backlog counters into logs
and a ``monitor_state`` table every 15 s tick
(`services/monitoring/src/scheduler/scheduler.ts:54-86`,
`src/db/queries.ts:15-35`). Batch-Spark equivalent: each build stage
appends typed metric rows; dashboards/aggregations are plain DataFrame
queries over the table.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = "build_id string, stage string, key string, value double, ts double"


class MetricsLog:
    def __init__(self, spark: SparkSession, path: str, build_id: str):
        self.spark = spark
        self.path = path
        self.build_id = build_id

    def emit(self, stage: str, values: dict[str, float]) -> None:
        from search_engine_spark.functions.inline import inline_table

        now = time.time()
        rows = [(self.build_id, stage, k, float(v), now) for k, v in values.items()]
        if not rows:
            return
        # pure-JVM literal write (see functions/inline.py): a Python-RDD
        # append would spawn a Python worker per emit
        inline_table(self.spark, rows, METRICS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(METRICS_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], METRICS_SCHEMA)

    def summary(self) -> DataFrame:
        return (
            self.read()
            .groupBy("stage", "key")
            .agg(F.last("value").alias("value"))
            .orderBy("stage", "key")
        )

"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a cluster deployment would set per
executor; the knobs that matter at 100 TB (AQE, shuffle partitions,
Arrow batch size) are explicit so they show up in `spark.conf` audits.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "search-engine-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession.

    cores=None → ``SPARK_GRAFT_CPUS`` env or ``local[*]``. On a real
    cluster the master/memory come from spark-submit and these builder
    settings are inert, by design.
    """
    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cores}]" if env_cores else "local[*]"
        ncores = int(env_cores) if env_cores else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        ncores = cores

    if shuffle_partitions is None:
        # local mode: ~1 shuffle partition per core keeps every wave full
        # without tiny-partition overhead. On a 1000-executor cluster this
        # is instead sized to data volume (AQE coalesces down at runtime).
        shuffle_partitions = max(ncores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(ncores))
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""spark-submit entry point: build the index on the session provided by
the cluster manager (the engine package arrives via --py-files)."""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> int:
    corpus, index_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    from search_engine_spark.plans.build import build_index

    summary = build_index(spark, corpus, index_dir)
    print(summary)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Incremental-ingest evidence: extend_index cost is O(delta).

Builds a base index (R_BASE replicas of the driver's ``documents``
table), then times ``extend_index`` of a delta batch (R_DELTA replicas,
disjoint salt range) against a full ``build_index`` of the union —
the wall ratio should track the doc ratio, not the corpus size.

Usage: python tools/bench_extend.py      # prints one JSON line
Env:   EXTEND_BASE (default 36), EXTEND_DELTA (default 4)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

R_BASE = int(os.environ.get("EXTEND_BASE", "36"))
R_DELTA = int(os.environ.get("EXTEND_DELTA", "4"))


def _corpus(spark, sf_dir: str, out: str, lo: int, hi: int) -> int:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(lo), F.lit(hi - 1))))
        .select(
            F.concat(F.lit("src/"), F.col("source")).alias("repo"),
            F.concat_ws("/", F.lit("doc"), F.col("doc_id").cast("string"),
                        F.col("rep").cast("string")).alias("path"),
            F.md5(F.concat_ws("#", F.col("text"), F.col("rep").cast("string")))
            .alias("commit"),
            F.col("lang"),
            F.concat_ws(
                " ",
                F.repeat(F.concat(F.col("text"), F.lit(" ")), 12),
                F.concat(F.lit("repsalt"), F.col("rep").cast("string")),
            ).alias("content"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).count()


def main() -> int:
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.build import build_index, extend_index
    from search_engine_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-extend", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp(prefix="se_extend_"))
    cfg = EngineConfig(build_waves=1, build_partitions=32, tokenizer="jvm",
                      python_parallelism=16)
    try:
        base = str(work / "base.parquet")
        delta = str(work / "delta.parquet")
        union = str(work / "union.parquet")
        n_base = _corpus(spark, sf_dir, base, 0, R_BASE)
        n_delta = _corpus(spark, sf_dir, delta, R_BASE, R_BASE + R_DELTA)
        _corpus(spark, sf_dir, union, 0, R_BASE + R_DELTA)

        t0 = time.perf_counter()
        build_index(spark, base, str(work / "ix"), cfg=cfg)
        t_base = time.perf_counter() - t0

        t0 = time.perf_counter()
        s = extend_index(spark, delta, str(work / "ix"), cfg=cfg)
        t_extend = time.perf_counter() - t0

        t0 = time.perf_counter()
        build_index(spark, union, str(work / "ix_full"), cfg=cfg)
        t_full = time.perf_counter() - t0

        # deferred-prior extend: skips the O(corpus) graph pass, leaving
        # a stale-but-valid prior (streaming ingest's per-batch mode)
        from dataclasses import replace

        build_index(spark, base, str(work / "ix_d"), cfg=cfg)
        t0 = time.perf_counter()
        extend_index(spark, delta, str(work / "ix_d"),
                     cfg=replace(cfg, prior_refresh="defer"))
        t_defer = time.perf_counter() - t0

        print(json.dumps({
            "n_base": n_base, "n_delta": n_delta,
            "docs_added": s["docs_added"],
            "base_build_secs": round(t_base, 2),
            "extend_secs": round(t_extend, 2),
            "extend_deferred_prior_secs": round(t_defer, 2),
            "full_rebuild_secs": round(t_full, 2),
            "extend_vs_rebuild": round(t_extend / t_full, 3),
            "delta_share_of_docs": round(n_delta / (n_base + n_delta), 3),
        }))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())

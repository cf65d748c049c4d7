"""Micro-profile: isolate why tokenize anti-scales 8→32 threads.

Generates (once) a heavy corpus under /tmp/se_corpus_keep, then times,
in a fresh JVM per (cores, batch, mem) combo:
  A. pure-JVM pass: sha256 + length sum over content (no Python)
  B. tokenize via mapInPandas → count()
Usage:
  python tools/profile_tokenize.py gen [n_docs]
  python tools/profile_tokenize.py run <cores> <arrow_batch> <driver_mem>
  python tools/profile_tokenize.py sweep
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS = "/tmp/se_corpus_keep/corpus.parquet"


def gen(n_docs: int) -> None:
    from pyspark.sql import functions as F

    from search_engine_spark.session import get_spark

    spark = get_spark("gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = max(1, n_docs // 5000)
    (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .select(
            F.lit("r").alias("repo"),
            F.concat_ws("/", F.col("doc_id").cast("string"),
                        F.col("rep").cast("string")).alias("path"),
            F.md5(F.concat_ws("#", F.col("text"), F.col("rep").cast("string"))).alias("commit"),
            F.col("lang"),
            F.concat_ws(" ", F.repeat(F.concat(F.col("text"), F.lit(" ")), 12),
                        F.concat(F.lit("repsalt"), F.col("rep").cast("string"))).alias("content"),
        )
        .repartition(64)
        .write.mode("overwrite").parquet(CORPUS)
    )
    print("docs:", spark.read.parquet(CORPUS).count())


def run(cores: int, arrow_batch: int, driver_mem: str) -> None:
    from pyspark.sql import functions as F

    from search_engine_spark.functions.tokenize import extract_postings
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.corpus import with_identity

    spark = get_spark(
        f"prof-{cores}", cores=cores, driver_memory=driver_mem,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow_batch)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(CORPUS)

    t0 = time.perf_counter()
    corpus.select(F.sha2("content", 256).alias("s"), F.length("content").alias("l")).agg(
        F.count("s"), F.sum("l")
    ).collect()
    jvm_secs = time.perf_counter() - t0

    wid = with_identity(corpus)
    t0 = time.perf_counter()
    n = extract_postings(wid.select("doc_id", "content"), "content").count()
    tok_secs = time.perf_counter() - t0
    print(json.dumps({"cores": cores, "batch": arrow_batch, "mem": driver_mem,
                      "jvm_secs": round(jvm_secs, 2), "tok_secs": round(tok_secs, 2),
                      "postings": n}))


def sweep() -> None:
    for cores, batch, mem in [
        (8, 10000, "16g"),
        (32, 10000, "16g"),
        (32, 2000, "16g"),
        (32, 10000, "64g"),
        (32, 2000, "64g"),
    ]:
        out = subprocess.run(
            [sys.executable, __file__, "run", str(cores), str(batch), mem],
            capture_output=True, text=True,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else out.stderr[-300:]
        print(line, flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(int(sys.argv[2]) if len(sys.argv) > 2 else 100_000)
    elif sys.argv[1] == "run":
        run(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        sweep()

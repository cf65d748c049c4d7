"""Partition pruning over a directory-partitioned corpus: the Iceberg
input_hint's scan behavior on the Parquet stand-in. A lang-filtered
load must show the predicate as a PartitionFilter (pruned at listing
time, zero data read for other langs), not a post-scan Filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.search_sql import bm25_topk_filtered
from search_engine_spark.sources.corpus import load_corpus, with_identity


@pytest.fixture(scope="module")
def part_corpus(spark, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("pcorp") / "corpus_by_lang"
    (
        load_corpus(spark, str(fixture_dir / "corpus.parquet"))
        .write.partitionBy("lang").parquet(str(out))
    )
    return str(out)


def test_lang_filter_is_partition_filter(spark, part_corpus):
    df = load_corpus(spark, part_corpus).where(F.col("lang") == "python")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "lang" in pf, plan  # pruned at file listing, not post-scan


def test_filtered_retrieval_reads_one_partition(spark, part_corpus):
    docs = with_identity(load_corpus(spark, part_corpus)).select(
        "doc_id", "lang", F.col("content").alias("text")
    )
    top = bm25_topk_filtered(spark, docs, ["merge", "sort"], lang="python", k=5)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "lang" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    rows = top.collect()
    assert rows
    # every hit really is from the filtered partition
    got_langs = {
        r["lang"]
        for r in docs.where(F.col("lang") == "python")
        .join(top.select("doc_id"), "doc_id", "left_semi")
        .select("lang").distinct().collect()
    }
    assert got_langs == {"python"}

"""Physical-plan invariants pinned as tests (the PLANS.md audit,
mechanized): term/bucket pushdown reaches the index scan, dimension
joins broadcast, and no operator silently degrades to a cartesian
product. These are the regressions `.explain` audits catch by hand —
this file catches them at commit time."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from search_engine_spark.plans.build import build_index_df
    from search_engine_spark.plans.query import QueryEngine

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pyspark.sql import functions as F

    corpus = docs.select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("d/"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("c").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    ix = str(tmp_path_factory.mktemp("plan_ix") / "ix")
    build_index_df(spark, corpus, ix)
    return QueryEngine(spark, ix, cache_docs=False)


def test_query_scan_is_term_and_bucket_pruned(engine):
    """The blocks scan must carry BOTH pushed predicates: bucket
    (directory/partition prune) and term (row-group prune)."""
    plan = _plan(engine.bm25("spark join window", k=10, wand=False))
    assert "PartitionFilters" in plan or "bucket" in plan
    # the term IN (...) predicate reaches the parquet reader
    assert "PushedFilters" in plan
    assert "term" in plan.split("PushedFilters", 1)[1][:400]


def test_no_cartesian_product_in_gate_plans(spark):
    """The non-broadcast crossJoins in the tree are all bounded
    single-row/stats joins; a real CartesianProduct over data relations
    is a plan regression. Checked over a representative gate set."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in (
        "search_percolate_not", "search_collapse_topk",
        "search_hybrid_rrf", "search_syn_phrase",
        "search_phrase_prefix", "dedup_lsh_pairs", "graph_ppr_5iter",
    ):
        plan = _plan(qs[name](spark, SF))
        for bad in ("CartesianProduct",):
            if bad in plan:
                # allowed only for single-row stats relations: those
                # appear as BroadcastNestedLoopJoin in Spark 4, so a
                # raw CartesianProduct is always a regression
                raise AssertionError(f"{name}: {bad} in plan")


def test_modifier_plans_add_no_joins(engine):
    """function_score modifiers must not change the join structure of
    retrieval (the kernel/expression carries the transform)."""
    from search_engine_spark.operators.scoremod import (
        DlSaturation,
        RecencyDecay,
    )

    base = _plan(engine.bm25("spark join window", k=10, wand=True))
    for mod in (RecencyDecay(), DlSaturation()):
        p = _plan(engine.bm25("spark join window", k=10, wand=True,
                              modifier=mod))
        assert p.count("Join") == base.count("Join")

"""df-adaptive salting (SURVEY §7 watch item 2): rare terms pack into
single unsalted blocks; WAND over the mixed layout stays rank-identical
to exhaustive scoring and to a fixed-salt index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.build import build_index_df
from search_engine_spark.plans.query import QueryEngine

REL_TOL = 1e-9


@pytest.fixture(scope="module")
def two_indexes(spark, fixture_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("adaptive_salt")
    corpus = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    ix_adapt, ix_fixed = str(root / "ix_adapt"), str(root / "ix_fixed")
    build_index_df(spark, corpus, ix_adapt,
                   EngineConfig(rare_salt_df_threshold=None))  # default on
    build_index_df(spark, corpus, ix_fixed,
                   EngineConfig(rare_salt_df_threshold=0))      # round-1 layout
    return ix_adapt, ix_fixed


def test_rare_terms_are_unsalted_and_blocks_shrink(spark, two_indexes):
    ix_adapt, ix_fixed = two_indexes
    ba = spark.read.parquet(f"{ix_adapt}/blocks")
    bf = spark.read.parquet(f"{ix_fixed}/blocks")
    n_unsalted = ba.where(F.col("salt") == -1).count()
    assert n_unsalted > 0  # the fixture vocab has a long tail
    assert bf.where(F.col("salt") == -1).count() == 0
    # every rare term occupies exactly one group (<= df/block_size + 1
    # blocks, all block_id-contiguous) instead of 2^salt_bits groups
    per_term = (
        ba.where(F.col("salt") == -1)
        .groupBy("term").agg(F.countDistinct("salt").alias("ng"))
    )
    assert per_term.where(F.col("ng") > 1).count() == 0
    # layout win: strictly fewer block rows than the fixed-salt index
    assert ba.count() < bf.count()
    # same postings either way: per-term posting totals agree
    ta = {r["term"]: r["s"] for r in
          ba.groupBy("term").agg(F.sum("n").alias("s")).collect()}
    tf_ = {r["term"]: r["s"] for r in
           bf.groupBy("term").agg(F.sum("n").alias("s")).collect()}
    assert ta == tf_


def test_wand_matches_exhaustive_on_adaptive_layout(spark, two_indexes,
                                                    fixture_queries):
    ix_adapt, _ = two_indexes
    eng = QueryEngine(spark, ix_adapt)
    for q in fixture_queries[:6]:
        rw = eng.bm25(q, k=10, wand=True).collect()
        re_ = eng.bm25(q, k=10, wand=False).collect()
        assert [r["doc_id"] for r in rw] == [r["doc_id"] for r in re_], q
        for a, b in zip(rw, re_):
            assert a["score"] == pytest.approx(b["score"], rel=REL_TOL)
            assert a["matched"] == b["matched"]


def test_adaptive_matches_fixed_index(spark, two_indexes, fixture_queries):
    ix_adapt, ix_fixed = two_indexes
    ea, ef = QueryEngine(spark, ix_adapt), QueryEngine(spark, ix_fixed)
    for q in fixture_queries[:6]:
        ra = ea.bm25(q, k=10, wand=True).collect()
        rf = ef.bm25(q, k=10, wand=True).collect()
        assert [r["doc_id"] for r in ra] == [r["doc_id"] for r in rf], q
        for a, b in zip(ra, rf):
            assert a["score"] == pytest.approx(b["score"], rel=REL_TOL)


def test_rare_only_query_retrieves(spark, two_indexes):
    """A query whose every term is rare must still retrieve via the
    replicated unsalted blocks (no aligned rows to anchor the groups)."""
    ix_adapt, _ = two_indexes
    eng = QueryEngine(spark, ix_adapt)
    blocks = spark.read.parquet(f"{ix_adapt}/blocks")
    rare_term = (
        blocks.where(F.col("salt") == -1)
        .groupBy("term").agg(F.sum("n").alias("df"))
        .orderBy(F.desc("df"), F.asc("term")).limit(1).collect()[0]["term"]
    )
    got_w = eng.bm25(rare_term, k=5, wand=True).collect()
    got_e = eng.bm25(rare_term, k=5, wand=False).collect()
    assert len(got_w) > 0
    assert [r["doc_id"] for r in got_w] == [r["doc_id"] for r in got_e]
    # no duplicate docs leaked through the replicate+merge
    ids = [r["doc_id"] for r in got_w]
    assert len(ids) == len(set(ids))

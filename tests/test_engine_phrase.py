"""Engine-level phrase search over the persisted positional index:
must agree with the ops-level algorithm (independent path over raw
text), survive segmented incremental ingest, and respect tombstones.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.tokenize import tokenize
from search_engine_spark.ops import phrase as ops_phrase
from search_engine_spark.plans.build import build_index_df, extend_index_df
from search_engine_spark.plans.query import QueryEngine
from search_engine_spark.sources.corpus import with_identity


@pytest.fixture(scope="module")
def pos_index(spark, fixture_dir, tmp_path_factory):
    """Base build (120 docs) + positional extend (80) — the segmented
    layout is the normal state of a long-lived index."""
    root = tmp_path_factory.mktemp("engine_phrase")
    corpus = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    paths = sorted(r["path"] for r in corpus.select("path").collect())
    cfg = EngineConfig(store_positions=True)
    ix = str(root / "ix")
    build_index_df(spark, corpus.where(F.col("path").isin(paths[:120])), ix, cfg)
    extend_index_df(spark, corpus.where(F.col("path").isin(paths[120:])), ix, cfg)
    return ix, corpus


def _pick_phrase(spark, corpus) -> str:
    """A 2-token phrase that actually occurs in the fixture stream."""
    docs_frame = with_identity(corpus).select(
        "doc_id", F.col("content").alias("text")
    )
    for cand in ("binary search", "search tree", "hash table", "sort merge"):
        n = ops_phrase.phrase_occurrences(docs_frame, tokenize(cand)).count()
        if n > 0:
            return cand
    raise AssertionError("no candidate phrase occurs in the fixture corpus")


def test_engine_phrase_matches_ops_algorithm(spark, pos_index):
    ix, corpus = pos_index
    q = _pick_phrase(spark, corpus)
    eng = QueryEngine(spark, ix)
    got = eng.phrase(q, k=10).collect()
    assert len(got) > 0
    docs_frame = with_identity(corpus).select(
        "doc_id", F.col("content").alias("text")
    )
    want = ops_phrase.phrase_topk(spark, docs_frame, tokenize(q), k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for a, b in zip(got, want):
        assert a["pf"] == b["pf"]
        # ops flavor rounds to 4dp for its SQL oracle; engine is exact
        assert round(a["score"], 4) == pytest.approx(b["score"], abs=1e-4)


def test_engine_rescore_blends_phrase_bonus(spark, pos_index):
    """rescore == bm25 window re-ordered by score + w·ln(1+pf), with pf
    the engine's own phrase counts over the window — cross-checked
    against eng.bm25 and eng.phrase outputs."""
    import math

    ix, corpus = pos_index
    q = _pick_phrase(spark, corpus)
    eng = QueryEngine(spark, ix)
    window_size, w = 15, 2.0
    got = eng.rescore(q, k=10, window_size=window_size, weight=w).collect()
    assert len(got) > 0
    cand = eng.bm25(q, k=window_size).collect()
    cand_ids = {r["doc_id"]: r["score"] for r in cand}
    pf_map = {
        r["doc_id"]: r["pf"]
        for r in eng.phrase(q, k=10_000).collect()
    }
    want = sorted(
        (
            {
                "doc_id": d,
                "final": s + w * math.log(1 + pf_map.get(d, 0)),
                "score": s,
                "pf": pf_map.get(d, 0),
            }
            for d, s in cand_ids.items()
        ),
        key=lambda r: (-r["final"], -r["score"], r["doc_id"]),
    )[:10]
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for a, b in zip(got, want):
        assert a["pf"] == b["pf"]
        assert a["final"] == pytest.approx(b["final"], rel=1e-9)
    # at least one hit actually carries a phrase bonus on this fixture
    assert any(r["pf"] > 0 for r in got)


def test_engine_phrase_spans_generations(spark, pos_index):
    """Positions exist for both generations and phrase hits include
    docs ingested by the extend."""
    ix, _ = pos_index
    pos = spark.read.parquet(f"{ix}/positions")
    assert {r["gen"] for r in pos.select("gen").distinct().collect()} == {0, 1}


def test_engine_phrase_respects_tombstones(spark, pos_index):
    ix, corpus = pos_index
    from search_engine_spark.plans.build import delete_docs

    q = _pick_phrase(spark, corpus)
    eng0 = QueryEngine(spark, ix)
    top = eng0.phrase(q, k=5).collect()
    assert len(top) > 0
    victim = top[0]["doc_id"]
    delete_docs(spark, ix, [victim])
    try:
        eng = QueryEngine(spark, ix)
        got = {r["doc_id"] for r in eng.phrase(q, k=5).collect()}
        assert victim not in got
    finally:
        # clean tombstones so sibling tests see the full index
        from search_engine_spark.plans.build import _delete_path

        _delete_path(spark, f"{ix}/tombstones")


def test_phrase_requires_positional_index(spark, fixture_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("no_positions")
    corpus = spark.read.parquet(str(fixture_dir / "corpus.parquet")).limit(30)
    ix = str(root / "ix")
    build_index_df(spark, corpus, ix)  # store_positions defaults off
    eng = QueryEngine(spark, ix)
    with pytest.raises(ValueError, match="no positional index"):
        eng.phrase("binary search")


def test_phrase_empty_query(spark, pos_index):
    ix, _ = pos_index
    eng = QueryEngine(spark, ix)
    assert eng.phrase("123 ,,, ':::'").collect() == []


def test_engine_near_matches_ops_flavor(spark, pos_index):
    """QueryEngine.near over the positional sidecar == the
    SQL-checkable banded-join flavor on the same corpus, both modes."""
    from search_engine_spark.ops.phrase import near_pair_counts

    ix, corpus = pos_index
    eng = QueryEngine(spark, ix, cfg=EngineConfig(store_positions=True))
    docs = with_identity(corpus).select(
        "doc_id", F.col("content").alias("text")
    )
    for ordered in (False, True):
        got = {r["doc_id"]: r["pf"]
               for r in eng.near("merge", "sort", window=4, k=100000,
                                 ordered=ordered).collect()}
        want = {r["doc_id"]: r["pf"]
                for r in near_pair_counts(docs, "merge", "sort", 4,
                                          ordered=ordered).collect()}
        assert got == want and got


def test_engine_near_validates_terms(spark, pos_index):
    ix, _ = pos_index
    eng = QueryEngine(spark, ix)
    with pytest.raises(ValueError):
        eng.near("merge", "merge")


def test_bm25_quoted_phrase_filter(spark, pos_index):
    """r3: quoted phrases in bm25(phrases=) are pre-top-k FILTERS
    (Lucene query-string quoted phrase): only docs containing the exact
    in-order sequence qualify, scores stay the plain disjunctive BM25
    of the word set; composes with min_match; empty-tokenizing phrases
    are no-ops; a phrase that never occurs empties the result."""
    ix, corpus = pos_index
    q = _pick_phrase(spark, corpus)
    eng = QueryEngine(spark, ix)
    docs_frame = with_identity(corpus).select(
        "doc_id", F.col("content").alias("text")
    )
    have = {
        r["doc_id"]
        for r in ops_phrase.phrase_occurrences(docs_frame, tokenize(q))
        .select("doc_id").distinct().collect()
    }
    assert have
    plain = {r["doc_id"]: r["score"]
             for r in eng.bm25(q, k=500).collect()}
    got = eng.bm25(q, k=500, phrases=[q]).collect()
    assert got
    assert {r["doc_id"] for r in got} == have & set(plain)
    for r in got:
        assert r["score"] == pytest.approx(plain[r["doc_id"]], rel=1e-9)
    # composes with min_match (both words required anyway for 2 terms)
    got_m = eng.bm25(q, k=500, phrases=[q], min_match=2).collect()
    assert {r["doc_id"] for r in got_m} <= {r["doc_id"] for r in got}
    # no-op and never-occurring phrases
    assert {r["doc_id"] for r in eng.bm25(q, k=500, phrases=["',,,'"]).collect()} \
        == set(plain)
    assert eng.bm25(q, k=10, phrases=["zzznope yyynope"]).collect() == []


def test_quoted_phrase_filter_requires_positions(spark, fixture_dir,
                                                 tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("qs_nopos") / "ix")
    corpus = spark.read.parquet(str(fixture_dir / "corpus.parquet")).limit(30)
    build_index_df(spark, corpus, ix)
    eng = QueryEngine(spark, ix)
    with pytest.raises(ValueError, match="store_positions"):
        eng.bm25("binary search", k=5, phrases=["binary search"]).collect()

"""Opt-in s-stemmer analyzer (``EngineConfig.stem``): index-side and
query-side analysis agree (Lucene analyzer symmetry), plural/singular
variants share posting lists, both tokenizer kernels apply the same
rule, and extend inherits the base index's analyzer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.tokenize import (
    extract_postings,
    extract_postings_jvm,
    stem_token,
)
from search_engine_spark.plans.build import build_index_df, extend_index_df
from search_engine_spark.plans.query import QueryEngine

CFG = EngineConfig(stem=True, build_waves=1, build_partitions=4)

DOCS = [
    ("r0", "a/trees.py", "c0", "py", "binary trees store sorted keys"),
    ("r0", "a/tree.py", "c0", "py", "a binary tree stores one key"),
    ("r0", "b/sorts.py", "c0", "py", "merge sorts beat bubble sorts"),
    ("r0", "b/sort.py", "c0", "py", "merge sort splits the list"),
    ("r0", "c/glass.py", "c0", "py", "glass classes bonus axis this"),
    ("r0", "d/filler.py", "c0", "py", "unrelated filler words here"),
]
DELTA = [
    ("r1", "e/queues.py", "c1", "py", "queues and stacks and heaps"),
]


def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


@pytest.fixture(scope="module")
def stem_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("stem_ix") / "ix")
    build_index_df(spark, _corpus(spark, DOCS), ix, CFG)
    return ix


def test_stem_token_rules():
    assert stem_token("trees") == "tree"
    assert stem_token("sorts") == "sort"
    assert stem_token("says") == "say"
    assert stem_token("glass") == "glass"    # 'ss' guard
    assert stem_token("bonus") == "bonus"    # 'us' guard
    assert stem_token("axis") == "axis"      # 'is' guard
    assert stem_token("as") == "as"          # length guard
    assert stem_token("its") == "its"        # length guard (len 3)
    assert stem_token("tree") == "tree"      # no trailing s


def test_stem_series_matches_scalar_property():
    """Vectorized pandas stemmer ≡ the scalar rule on arbitrary
    tokenizer-shaped strings (hypothesis)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_spark.functions.tokenize import _stem_series

    token = st.text(
        alphabet=st.characters(whitelist_categories=("Ll",)), min_size=1,
        max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(token, min_size=1, max_size=20))
    def run(tokens):
        got = _stem_series(pd.Series(tokens, dtype=object)).tolist()
        assert got == [stem_token(t) for t in tokens]

    run()


def test_kernels_agree_under_stem(spark, fixture_dir):
    corpus = (
        spark.read.parquet(str(fixture_dir / "corpus.parquet"))
        .limit(50)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    )
    a = extract_postings(
        corpus.select("doc_id", "content"), stem=True
    ).collect()
    b = extract_postings_jvm(
        corpus.select("doc_id", "content"), stem=True
    ).collect()
    key = lambda r: (r["doc_id"], r["term"])  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and the stem actually ran: no stemmable plural survives
    for r in a:
        assert stem_token(r["term"]) == r["term"]


def test_index_vocabulary_is_stemmed(spark, stem_index):
    vocab = {
        r["term"] for r in spark.read.parquet(f"{stem_index}/terms").collect()
    }
    assert "tree" in vocab and "trees" not in vocab
    assert "sort" in vocab and "sorts" not in vocab
    # guard classes survive unstemmed
    assert {"glass", "bonus", "axis", "this"} <= vocab
    # variant tf merged into one posting: 'sorts ... sorts' + none else
    # in b/sorts.py → df of 'sort' covers both sort docs
    terms = spark.read.parquet(f"{stem_index}/terms")
    df_sort = terms.where(F.col("term") == "sort").collect()[0]["df"]
    assert df_sort == 2


def test_query_side_stems_symmetrically(spark, stem_index):
    eng = QueryEngine(spark, stem_index, CFG, cache_docs=False)
    plural = {r["path"] for r in eng.bm25("trees", k=5).collect()}
    single = {r["path"] for r in eng.bm25("tree", k=5).collect()}
    assert plural == single
    assert {"a/trees.py", "a/tree.py"} <= plural
    # scores identical too (same analyzed term set)
    sp = [(r["path"], r["score"]) for r in eng.bm25("trees", k=5).collect()]
    ss = [(r["path"], r["score"]) for r in eng.bm25("tree", k=5).collect()]
    assert sp == ss


@pytest.fixture(scope="module")
def stem_pos_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("stem_pos_ix") / "ix")
    build_index_df(
        spark, _corpus(spark, DOCS), ix,
        EngineConfig(stem=True, store_positions=True,
                     build_waves=1, build_partitions=4),
    )
    return ix


def test_boolean_clauses_are_analyzed(spark, stem_pos_index):
    """require/exclude lists pass through the stemmer too (Lucene
    analyzes every clause): +trees on a stemmed index must hit the
    'tree' posting list, and -stores must kill docs with 'store'."""
    eng = QueryEngine(spark, stem_pos_index, cache_docs=False)
    req = {r["path"] for r in
           eng.bm25("binary keys", require=["trees"], k=5).collect()}
    assert req == {"a/trees.py", "a/tree.py"}
    # both tree docs contain store/stores → excluding the PLURAL form
    # must remove them all
    assert eng.bm25("tree", exclude=["stores"], k=5).count() == 0


def test_phrase_is_analyzed(spark, stem_pos_index):
    """Phrase legs stem position-preservingly: 'binary trees' matches
    both the plural and the singular adjacency."""
    eng = QueryEngine(spark, stem_pos_index, cache_docs=False)
    hits = {r["path"] for r in eng.phrase("binary trees", k=5).collect()}
    assert hits == {"a/trees.py", "a/tree.py"}


def test_near_is_analyzed(spark, stem_pos_index):
    """NEAR legs stem like every other surface: the positions sidecar
    stores stemmed terms, so plural legs must still match."""
    eng = QueryEngine(spark, stem_pos_index, cache_docs=False)
    plural = {r["path"] for r in eng.near("binary", "keys", window=6).collect()}
    single = {r["path"] for r in eng.near("binary", "key", window=6).collect()}
    assert plural == single and plural  # non-empty and identical


def test_fresh_rebuild_honors_explicit_flag(spark, tmp_path):
    """A COMPLETED build's marker must not override a deliberate full
    rebuild with a different analyzer — the marker wins only on genuine
    resumes (completed postings partitions present)."""
    ix = str(tmp_path / "ix")
    build_index_df(spark, _corpus(spark, DOCS), ix, CFG)  # stemmed
    # deliberate rebuild WITHOUT stemming, resume disabled = fresh build
    build_index_df(
        spark, _corpus(spark, DOCS), ix,
        EngineConfig(stem=False, build_waves=1, build_partitions=4),
        resume=False,
    )
    vocab = {r["term"] for r in spark.read.parquet(f"{ix}/terms").collect()}
    assert "trees" in vocab  # plural survives: the explicit flag won
    from search_engine_spark.plans.build import read_stats

    assert read_stats(spark, ix)["analyzer"] == "plain"


def test_resumed_build_inherits_pinned_analyzer(spark, tmp_path):
    """A base build interrupted mid-wave and resumed with a DIFFERENT
    cfg.stem must not mix analyzers: the analyzer.json marker written
    before wave 0 wins over the resuming caller's cfg."""
    ix = str(tmp_path / "ix")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index_df(
            spark, _corpus(spark, DOCS), ix,
            EngineConfig(stem=True, build_waves=2, build_partitions=4),
            fail_after_waves=1,
        )
    # resume WITHOUT the stem flag — marker must override
    build_index_df(
        spark, _corpus(spark, DOCS), ix,
        EngineConfig(stem=False, build_waves=2, build_partitions=4),
    )
    vocab = {r["term"] for r in spark.read.parquet(f"{ix}/terms").collect()}
    assert "tree" in vocab and "trees" not in vocab
    from search_engine_spark.plans.build import read_stats

    assert read_stats(spark, ix)["analyzer"] == "stem"


def test_legacy_premarker_resume_falls_back_to_stats(spark, tmp_path):
    """A legacy (pre-marker) index has no analyzer.json but a completed
    stats.json. Resuming it with a DIFFERENT --stem flag must pin the
    landed analyzer from stats.json (the _inherit_analyzer fallback) —
    not the caller's flag — or the completed (plain) partitions would
    be skipped while stats.json gets rewritten claiming 'stem', and
    queries would stem terms against an unstemmed index."""
    import os

    ix = str(tmp_path / "ix")
    build_index_df(
        spark, _corpus(spark, DOCS), ix,
        EngineConfig(stem=False, build_waves=1, build_partitions=4),
    )
    os.remove(f"{ix}/analyzer.json")  # simulate pre-marker index
    # resume with stem=True: all postings partitions are complete, so
    # nothing re-tokenizes — the analyzer MUST stay 'plain'
    build_index_df(
        spark, _corpus(spark, DOCS), ix,
        EngineConfig(stem=True, build_waves=1, build_partitions=4),
    )
    from search_engine_spark.plans.build import read_stats

    assert read_stats(spark, ix)["analyzer"] == "plain"
    vocab = {r["term"] for r in spark.read.parquet(f"{ix}/terms").collect()}
    assert "trees" in vocab  # plural survived: no mixed analysis
    # and the marker got promoted so later extends see it directly
    eng = QueryEngine(spark, ix, cache_docs=False)
    hits = {r["path"] for r in eng.bm25("trees", k=5).collect()}
    assert "a/trees.py" in hits


def test_extend_inherits_analyzer(spark, stem_index):
    # cfg says stem=False, but the landed index is stemmed — the delta
    # must tokenize with the index's analyzer, not the caller's cfg
    extend_index_df(
        spark, _corpus(spark, DELTA), stem_index,
        EngineConfig(stem=False, build_waves=1, build_partitions=4),
    )
    vocab = {
        r["term"] for r in spark.read.parquet(f"{stem_index}/terms").collect()
    }
    assert "queue" in vocab and "queues" not in vocab
    eng = QueryEngine(spark, stem_index, CFG, cache_docs=False)
    hits = {r["path"] for r in eng.bm25("queues", k=3).collect()}
    assert "e/queues.py" in hits

"""Milestone-1 end-to-end: Spark BM25 top-k must be rank-identical to
the NumPy oracle on the fixed query set (FIXTURES.md §2/§4):
same doc_ids in the same order, scores within 1e-9 relative tolerance.
"""

from __future__ import annotations

import json

import pytest

from search_engine_spark.operators.postings import build_postings, build_terms, corpus_stats
from search_engine_spark.operators.scoring import bm25_topk
from search_engine_spark.sources.corpus import docs_table, load_corpus, with_identity
from tests.oracle import bm25_topk as oracle_topk
from tests.oracle import build_oracle_index

REL_TOL = 1e-9


@pytest.fixture(scope="module")
def built(spark, fixture_dir):
    corpus = with_identity(load_corpus(spark, str(fixture_dir / "corpus.parquet")))
    n_docs = corpus.count()
    postings = build_postings(corpus).persist()
    terms = build_terms(postings, n_docs).persist()
    stats = corpus_stats(postings, n_docs)
    docs = docs_table(corpus).persist()
    yield {"postings": postings, "terms": terms, "stats": stats, "docs": docs}
    postings.unpersist()
    terms.unpersist()
    docs.unpersist()


@pytest.fixture(scope="module")
def oracle_ix(fixture_dir):
    import pyarrow.parquet as pq

    tbl = pq.read_table(fixture_dir / "corpus.parquet").to_pylist()
    expected = json.loads((fixture_dir / "expected.json").read_text())
    by_path = {d["path"]: d["doc_id"] for d in expected["docs"]}
    docs = [
        {"doc_id": by_path[r["path"]], "path": r["path"], "content": r["content"]}
        for r in tbl
    ]
    return build_oracle_index(docs)


def test_corpus_stats_match(built, oracle_ix):
    assert built["stats"]["n_docs"] == oracle_ix.n_docs
    assert built["stats"]["avgdl"] == pytest.approx(oracle_ix.avgdl, rel=1e-12)


def test_terms_df_idf_match(built, oracle_ix):
    got = {r["term"]: (r["df"], r["idf"]) for r in built["terms"].collect()}
    assert set(got) == set(oracle_ix.df)
    for t, d in oracle_ix.df.items():
        assert got[t][0] == d, t
        assert got[t][1] == pytest.approx(oracle_ix.idf(t), rel=1e-12), t


def test_rank_identity_on_query_set(built, oracle_ix, fixture_queries, spark):
    for q in fixture_queries:
        expected = oracle_topk(oracle_ix, q, k=10)
        got = bm25_topk(
            built["postings"], built["terms"], built["docs"], q,
            built["stats"]["avgdl"], k=10,
        ).collect()
        assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected], (
            f"doc order mismatch for query {q!r}"
        )
        for r, e in zip(got, expected):
            assert r["score"] == pytest.approx(e["score"], rel=REL_TOL), (q, r["doc_id"])
            assert r["matched"] == e["matched"]


def test_determinism_across_parallelism(built, spark, fixture_dir, fixture_queries):
    """Same top-k at a different partitioning (guards sum-order drift)."""
    corpus = with_identity(load_corpus(spark, str(fixture_dir / "corpus.parquet")))
    n_docs = corpus.count()
    postings2 = build_postings(corpus.repartition(13))
    terms2 = build_terms(postings2, n_docs)
    docs = docs_table(corpus)
    stats2 = corpus_stats(postings2, n_docs)
    q = fixture_queries[5]
    a = bm25_topk(built["postings"], built["terms"], built["docs"], q,
                  built["stats"]["avgdl"], k=10).collect()
    b = bm25_topk(postings2, terms2, docs, q, stats2["avgdl"], k=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    for ra, rb in zip(a, b):
        assert ra["score"] == pytest.approx(rb["score"], rel=REL_TOL)

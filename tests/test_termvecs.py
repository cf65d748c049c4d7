"""Term-vectors sidecar (Lucene term vectors) + the engine surfaces it
powers: more_like_this and bm25_prf — rank-identical to an in-memory
oracle that replays the documented selection rules."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.build import build_index
from search_engine_spark.plans.query import QueryEngine
from tests.oracle import _desc_str, bm25_score, build_oracle_index

K = 10
TOP_M = 20
QUERY = "binary search tree"


@pytest.fixture(scope="module")
def index_dir(spark, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("index-tv") / "ix"
    summary = build_index(
        spark, str(fixture_dir / "corpus.parquet"), str(out),
        cfg=EngineConfig(store_termvecs=True),
    )
    assert summary["n_docs"] == 200
    return str(out)


@pytest.fixture(scope="module")
def engine(spark, index_dir):
    return QueryEngine(spark, index_dir)


@pytest.fixture(scope="module")
def oracle_ix(fixture_dir):
    tbl = pq.read_table(fixture_dir / "corpus.parquet").to_pylist()
    expected = json.loads((fixture_dir / "expected.json").read_text())
    by_path = {d["path"]: d["doc_id"] for d in expected["docs"]}
    return build_oracle_index(
        [{"doc_id": by_path[r["path"]], "path": r["path"],
          "content": r["content"]} for r in tbl]
    )


def _oracle_tv(ix, doc_id, m=TOP_M):
    """The sidecar's frozen per-doc truncation: top-m by (tf desc,
    term asc)."""
    rows = [
        (t, p[doc_id]) for t, p in ix.postings.items() if doc_id in p
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:m]


def _rank(ix, rows):
    rows.sort(key=lambda r: (-r["score"], -r["matched"],
                             _desc_str(ix.path[r["doc_id"]]), r["doc_id"]))
    return rows


def _oracle_bm25(ix, terms, weights=None):
    weights = weights or {}
    cand = set()
    for t in terms:
        cand.update(ix.postings.get(t, {}).keys())
    out = []
    for d in cand:
        score, matched = 0.0, 0
        s, m = bm25_score(ix, terms, d)
        if not weights:
            score, matched = s, m
        else:
            for t in sorted(set(terms)):
                tf = ix.postings.get(t, {}).get(d)
                if tf is None:
                    continue
                matched += 1
                w = float(weights.get(t, 1.0))
                norm = ix.dl[d] / ix.avgdl if ix.avgdl else 0.0
                from search_engine_spark.config import BM25_B, BM25_K1

                score += (w * ix.idf(t) * (tf * (BM25_K1 + 1.0))
                          / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * norm)))
        out.append({"doc_id": d, "score": score, "matched": matched})
    return out


def test_sidecar_rows_match_oracle_truncation(spark, engine, oracle_ix):
    tv = spark.read.parquet(f"{engine.index_dir}/termvecs")
    got = {}
    for r in tv.collect():
        got.setdefault(r["doc_id"], []).append((r["term"], r["tf"]))
    assert set(got) == set(oracle_ix.dl)  # every doc has a vector
    for d in sorted(got)[:25]:
        assert sorted(got[d]) == sorted(_oracle_tv(oracle_ix, d))
        assert len(got[d]) <= TOP_M


def test_more_like_this_rank_identity(engine, oracle_ix):
    seed = sorted(oracle_ix.dl)[3]
    rows = _oracle_tv(oracle_ix, seed)
    seeds = sorted(
        rows, key=lambda r: (-r[1] * oracle_ix.idf(r[0]), r[0])
    )[:5]
    terms = [t for t, _ in seeds]
    want = _rank(
        oracle_ix,
        [r for r in _oracle_bm25(oracle_ix, terms) if r["doc_id"] != seed],
    )[:K]
    got = engine.more_like_this(seed, k=K).collect()
    assert len(got) == K
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)
    with pytest.raises(ValueError, match="not in the term-vectors"):
        engine.more_like_this(123456789)


def test_bm25_prf_rank_identity(engine, oracle_ix):
    from search_engine_spark.functions.tokenize import query_terms

    orig = query_terms(QUERY)
    fb = [
        r["doc_id"]
        for r in _rank(oracle_ix, _oracle_bm25(oracle_ix, orig))[:5]
    ]
    s_tf: dict[str, int] = {}
    for d in fb:
        for t, tf in _oracle_tv(oracle_ix, d):
            if t not in orig:
                s_tf[t] = s_tf.get(t, 0) + tf
    exp = sorted(
        s_tf, key=lambda t: (-s_tf[t], oracle_ix.df.get(t, 0), t)
    )[:3]
    terms = sorted({*orig, *exp})
    weights = {t: 0.5 for t in exp}
    want = _rank(oracle_ix, _oracle_bm25(oracle_ix, terms, weights))[:K]
    got = engine.bm25_prf(QUERY, k=K).collect()
    assert len(got) == K
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)
    # PRF on an OOV query degrades to the (empty) plain result
    assert engine.bm25_prf("zzznopezzz", k=K).collect() == []


def test_missing_sidecar_raises_helpfully(spark, fixture_dir,
                                          tmp_path_factory):
    out = tmp_path_factory.mktemp("index-notv") / "ix"
    build_index(spark, str(fixture_dir / "corpus.parquet"), str(out))
    eng = QueryEngine(spark, str(out))
    with pytest.raises(RuntimeError, match="store_termvecs"):
        eng.more_like_this(1)

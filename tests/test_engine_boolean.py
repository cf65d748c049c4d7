"""Engine-level boolean retrieval modes over the persisted compressed
index — min-should-match, MUST_NOT, synonym blending, explain — each
rank-identical to an independent in-memory oracle over the raw corpus
(tests/oracle.py tokenize path, §8.4 total order).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.build import build_index_df
from search_engine_spark.plans.query import QueryEngine
from tests.oracle import _desc_str, bm25_score, build_oracle_index

QUERY = "binary search tree"
EXCLUDE = ["merge"]
SYN_GROUPS = [["merge", "join"], ["sort"]]
MIN_MATCH = 2
K = 10


@pytest.fixture(scope="module")
def booly(spark, fixture_dir, oracle_docs, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("engine_boolean") / "ix")
    corpus = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    build_index_df(spark, corpus, ix)
    return QueryEngine(spark, ix), build_oracle_index(oracle_docs)


@pytest.fixture(scope="module")
def oracle_docs(fixture_dir):
    import json

    import pyarrow.parquet as pq

    tbl = pq.read_table(fixture_dir / "corpus.parquet").to_pylist()
    expected = json.loads((fixture_dir / "expected.json").read_text())
    by_path = {d["path"]: d["doc_id"] for d in expected["docs"]}
    return [
        {"doc_id": by_path[r["path"]], "path": r["path"], "content": r["content"]}
        for r in tbl
    ]


def _rank(rows):
    rows.sort(
        key=lambda r: (-r["score"], -r["matched"], _desc_str(r["path"]), r["doc_id"])
    )
    return rows


def _oracle_candidates(ix, terms):
    cand = set()
    for t in terms:
        cand.update(ix.postings.get(t, {}).keys())
    return [
        {"doc_id": d, **dict(zip(("score", "matched"), bm25_score(ix, terms, d))),
         "path": ix.path[d]}
        for d in cand
    ]


def _assert_rank_identical(got, want):
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)
        assert g["matched"] == w["matched"]


def test_min_match_rank_identity(booly):
    eng, ix = booly
    terms = QUERY.split()
    want = _rank(
        [r for r in _oracle_candidates(ix, terms) if r["matched"] >= MIN_MATCH]
    )[:K]
    got = eng.bm25(QUERY, k=K, min_match=MIN_MATCH).collect()
    assert len(want) > 0
    _assert_rank_identical(got, want)


def test_min_match_wand_rank_identity(booly):
    """r3 (VERDICT item 3): boolean queries may now cost-route through
    WAND — forcing it must give the identical qualifying top-k, for
    every min_match up to the conjunctive (AND) query."""
    eng, ix = booly
    terms = QUERY.split()
    for m in range(2, len(terms) + 1):
        want = _rank(
            [r for r in _oracle_candidates(ix, terms) if r["matched"] >= m]
        )[:K]
        got = eng.bm25(QUERY, k=K, min_match=m, wand=True).collect()
        _assert_rank_identical(got, want)


def test_must_not_rank_identity(booly):
    eng, ix = booly
    terms = QUERY.split()
    banned = set()
    for t in EXCLUDE:
        banned.update(ix.postings.get(t, {}).keys())
    assert banned, "fixture must contain the excluded term"
    want = _rank(
        [r for r in _oracle_candidates(ix, terms) if r["doc_id"] not in banned]
    )[:K]
    got = eng.bm25(QUERY, k=K, exclude=EXCLUDE).collect()
    assert len(got) > 0
    assert {r["doc_id"] for r in got}.isdisjoint(banned)
    _assert_rank_identical(got, want)


def test_must_not_wand_rank_identity(booly):
    """r3: MUST_NOT no longer forces the exhaustive path — the excluded
    terms' blocks ride the per-salt WAND fan-out and the kernel masks
    their docs before θ. Forcing WAND (alone and combined with
    min_match, and with an OOV excluded term mixed in) must be
    rank-identical to the oracle's post-hoc exclusion."""
    eng, ix = booly
    terms = QUERY.split()
    banned = set()
    for t in EXCLUDE:
        banned.update(ix.postings.get(t, {}).keys())
    assert banned
    want = _rank(
        [r for r in _oracle_candidates(ix, terms) if r["doc_id"] not in banned]
    )[:K]
    got = eng.bm25(QUERY, k=K, exclude=EXCLUDE, wand=True).collect()
    assert len(got) > 0
    assert {r["doc_id"] for r in got}.isdisjoint(banned)
    _assert_rank_identical(got, want)

    got = eng.bm25(
        QUERY, k=K, exclude=[*EXCLUDE, "zzzunknownzzz"], wand=True
    ).collect()
    _assert_rank_identical(got, want)

    for m in (2, MIN_MATCH):
        want_m = _rank(
            [r for r in _oracle_candidates(ix, terms)
             if r["doc_id"] not in banned and r["matched"] >= m]
        )[:K]
        got_m = eng.bm25(
            QUERY, k=K, exclude=EXCLUDE, min_match=m, wand=True
        ).collect()
        _assert_rank_identical(got_m, want_m)


def test_synonym_blend_rank_identity(booly):
    eng, ix = booly
    # oracle blend: per group, tf = sum of variant tfs, df = union df
    gstats = []
    for g in SYN_GROUPS:
        tf: dict[int, int] = {}
        for t in sorted(set(g)):
            for d, f in ix.postings.get(t, {}).items():
                tf[d] = tf.get(d, 0) + f
        gstats.append(tf)
    assert all(g for g in gstats), "every group must match some fixture doc"
    cand = set().union(*[set(g) for g in gstats])
    want = []
    for d in cand:
        norm = ix.dl[d] / ix.avgdl
        score, matched = 0.0, 0
        for tf in gstats:
            f = tf.get(d)
            if f is None:
                continue
            matched += 1
            df = len(tf)
            idf = math.log((ix.n_docs - df + 0.5) / (df + 0.5) + 1.0)
            from search_engine_spark.config import BM25_B, BM25_K1

            score += idf * (f * (BM25_K1 + 1.0)) / (
                f + BM25_K1 * (1.0 - BM25_B + BM25_B * norm)
            )
        want.append(
            {"doc_id": d, "score": score, "matched": matched, "path": ix.path[d]}
        )
    want = _rank(want)[:K]
    got = eng.bm25_syn(SYN_GROUPS, k=K).collect()
    _assert_rank_identical(got, want)


def test_explain_reconstructs_scores(booly):
    eng, ix = booly
    rows = eng.explain(QUERY, k=K).collect()
    assert len(rows) > 0
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top = eng.bm25(QUERY, k=K).collect()
    assert set(by_doc) == {r["doc_id"] for r in top}
    for doc_id, parts in by_doc.items():
        assert sum(p["partial"] for p in parts) == pytest.approx(
            parts[0]["score"], rel=1e-9
        )
        for p in parts:
            # components match the raw corpus statistics
            assert p["tf"] == ix.postings[p["term"]][doc_id]
            assert p["df"] == ix.df[p["term"]]
            assert p["dl"] == ix.dl[doc_id]
            assert p["idf"] == pytest.approx(ix.idf(p["term"]), rel=1e-9)


def test_search_after_keyset_pagination(booly):
    eng, _ = booly
    both = eng.bm25(QUERY, k=2 * K).collect()
    assert len(both) > K, "fixture must have more than one page of hits"
    cursor_row = both[K - 1]
    cursor = (
        cursor_row["score"], cursor_row["matched"],
        cursor_row["path"], cursor_row["doc_id"],
    )
    page2 = eng.bm25(QUERY, k=K, after=cursor).collect()
    # keyset page 2 == rows K..2K of the single-shot top-2K: no skips,
    # no repeats, same frozen total order
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in both[K:2 * K]]
    for g, w in zip(page2, both[K:2 * K]):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)
    # a cursor at the very last hit pages past the end → empty
    last = both[-1]
    n_hits = eng.total_hits(QUERY)
    if n_hits == len(both):
        tail = eng.bm25(
            QUERY, k=K,
            after=(last["score"], last["matched"], last["path"], last["doc_id"]),
        ).collect()
        assert tail == []


def test_search_after_reaches_null_path_rows(booly):
    """ADVICE r02: a docs-join miss leaves path NULL; the frozen order
    (path desc, nulls last) serves such rows at the tie-tail under
    OFFSET paging, so the keyset cursor must reach them too instead of
    silently dropping them on a NULL comparison."""
    import copy

    from pyspark.sql import functions as F

    eng, _ = booly
    both = eng.bm25(QUERY, k=2 * K).collect()
    assert len(both) > K
    drop_id = both[K]["doc_id"]  # page-2 row → becomes a NULL-path row
    eng2 = copy.copy(eng)
    eng2.docs = eng.docs.where(F.col("doc_id") != drop_id)

    full = eng2.bm25(QUERY, k=2 * K).collect()
    assert any(r["doc_id"] == drop_id and r["path"] is None for r in full)

    seen, cur = [], None
    while len(seen) < len(full):
        page = eng2.bm25(QUERY, k=K, after=cur).collect()
        assert page, "cursor walk stalled before covering the full list"
        seen.extend(page)
        last = page[-1]
        cur = (last["score"], last["matched"], last["path"], last["doc_id"])
    assert [r["doc_id"] for r in seen[: len(full)]] == [
        r["doc_id"] for r in full
    ]


def test_oov_boolean_paths_are_empty(booly):
    eng, _ = booly
    assert eng.bm25("zzzunknownzzz", k=5, min_match=2).count() == 0
    assert eng.bm25("zzzunknownzzz", k=5, exclude=["merge"]).count() == 0
    assert eng.bm25_syn([["zzzunknownzzz"]], k=5).count() == 0
    assert eng.explain("zzzunknownzzz", k=5).count() == 0


def test_must_not_rare_term_home_salt_leak(spark, tmp_path_factory):
    """End-to-end home-salt leak case (r3): a doc matched ONLY by a rare
    (unsalted, replicated) positive term while containing a frequent
    (salted) excluded term. The replicated rare block makes the doc
    visible in every salt group, but its excluded-term block lives only
    in its home group — without the kernel's home-salt filter the 3
    foreign groups would emit it and the max-merge would resurface it
    past the exclusion. The query must return only the clean doc."""
    from search_engine_spark.config import EngineConfig

    common = "mergeword"
    rare = "zzleakzz"
    rows = []
    for i in range(12):  # make the excluded term frequent → salted
        rows.append((f"r{i % 3}", f"src/common{i}.py", f"c{i}", "python",
                     f"{common} filler{i} alpha beta"))
    rows.append(("r0", "src/leak.py", "cleak", "python",
                 f"{rare} {common} gamma"))        # must be excluded
    rows.append(("r1", "src/keep.py", "ckeep", "python",
                 f"{rare} delta epsilon"))         # must survive
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")

    ix = str(tmp_path_factory.mktemp("homesalt") / "ix")
    cfg = EngineConfig(salt_bits=2, rare_salt_df_threshold=3)
    build_index_df(spark, corpus, ix, cfg=cfg)

    blocks = spark.read.parquet(f"{ix}/blocks")
    layout = {
        r["term"]: r["s"]
        for r in blocks.groupBy("term")
        .agg(F.collect_set("salt").alias("s")).collect()
        if r["term"] in (rare, common)
    }
    # precondition: the leak mechanism is actually in play — rare term
    # unsalted (replicated at query time), excluded term salted
    assert layout[rare] == [-1]
    assert -1 not in layout[common] and len(layout[common]) >= 2

    eng = QueryEngine(spark, ix)
    got = eng.bm25(rare, k=10, exclude=[common], wand=True).collect()
    paths = {r["path"] for r in got}
    assert "src/keep.py" in paths
    assert "src/leak.py" not in paths
    # exhaustive twin agrees
    got_ex = eng.bm25(rare, k=10, exclude=[common], wand=False).collect()
    assert {r["path"] for r in got_ex} == paths


def test_must_rank_identity(booly):
    """Per-term MUST (require=): only docs containing EVERY required
    term qualify; required terms also score (Lucene MUST + SHOULD).
    Rank-identical to the oracle's per-term containment filter over
    the union term set; OOV required term empties the result."""
    eng, ix = booly
    should = ["binary", "tree"]
    must = ["search"]
    allt = sorted({*should, *must})
    have = lambda d, t: d in ix.postings.get(t, {})  # noqa: E731
    want = _rank(
        [r for r in _oracle_candidates(ix, allt)
         if all(have(r["doc_id"], t) for t in must)]
    )[:K]
    got = eng.bm25(" ".join(should), k=K, require=must).collect()
    assert len(got) > 0
    for r in got:
        assert all(have(r["doc_id"], t) for t in must)
    _assert_rank_identical(got, want)

    # multi-term MUST via the CLI-equivalent args
    must2 = ["search", "tree"]
    want2 = _rank(
        [r for r in _oracle_candidates(ix, allt)
         if all(have(r["doc_id"], t) for t in must2)]
    )[:K]
    got2 = eng.bm25("binary", k=K, require=must2).collect()
    _assert_rank_identical(got2, want2)

    # OOV MUST term -> empty, like Lucene
    assert eng.bm25("binary", k=K, require=["zzznopezzz"]).collect() == []


def _oracle_boosted(ix, terms, boost):
    """Boosted oracle: each term's BM25 partial scales by its weight
    (Lucene query-time boost ≡ per-term idf scale)."""
    from search_engine_spark.config import BM25_B, BM25_K1

    cand = set()
    for t in terms:
        cand.update(ix.postings.get(t, {}).keys())
    rows = []
    for d in cand:
        dl = ix.dl.get(d, 0)
        norm_len = dl / ix.avgdl if ix.avgdl else 0.0
        score, matched = 0.0, 0
        for t in sorted(set(terms)):
            tf = ix.postings.get(t, {}).get(d)
            if tf is None:
                continue
            matched += 1
            w = float(boost.get(t, 1.0))
            score += (w * ix.idf(t) * (tf * (BM25_K1 + 1.0))
                      / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * norm_len)))
        rows.append({"doc_id": d, "score": score, "matched": matched,
                     "path": ix.path[d]})
    return rows


def test_boost_rank_identity(booly):
    """Per-term query boost (term^w): rank-identical to the boosted
    oracle on both physical paths; matched counts terms, not weight;
    boost=1.0 on every term is a no-op vs plain bm25."""
    eng, ix = booly
    terms = QUERY.split()
    boost = {"binary": 2.5, "tree": 0.5}
    want = _rank(_oracle_boosted(ix, terms, boost))[:K]
    got = eng.bm25(QUERY, k=K, boost=boost).collect()
    assert len(got) > 0
    _assert_rank_identical(got, want)
    # WAND path: scaled idf_map drives the upper bounds, stays exact
    got_w = eng.bm25(QUERY, k=K, boost=boost, wand=True).collect()
    _assert_rank_identical(got_w, want)
    # identity boost == no boost
    plain = eng.bm25(QUERY, k=K).collect()
    unit = eng.bm25(QUERY, k=K, boost={t: 1.0 for t in terms}).collect()
    _assert_rank_identical(unit, plain)


def test_boost_composes_with_boolean_modes(booly):
    """Boost composes with min_match and require (Lucene `+term^2`)."""
    eng, ix = booly
    terms = QUERY.split()
    boost = {"search": 3.0}
    want = _rank(
        [r for r in _oracle_boosted(ix, terms, boost) if r["matched"] >= 2]
    )[:K]
    got = eng.bm25(QUERY, k=K, boost=boost, min_match=2).collect()
    _assert_rank_identical(got, want)
    have = lambda d, t: d in ix.postings.get(t, {})  # noqa: E731
    want_m = _rank(
        [r for r in _oracle_boosted(ix, terms, boost)
         if have(r["doc_id"], "search")]
    )[:K]
    got_m = eng.bm25("binary tree", k=K, boost=boost,
                     require=["search"]).collect()
    _assert_rank_identical(got_m, want_m)


def test_field_filter_rank_identity(booly):
    """Lucene FILTER clause (field=): hits restricted by metadata,
    scores unchanged (corpus-wide stats). Path-prefix fixture filter,
    rank-identical to the oracle's candidate set cut by the same
    predicate; composes with boost; unknown column raises."""
    eng, ix = booly
    terms = QUERY.split()
    cand = _oracle_candidates(ix, terms)
    prefixes = sorted({r["path"].rsplit("/", 1)[0] + "/" for r in cand})
    pref = next(
        p for p in prefixes
        if 0 < sum(r["path"].startswith(p) for r in cand) < len(cand)
    )
    want = _rank([r for r in cand if r["path"].startswith(pref)])[:K]
    got = eng.bm25(QUERY, k=K, field={"path": pref + "*"}).collect()
    assert len(got) > 0
    for r in got:
        assert r["path"].startswith(pref)
    _assert_rank_identical(got, want)
    # scores are the UNFILTERED scores (filter clause, not a rebuild)
    plain = {r["doc_id"]: r["score"] for r in eng.bm25(QUERY, k=200).collect()}
    for r in got:
        assert r["score"] == pytest.approx(plain[r["doc_id"]], rel=1e-9)
    # composes with boost
    boost = {"binary": 2.0}
    want_b = _rank(
        [r for r in _oracle_boosted(ix, terms, boost)
         if r["path"].startswith(pref)]
    )[:K]
    got_b = eng.bm25(QUERY, k=K, field={"path": pref + "*"},
                     boost=boost).collect()
    _assert_rank_identical(got_b, want_b)
    # exact-match form: no hits outside the value
    assert eng.bm25(QUERY, k=K, field={"path": "zzz/nope"}).collect() == []
    with pytest.raises(ValueError, match="field filter column"):
        eng.bm25(QUERY, k=K, field={"nope": "x"})


def test_must_wand_rank_identity(booly):
    """r3: MUST (require=) rides the WAND kernel — forcing WAND gives
    the identical qualifying top-k as the exhaustive path and the
    oracle, alone and composed with min_match, exclude, and boost;
    OOV MUST stays empty under WAND."""
    eng, ix = booly
    should = ["binary", "tree"]
    have = lambda d, t: d in ix.postings.get(t, {})  # noqa: E731
    for must in (["search"], ["search", "tree"]):
        allt = sorted({*should, *must})
        want = _rank(
            [r for r in _oracle_candidates(ix, allt)
             if all(have(r["doc_id"], t) for t in must)]
        )[:K]
        got = eng.bm25(" ".join(should), k=K, require=must,
                       wand=True).collect()
        assert len(got) > 0
        _assert_rank_identical(got, want)
    # + min_match over the union set
    want_m = _rank(
        [r for r in _oracle_candidates(ix, sorted({*should, "search"}))
         if have(r["doc_id"], "search") and r["matched"] >= 2]
    )[:K]
    got_m = eng.bm25("binary tree", k=K, require=["search"],
                     min_match=2, wand=True).collect()
    _assert_rank_identical(got_m, want_m)
    # + exclude (in-kernel NOT composes with in-kernel MUST)
    banned = "merge"
    want_x = _rank(
        [r for r in _oracle_candidates(ix, sorted({*should, "search"}))
         if have(r["doc_id"], "search") and not have(r["doc_id"], banned)]
    )[:K]
    got_x = eng.bm25("binary tree", k=K, require=["search"],
                     exclude=[banned], wand=True).collect()
    _assert_rank_identical(got_x, want_x)
    # + boost
    boost = {"search": 2.0}
    want_b = _rank(
        [r for r in _oracle_boosted(ix, sorted({*should, "search"}), boost)
         if have(r["doc_id"], "search")]
    )[:K]
    got_b = eng.bm25("binary tree", k=K, require=["search"],
                     boost=boost, wand=True).collect()
    _assert_rank_identical(got_b, want_b)
    # OOV MUST empties under WAND too
    assert eng.bm25("binary", k=K, require=["zzznopezzz"],
                    wand=True).collect() == []


def test_modifier_wand_equals_exhaustive_engine(booly):
    """r4 function_score (VERDICT r3 item 3): engine-level WAND ≡
    exhaustive for both modifier kinds over the persisted index, and
    the router is ALLOWED to pick WAND for modifier queries (modifier
    does not force the exhaustive path)."""
    from search_engine_spark.operators.scoremod import (
        DlSaturation,
        RecencyDecay,
    )

    eng, _ = booly
    for mod in (RecencyDecay(), DlSaturation()):
        w = eng.bm25(QUERY, k=K, wand=True, modifier=mod).collect()
        e = eng.bm25(QUERY, k=K, wand=False, modifier=mod).collect()
        assert [r["doc_id"] for r in w] == [r["doc_id"] for r in e]
        for rw, re_ in zip(w, e):
            assert rw["score"] == pytest.approx(re_["score"], rel=1e-9)
        assert len(w) == K

    # routing: a modifier must not flip the cost-based choice — with the
    # threshold forced low, the default path is WAND with and without a
    # modifier (observable: identical results to the forced-WAND path,
    # and no ValueError from a forced-exhaustive-only feature)
    old = eng.cfg.wand_min_postings
    try:
        eng.cfg = eng.cfg.__class__(**{**eng.cfg.__dict__, "wand_min_postings": 0})
        routed = eng.bm25(QUERY, k=K, modifier=RecencyDecay()).collect()
        forced = eng.bm25(QUERY, k=K, wand=True, modifier=RecencyDecay()).collect()
        assert [r["doc_id"] for r in routed] == [r["doc_id"] for r in forced]
    finally:
        eng.cfg = eng.cfg.__class__(**{**eng.cfg.__dict__, "wand_min_postings": old})

"""Segmented incremental ingest: ``extend_index`` must produce the same
query answers as a full rebuild over the union corpus.

The delta is tokenized/encoded as its own generation (O(delta) work);
terms/stats refresh globally; old generations' blocks stay valid
because block metadata is the avgdl-independent (max_tf, min_dl) pair.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.build import build_index, extend_index, read_stats
from search_engine_spark.plans.query import QueryEngine

REL_TOL = 1e-9


@pytest.fixture(scope="module")
def split_corpora(spark, fixture_dir, tmp_path_factory):
    """Fixture corpus split into a base (120 docs) and a delta (80 docs
    + 20 overlapping base docs, which upsert semantics must skip)."""
    root = tmp_path_factory.mktemp("extend")
    full = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    paths = sorted(r["path"] for r in full.select("path").collect())
    base_paths, delta_paths = paths[:120], paths[120:]
    overlap = base_paths[:20]
    a, b, u = str(root / "a"), str(root / "b"), str(root / "union")
    full.where(F.col("path").isin(base_paths)).write.parquet(a)
    full.where(F.col("path").isin(delta_paths + overlap)).write.parquet(b)
    full.write.parquet(u)
    return a, b, u, root


@pytest.fixture(scope="module")
def extended_and_full(spark, split_corpora):
    a, b, u, root = split_corpora
    inc_dir, full_dir = str(root / "ix_inc"), str(root / "ix_full")
    s1 = build_index(spark, a, inc_dir)
    assert s1["n_docs"] == 120
    s2 = extend_index(spark, b, inc_dir)
    assert s2["generation"] == 1
    assert s2["docs_added"] == 80  # 20 overlapping docs upsert-skipped
    assert s2["n_docs"] == 200
    build_index(spark, u, full_dir)
    return inc_dir, full_dir


def test_stats_match_full_build(spark, extended_and_full):
    inc_dir, full_dir = extended_and_full
    si, sf_ = read_stats(spark, inc_dir), read_stats(spark, full_dir)
    assert si["n_docs"] == sf_["n_docs"]
    assert si["avgdl"] == pytest.approx(sf_["avgdl"], rel=REL_TOL)


def test_terms_match_full_build(spark, extended_and_full):
    inc_dir, full_dir = extended_and_full
    ti = {r["term"]: (r["df"], r["idf"])
          for r in spark.read.parquet(f"{inc_dir}/terms").collect()}
    tf_ = {r["term"]: (r["df"], r["idf"])
           for r in spark.read.parquet(f"{full_dir}/terms").collect()}
    assert set(ti) == set(tf_)
    for t, (df_i, idf_i) in ti.items():
        assert df_i == tf_[t][0], t
        assert idf_i == pytest.approx(tf_[t][1], rel=REL_TOL)


def test_blocks_are_segmented(spark, extended_and_full):
    inc_dir, _ = extended_and_full
    gens = {r["gen"] for r in
            spark.read.parquet(f"{inc_dir}/blocks").select("gen").distinct().collect()}
    assert gens == {0, 1}  # base segment untouched, delta is its own


def test_query_identical_to_full_build(spark, extended_and_full, fixture_queries):
    inc_dir, full_dir = extended_and_full
    ei, ef = QueryEngine(spark, inc_dir), QueryEngine(spark, full_dir)
    for q in fixture_queries[:6]:
        for wand in (True, False):
            ri = ei.bm25(q, k=10, wand=wand).collect()
            rf = ef.bm25(q, k=10, wand=wand).collect()
            assert [r["doc_id"] for r in ri] == [r["doc_id"] for r in rf], (q, wand)
            for a_, b_ in zip(ri, rf):
                assert a_["score"] == pytest.approx(b_["score"], rel=REL_TOL)


def test_prior_matches_full_build(spark, extended_and_full):
    inc_dir, full_dir = extended_and_full
    pi = {r["doc_id"]: r["score"]
          for r in spark.read.parquet(f"{inc_dir}/prior").collect()}
    pf = {r["doc_id"]: r["score"]
          for r in spark.read.parquet(f"{full_dir}/prior").collect()}
    assert set(pi) == set(pf)
    assert sum(abs(pi[d] - pf[d]) for d in pf) < 1e-6


def test_warm_start_extend_prior(spark, split_corpora):
    """Opt-in pagerank_warm_start=True: the extend's prior stage seeds
    from the base build's prior and converges in far fewer iterations to
    the same fixpoint within the documented 2·tol/(1−d) bound (each run
    stops within tol/(1−d) L1 of the true fixpoint). Default-off extends
    stay bit-equal to a fresh build (test_prior_matches_full_build)."""
    from search_engine_spark.config import (
        PAGERANK_DAMPING,
        PAGERANK_TOL,
        EngineConfig,
    )

    a, b, u, root = split_corpora
    warm_dir, cold_dir = str(root / "ix_warm"), str(root / "ix_cold")
    build_index(spark, a, warm_dir)
    extend_index(spark, b, warm_dir,
                 cfg=EngineConfig(pagerank_warm_start=True))
    build_index(spark, u, cold_dir)

    pw = {r["doc_id"]: r["score"]
          for r in spark.read.parquet(f"{warm_dir}/prior").collect()}
    pc = {r["doc_id"]: r["score"]
          for r in spark.read.parquet(f"{cold_dir}/prior").collect()}
    assert set(pw) == set(pc)
    bound = 2 * PAGERANK_TOL / (1 - PAGERANK_DAMPING)
    assert sum(abs(pw[d] - pc[d]) for d in pc) < bound
    assert sum(pw.values()) == pytest.approx(1.0, abs=1e-6)

    # metrics record the warm start and the iteration collapse
    m = (
        spark.read.parquet(f"{warm_dir}/_metrics")
        .where("stage = 'prior'")
        .collect()
    )
    per_build: dict[str, dict[str, float]] = {}
    for r in m:
        per_build.setdefault(r["build_id"], {})[r["key"]] = r["value"]
    flags = sorted(v["warm_start"] for v in per_build.values())
    assert flags == [0.0, 1.0]  # base build cold, extend warm
    iters = {v["warm_start"]: v["pagerank_iters"] for v in per_build.values()}
    assert iters[1.0] < iters[0.0]


def test_extend_resumes_after_kill(spark, split_corpora):
    a, b, _, root = split_corpora
    ix = str(root / "ix_kill")
    build_index(spark, a, ix)
    with pytest.raises(RuntimeError, match="injected failure"):
        extend_index(spark, b, ix, fail_after_waves=1)
    s = extend_index(spark, b, ix)  # auto-detects the incomplete gen 1
    assert s["generation"] == 1
    assert s["partitions_skipped"] > 0  # first wave's partitions kept
    assert s["n_docs"] == 200


def test_build_with_zero_refs(spark, fixture_dir, tmp_path_factory):
    """A corpus with no import/include lines writes an empty refs dir;
    the build must still complete with an empty graph (regression:
    schema inference rejects a fileless partitioned dir)."""
    root = tmp_path_factory.mktemp("norefs")
    full = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    plain = full.withColumn(
        "content", F.regexp_replace("content", r"(?m)^(import|from|#include).*$", "x")
    ).limit(40)
    src = str(root / "corpus")
    plain.write.parquet(src)
    ix = str(root / "ix")
    s = build_index(spark, src, ix)
    assert s["n_docs"] == 40
    assert spark.read.parquet(f"{ix}/prior").count() == 0


def test_compact_merges_segments(spark, extended_and_full, fixture_queries):
    """After compaction the index is single-segment (gen 0 only) and
    queries answer identically — the re-encode reads stored postings,
    never content."""
    from search_engine_spark.plans.build import compact_index

    inc_dir, _ = extended_and_full
    eng_before = QueryEngine(spark, inc_dir)
    before = {q: [(r["doc_id"], r["score"])
                  for r in eng_before.bm25(q, k=10).collect()]
              for q in fixture_queries[:4]}
    s = compact_index(spark, inc_dir)
    assert s["n_docs"] == 200
    gens = {r["gen"] for r in
            spark.read.parquet(f"{inc_dir}/blocks").select("gen").distinct().collect()}
    assert gens == {0}
    eng = QueryEngine(spark, inc_dir)
    for q, exp in before.items():
        got = [(r["doc_id"], r["score"]) for r in eng.bm25(q, k=10).collect()]
        assert [g[0] for g in got] == [e[0] for e in exp], q
        for g, e in zip(got, exp):
            assert g[1] == pytest.approx(e[1], rel=REL_TOL)


def test_maybe_compact_policy(spark, split_corpora, extended_and_full):
    """maybe_compact is the tiered-merge trigger: a no-op below the
    segment/tombstone thresholds, a full compact_index above — and the
    compact catches up a deferred-prior extend (stale prior must not
    survive a merge)."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.build import delete_docs, maybe_compact

    a, b, u, root = split_corpora
    _, full_dir = extended_and_full
    ix = str(root / "ix_policy")
    build_index(spark, a, ix)
    extend_index(spark, b, ix, cfg=EngineConfig(prior_refresh="defer"))
    prior_stale = {r["doc_id"] for r in spark.read.parquet(f"{ix}/prior")
                   .select("doc_id").collect()}

    # 2 segments, 0 tombstones: within both thresholds -> no-op
    assert maybe_compact(spark, ix, max_generations=2) is None
    # over the segment threshold -> merges AND refreshes the prior
    s = maybe_compact(spark, ix, max_generations=1)
    assert s is not None and s["n_docs"] == 200
    gens = {r["gen"] for r in spark.read.parquet(f"{ix}/blocks")
            .select("gen").distinct().collect()}
    assert gens == {0}
    pi = {r["doc_id"]: r["score"]
          for r in spark.read.parquet(f"{ix}/prior").collect()}
    pf = {r["doc_id"]: r["score"]
          for r in spark.read.parquet(f"{full_dir}/prior").collect()}
    assert set(pi) == set(pf) != prior_stale  # caught up past the defer
    assert sum(abs(pi[d] - pf[d]) for d in pf) < 1e-6

    # tombstone-fraction trigger: 2/200 = 1% -> quiet at 20%, fires at 0%
    delete_docs(spark, ix, sorted(pi)[:2])
    assert maybe_compact(spark, ix, max_generations=1) is None
    s = maybe_compact(spark, ix, max_generations=1, max_tombstone_frac=0.0)
    assert s is not None and s["docs_deleted"] == 2 and s["n_docs"] == 198


def test_delete_then_compact(spark, fixture_dir, tmp_path_factory, fixture_queries):
    """Tombstoned docs vanish from every result path immediately;
    compaction physically drops them and the index becomes identical
    to a fresh build over the filtered corpus (stats, terms, prior,
    top-k)."""
    from search_engine_spark.plans.build import compact_index, delete_docs

    root = tmp_path_factory.mktemp("delete")
    src = str(fixture_dir / "corpus.parquet")
    ix, ix_ref = str(root / "ix"), str(root / "ix_ref")
    build_index(spark, src, ix)
    eng0 = QueryEngine(spark, ix)
    q = fixture_queries[0]
    top = eng0.bm25(q, k=5).collect()
    victims = [top[0]["doc_id"], top[2]["doc_id"]]
    victim_paths = {r["path"] for r in top if r["doc_id"] in victims}
    assert delete_docs(spark, ix, victims) == 2

    eng = QueryEngine(spark, ix)  # reload: tombstones read at init
    hits0 = eng.total_hits(q)
    for wand in (True, False):
        got = {r["doc_id"] for r in eng.bm25(q, k=5, wand=wand).collect()}
        assert not (got & set(victims)), wand
        assert len(got) == 5  # replacements fill the freed slots
    assert {r["doc_id"] for r in eng.search(q, k=5).collect()}.isdisjoint(victims)
    batch = eng.bm25_batch({"q0": q}, k=5).collect()
    assert {r["doc_id"] for r in batch}.isdisjoint(victims)

    s = compact_index(spark, ix)
    assert s["docs_deleted"] == 2
    assert s["n_docs"] == 198

    # reference: fresh build over the corpus minus the victims
    full = spark.read.parquet(src)
    full.where(~F.col("path").isin(list(victim_paths))).write.parquet(
        str(root / "filtered")
    )
    build_index(spark, str(root / "filtered"), ix_ref)

    si, sr = read_stats(spark, ix), read_stats(spark, ix_ref)
    assert si["n_docs"] == sr["n_docs"] == 198
    assert si["avgdl"] == pytest.approx(sr["avgdl"], rel=REL_TOL)
    ei, er = QueryEngine(spark, ix), QueryEngine(spark, ix_ref)
    assert ei.total_hits(q) == er.total_hits(q) == hits0
    for qq in fixture_queries[:4]:
        ri = ei.bm25(qq, k=10).collect()
        rr = er.bm25(qq, k=10).collect()
        assert [r["doc_id"] for r in ri] == [r["doc_id"] for r in rr], qq
        for a_, b_ in zip(ri, rr):
            assert a_["score"] == pytest.approx(b_["score"], rel=REL_TOL)
    pi = {r["doc_id"]: r["score"]
          for r in spark.read.parquet(f"{ix}/prior").collect()}
    pr = {r["doc_id"]: r["score"]
          for r in spark.read.parquet(f"{ix_ref}/prior").collect()}
    assert set(pi) == set(pr)
    assert sum(abs(pi[d] - pr[d]) for d in pr) < 1e-6


def test_delete_by_query(spark, fixture_dir, tmp_path_factory):
    """ES delete_by_query: matching_ids finds exactly the live docs
    containing >= min_match query terms; feeding it to delete_docs
    tombstones them all, after which the same query has no hits and
    unrelated queries keep theirs."""
    from search_engine_spark.plans.build import build_index, delete_docs
    from search_engine_spark.plans.query import QueryEngine

    root = tmp_path_factory.mktemp("delbyq")
    ix = str(root / "ix")
    build_index(spark, str(fixture_dir / "corpus.parquet"), ix)
    eng = QueryEngine(spark, ix)

    corpus = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    from search_engine_spark.sources.corpus import with_identity
    from search_engine_spark.functions.tokenize import tokenize_tf

    rows = with_identity(corpus).select("doc_id", "content").collect()
    has = lambda r, t: t in tokenize_tf(r["content"])  # noqa: E731
    want_any = {r["doc_id"] for r in rows
                if has(r, "binary") or has(r, "tree")}
    want_both = {r["doc_id"] for r in rows
                 if has(r, "binary") and has(r, "tree")}
    got_any = {r["doc_id"] for r in eng.matching_ids("binary tree").collect()}
    got_both = {
        r["doc_id"]
        for r in eng.matching_ids("binary tree", min_match=2).collect()
    }
    assert got_any == want_any and got_both == want_both
    assert got_both < got_any

    n = delete_docs(spark, ix, eng.matching_ids("binary tree", min_match=2))
    assert n == len(want_both)
    eng2 = QueryEngine(spark, ix)  # re-read tombstones
    left = {r["doc_id"] for r in eng2.bm25("binary tree", k=500).collect()}
    assert left == want_any - want_both  # conj matches gone, rest alive
    assert eng2.matching_ids("binary tree", min_match=2).collect() == []
    # empty-token query deletes nothing
    assert eng2.matching_ids("123 ,,,").collect() == []

"""Semantic invariants for the continuation-session ops (the parity
mirror in test_ops_parity already pins them value-identical to DuckDB;
these pin the *meaning*)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import hybrid, relational, search_sql, similarity

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_transition_counts_conserve_events(spark):
    events = _t(spark, "events")
    out = relational.event_transitions(events).collect()
    # every adjacent pair of a user's sequence is counted exactly once:
    # Σ transitions = Σ_users (n_events − 1)
    per_user = events.groupBy("user_id").count().collect()
    want = sum(r["count"] - 1 for r in per_user)
    assert sum(r["n_transitions"] for r in out) == want
    # per-source probabilities are a truncating partition of 10^6
    by_src = {}
    for r in out:
        by_src.setdefault(r["event_type"], []).append(r["prob_e6"])
    for probs in by_src.values():
        assert sum(probs) <= 1_000_000
        assert sum(probs) > 1_000_000 - len(probs)  # floor loss < 1 each


def test_wau_bounds(spark):
    out = relational.active_users_rolling(_t(spark, "events")).collect()
    users_total = _t(spark, "events").select("user_id").distinct().count()
    for r in out:
        assert r["dau"] <= r["wau"] <= users_total


def test_anomaly_zscores_center(spark):
    out = relational.daily_anomalies(_t(spark, "events")).collect()
    # z-scores of each type sum to ~0 (exact numerator sum IS 0:
    # Σ(n·cnt − S1) = n·S1 − n·S1; only rounding loss remains)
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r["z_e4"])
    for zs in by_type.values():
        assert abs(sum(zs)) <= len(zs)  # ≤ half-ulp of rounding per day


def test_decay_grace_period_is_identity(spark):
    docs = _t(spark, "documents")
    plain = {
        r["doc_id"]: r["score"]
        for r in search_sql.bm25_scores(
            spark, docs, search_sql.QUERY_MAIN
        ).collect()
    }
    decayed = search_sql.bm25_topk_decay(spark, docs, k=500).collect()
    assert len(decayed) > 0
    for r in decayed:
        if r["age_days"] <= search_sql.DECAY_OFFSET_D:
            assert r["score"] == plain[r["doc_id"]]
        else:
            assert r["score"] <= plain[r["doc_id"]]
            want = plain[r["doc_id"]] * math.exp(
                math.log(search_sql.DECAY_RATE)
                * (r["age_days"] - search_sql.DECAY_OFFSET_D)
                / search_sql.DECAY_SCALE_D
            )
            assert abs(r["score"] - want) < 1e-4


def test_rrf_fused_set_and_order(spark):
    docs, emb = _t(spark, "documents"), _t(spark, "embeddings")
    out = hybrid.hybrid_rrf_topk(spark, docs, emb).collect()
    assert len(out) == hybrid.RRF_TOPK
    for r in out:
        # every fused row came from at least one leg, and the score is
        # exactly the integer contract
        assert r["lex_rank"] > 0 or r["vec_rank"] > 0
        want = 0
        if r["lex_rank"]:
            want += 1_000_000 // (hybrid.RRF_K + r["lex_rank"])
        if r["vec_rank"]:
            want += 1_000_000 // (hybrid.RRF_K + r["vec_rank"])
        assert r["rrf_e6"] == want
    # both-leg docs with rank sums dominating must outrank single-leg
    scores = [r["rrf_e6"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_filtered_knn_respects_filter_and_prefilter_semantics(spark):
    emb = _t(spark, "embeddings")
    out = similarity.filtered_cosine_topk(emb).collect()
    qlabel = {
        r["vec_id"]: r["label"]
        for r in emb.where(F.col("vec_id") < similarity.N_QUERIES).collect()
    }
    unfiltered = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb).collect()
    }
    per_q = {}
    for r in out:
        assert r["label"] == qlabel[r["query_id"]]  # filter holds
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        # pre-filter semantics: a full k from the allowed set, even
        # where post-filtering the plain top-k would starve
        assert len(rows) == similarity.TOPK
        post = sum((qid, r["vec_id"]) in unfiltered for r in rows)
        assert post < similarity.TOPK  # the two semantics differ here


def test_composite_agg_pages_tile(spark):
    docs = _t(spark, "documents")
    p1 = search_sql.composite_agg(spark, docs, after=None, size=1000).collect()
    all_keys = [(r["lang"], r["source"]) for r in p1]
    assert all_keys == sorted(all_keys)
    # paging strictly after a cursor = the suffix of the full key order
    cur = search_sql.COMPOSITE_AFTER
    page = search_sql.composite_agg(spark, docs).collect()
    want = [k for k in all_keys if k > cur][: search_sql.COMPOSITE_SIZE]
    assert [(r["lang"], r["source"]) for r in page] == want

"""Sampling-op invariants beyond the DuckDB parity gate: determinism,
threshold nesting, exact quotas, mixture proportions."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from search_engine_spark.ops import sampling  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bernoulli_deterministic_and_nested(spark):
    """Reruns agree exactly, and a lower rate draws a SUBSET of a higher
    rate (hash-threshold nesting — the property that makes ablation
    subsets consistent: the 10% sample is inside the 25% sample)."""
    docs = _docs(spark)
    a = {r["doc_id"] for r in sampling.bernoulli_sample(docs, 250_000).collect()}
    b = {r["doc_id"] for r in sampling.bernoulli_sample(docs, 250_000).collect()}
    assert a == b
    small = {r["doc_id"] for r in sampling.bernoulli_sample(docs, 100_000).collect()}
    assert small <= a
    n = docs.count()
    # binomial tolerance: ±5 sigma around p=0.25
    sigma = (n * 0.25 * 0.75) ** 0.5
    assert abs(len(a) - 0.25 * n) <= 5 * sigma + 1


def test_stratified_quota_exact_per_group(spark):
    docs = _docs(spark)
    group_sizes = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()
    }
    out = sampling.stratified_quota(docs, quota=10).collect()
    per_lang: dict[str, int] = {}
    for r in out:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert 1 <= r["rk"] <= 10
    for lang, size in group_sizes.items():
        assert per_lang.get(lang, 0) == min(10, size)


def test_mixture_hits_target_proportions(spark):
    docs = _docs(spark)
    out = sampling.mixture_sample(docs).collect()
    n_total = docs.count()
    budget = n_total * sampling.MIXTURE_BUDGET_PCT / 100
    got = {}
    for r in out:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert set(got) <= set(sampling.MIXTURE_WEIGHTS)
    tw = sum(sampling.MIXTURE_WEIGHTS.values())
    group_sizes = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()
    }
    for lang, wt in sampling.MIXTURE_WEIGHTS.items():
        target = min(group_sizes.get(lang, 0), wt / tw * budget)
        if target < 8:  # too small for a statistical bound
            continue
        sigma = (target * (1 - target / group_sizes[lang])) ** 0.5
        assert abs(got.get(lang, 0) - target) <= 5 * sigma + 2, (
            f"{lang}: got {got.get(lang, 0)}, target {target:.1f}"
        )


def test_mixture_is_subset_of_corpus_and_deterministic(spark):
    docs = _docs(spark)
    a = sorted(r["doc_id"] for r in sampling.mixture_sample(docs).collect())
    b = sorted(r["doc_id"] for r in sampling.mixture_sample(docs).collect())
    assert a == b
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(a) <= all_ids


def _py_strat_rank(rows):
    """Single-threaded reference: global per-lang rank by (bucket, doc_id)."""
    by_lang: dict[str, list] = {}
    for doc_id, lang, bucket in rows:
        by_lang.setdefault(lang, []).append((bucket, doc_id))
    rk = {}
    for lang, lst in by_lang.items():
        for i, (_, doc_id) in enumerate(sorted(lst), start=1):
            rk[doc_id] = (lang, i, len(lst))
    return rk


def test_two_phase_rank_matches_single_window_on_skew(spark):
    """VERDICT r02 item 5: 90%-one-lang fixture — the distributed
    two-phase rank must equal the sequential per-stratum rank exactly,
    and the plan must not contain a per-stratum global window (no
    `PARTITION BY lang` over the full table)."""
    from pyspark.sql import functions as F

    docs = _docs(spark).withColumn(
        "lang",
        F.when(F.col("doc_id") % 10 != 0, F.lit("en")).otherwise(F.col("lang")),
    )
    ranked = sampling._stratified_rank(docs)
    rows = [
        (r["doc_id"], r["lang"], r["bucket"])
        for r in docs.select(
            "doc_id", "lang",
            sampling.sample_bucket(F.col("doc_id")).alias("bucket"),
        ).collect()
    ]
    want = _py_strat_rank(rows)
    got = ranked.collect()
    assert len(got) == len(want)
    for r in got:
        lang, rk, n = want[r["doc_id"]]
        assert (r["lang"], r["rk"], r["n"]) == (lang, rk, n), r["doc_id"]
    # plan audit: the big-table rank window (the one sorting by bucket)
    # must partition by (lang, pid) — never lang alone, so a dominant
    # stratum can't serialize into one task. The lang-only windows over
    # the tiny (lang, pid) counts table are allowed.
    import re

    plan = ranked._jdf.queryExecution().executedPlan().toString()
    big_specs = [
        m.group(0)
        for m in re.finditer(r"windowspecdefinition\([^)]*", plan)
        if "bucket#" in m.group(0)
    ]
    assert big_specs, "expected a rank window ordered by bucket in the plan"
    for spec in big_specs:
        assert "pid#" in spec, spec


def test_stratified_quota_on_skewed_corpus(spark):
    from pyspark.sql import functions as F

    docs = _docs(spark).withColumn(
        "lang",
        F.when(F.col("doc_id") % 10 != 0, F.lit("en")).otherwise(F.col("lang")),
    )
    sizes = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    out = sampling.stratified_quota(docs, quota=7).collect()
    per_lang: dict[str, int] = {}
    for r in out:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    for lang, size in sizes.items():
        assert per_lang.get(lang, 0) == min(7, size)


def test_stratified_split_exact_quotas_and_stability(spark):
    docs = _docs(spark)
    out = sampling.stratified_split(docs).collect()
    n_by = {}
    for r in out:
        n_by.setdefault(r["lang"], {}).setdefault(r["split"], 0)
        n_by[r["lang"]][r["split"]] += 1
    sizes = {
        r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()
    }
    for lang, n in sizes.items():
        got = n_by[lang]
        want_train = (n * sampling.TRAIN_PCT) // 100
        want_val = (n * sampling.VAL_PCT) // 100
        assert got.get("train", 0) == want_train, lang
        assert got.get("val", 0) == want_val, lang
        assert got.get("test", 0) == n - want_train - want_val, lang
    # every doc appears exactly once, and the split is deterministic
    assert len(out) == sum(sizes.values())
    again = {(r["doc_id"], r["split"])
             for r in sampling.stratified_split(docs).collect()}
    assert {(r["doc_id"], r["split"]) for r in out} == again


def test_weighted_sample_matches_reference_keys(spark):
    """Efraimidis-Spirakis keys recomputed in pure Python (same md5
    bucket, same ln(u)/w, same rounding) must give the identical
    sample and order; heavy docs dominate the draw."""
    import hashlib
    import math

    import pytest

    from search_engine_spark.ops.sampling import (
        BUCKETS_E6,
        SEED,
        weighted_sample,
    )

    M31 = (1 << 31) - 1
    rows = []
    for i in range(200):
        w = 5000 if i < 20 else 10   # 20 heavy docs, 180 light
        rows.append((i, "en", "s", f"t{i}", w))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string, n_chars int"
    )

    def key(doc_id, w):
        h = int(hashlib.md5(f"{doc_id}:{SEED}".encode()).hexdigest()[:15], 16)
        bucket = (h % M31) % BUCKETS_E6
        u = (bucket + 1) / (BUCKETS_E6 + 1)
        return round(math.log(u) / (w + 1.0), 6)

    want = sorted(
        ((key(i, w), -i) for i, _, _, _, w in [(r[0], *r[1:]) for r in rows]),
        reverse=True,
    )[:30]
    want_ids = [-ni for _, ni in want]
    got = weighted_sample(docs, k=30).collect()
    assert [r["doc_id"] for r in got] == want_ids
    for r in got:
        assert r["es_key"] == pytest.approx(key(r["doc_id"], r["weight"]),
                                            abs=1e-9)
    # inclusion tracks weight: the 20 heavy docs (10% of rows, ~97% of
    # total weight) should dominate a 30-doc draw
    heavy = sum(1 for r in got if r["doc_id"] < 20)
    assert heavy >= 15

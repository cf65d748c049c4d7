"""Exact-substring span dedup (ops/spandedup.py): planted verbatim
spans must yield exact shared-gram counts and interval-merged coverage;
stop-grams (df > cap) must drop out. Oracle parity runs in
test_ops_parity (dedup_span_pairs / dedup_span_coverage)."""

from __future__ import annotations

from search_engine_spark.ops.spandedup import (
    dup_span_coverage,
    duplicate_span_pairs,
)

# 20 unique letter-only tokens (digits would be dropped by the frozen
# tokenizer's ^\p{L}+$ filter)
_TOKS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]
DOC_A = " ".join(_TOKS)             # 20 tokens
DOC_B = " ".join(_TOKS[4:16])       # verbatim copy of A[4:16), 12 tokens
DOC_C = "zulu yankee xray whiskey victor uniform tangoo sierraa echoo golfo"
DOC_D = "alpha bravo charlie"       # < 8 tokens: no grams


def _docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, DOC_C), (4, DOC_D)],
        "doc_id long, text string",
    )


def test_planted_span_pair_counts(spark):
    rows = duplicate_span_pairs(_docs(spark), n=8).collect()
    # the 12-token shared span contains 12-8+1 = 5 distinct 8-grams
    assert [(r.doc_a, r.doc_b, r.n_shared) for r in rows] == [(1, 2, 5)]


def test_coverage_merges_overlapping_grams(spark):
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.dup_frac_e6)
        for r in dup_span_coverage(_docs(spark), n=8).collect()
    }
    # A: dup grams start at 4..8, covering [4,15] = 12 of 20 tokens —
    # the 5 overlapping intervals merge to ONE span, not 5*8 tokens
    assert got[1] == (20, 12, 600000)
    # B: entirely covered (grams at 0..4 cover [0,11])
    assert got[2] == (12, 12, 1000000)
    # C unrelated, D too short: rows exist with zero coverage
    assert got[3] == (10, 0, 0)
    assert got[4] == (3, 0, 0)


def test_coverage_plans_one_gram_pass(spark):
    """VERDICT r02 item 6: the df leg and the probe leg of
    dup_span_coverage must share ONE gram inventory — the executed plan
    may contain exactly one n-gram explode (Generate/posexplode) and
    exactly one gh-keyed exchange feeding both windows."""
    df = dup_span_coverage(_docs(spark), n=8)
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString prints the final plan followed by the
    # initial plan — only the executed (final) section counts
    plan = plan.split("== Initial Plan ==")[0]
    n_gen = plan.count("Generate ")
    assert n_gen == 1, f"expected 1 gram explode, saw {n_gen}\n{plan}"
    n_gh_ex = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning(gh#" in line
    )
    assert n_gh_ex == 1, f"expected 1 gh exchange, saw {n_gh_ex}\n{plan}"


def test_stop_gram_cap_drops_boilerplate(spark):
    # the same doc 6 times: every gram has df=6 > cap=4 -> no pairs,
    # zero coverage (the license-header/boilerplate regime)
    docs = spark.createDataFrame(
        [(i, DOC_A) for i in range(1, 7)], "doc_id long, text string"
    )
    assert duplicate_span_pairs(docs, n=8, df_cap=4).collect() == []
    cov = dup_span_coverage(docs, n=8, df_cap=4).collect()
    assert all(r.n_dup_tokens == 0 for r in cov) and len(cov) == 6
    # raising the cap past df restores them: all 13 grams shared
    pairs = duplicate_span_pairs(docs, n=8, df_cap=6).collect()
    assert len(pairs) == 15 and all(r.n_shared == 13 for r in pairs)

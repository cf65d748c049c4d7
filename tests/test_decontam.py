"""Benchmark decontamination (ops/decontam.py): planted n-gram overlap
must be flagged with the exact distinct-hit count; clean and short docs
must not. Oracle parity runs in test_ops_parity (text_decontaminate)."""

from __future__ import annotations

from search_engine_spark.ops.decontam import contaminated_docs

EVAL_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
# copies tokens 1-8 of the eval doc (one 8-gram window, shifted)
DIRTY = "xx beta gamma delta epsilon zeta eta theta iota yy"
CLEAN = "one two three four five six seven eight nine ten"
SHORT = "alpha beta gamma"  # < 8 tokens: no n-grams at all


def test_planted_overlap_flagged(spark):
    docs = spark.createDataFrame(
        [
            (0, EVAL_TEXT),   # 0 % 31 == 0 -> eval
            (1, DIRTY),       # shares exactly one 8-gram with doc 0
            (2, CLEAN),
            (3, SHORT),
            (4, EVAL_TEXT),   # train doc that is a FULL copy of eval
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"]
           for r in contaminated_docs(docs, n=8).collect()}
    # DIRTY contains tokens beta..iota = one 8-gram, present in eval
    # (eval's window starting at 'beta'); the full copy shares all 3
    # of the eval doc's 8-grams
    assert got == {1: 1, 4: 3}


def test_no_eval_docs_no_flags(spark):
    docs = spark.createDataFrame(
        [(1, EVAL_TEXT), (2, EVAL_TEXT)], "doc_id long, text string"
    )
    # no doc_id % 31 == 0 -> empty eval set -> nothing contaminated
    assert contaminated_docs(docs, n=8).collect() == []


def test_dedup_survivor_picks_quality_over_id(spark):
    """Quality-aware survivor selection: the cleaner near-dup wins even
    with the LARGER doc_id (min-id would pick the noisy copy)."""
    from search_engine_spark.ops.dedup import dedup_survivors_by_quality

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    noisy = base + "!!! ??? !!! ??? !!! ??? !!! ??? !!! ???"  # punct-degraded
    docs = spark.createDataFrame(
        [
            (1, noisy),   # lower id, same token set, worse quality
            (2, base),    # should survive
            (3, "totally unrelated content words here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["cluster_id"]
            for r in dedup_survivors_by_quality(docs).collect()}
    assert set(rows) == {2, 3}      # doc 2 survives its cluster, not doc 1
    assert rows[2] == 1             # cluster id stays the min-id label

"""Count-Min-Sketch properties on a synthetic Zipf-ish corpus:
one-sided error (est ≥ true, always), the ε = 2N/w additive bound,
and exactness for counts that dominate their collision buckets."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import sketch
from search_engine_spark.ops.sqltwin import tokens_col


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic Zipf-ish corpus: term_i appears ~1000/i times
    # (letter-only terms — the frozen tokenizer drops \\P{L} tokens)
    def name(i: int) -> str:
        s = ""
        while True:
            s = chr(ord("a") + i % 26) + s
            i //= 26
            if i == 0:
                return "term" + s

    rows = []
    did = 0
    for i in range(1, 80):
        reps = max(1000 // i, 1)
        for s in range(0, reps, 10):
            chunk = " ".join([name(i)] * min(10, reps - s))
            rows.append((did, chunk))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cms_one_sided_and_bounded(spark, docs):
    got = {
        r["term"]: (r["exact_cnt"], r["cms_cnt"])
        for r in sketch.heavy_hitters_cms(docs, k=30).collect()
    }
    assert len(got) == 30
    n_tokens = docs.select(
        F.sum(F.size(tokens_col("text")))
    ).collect()[0][0]
    # P[est > true + 2N/w] ≤ 2^-d per term: with d=4, k=30 probes expect
    # ≤ ~2 violations of the soft bound; the hard 8N/w bound (P ≤ 8^-4
    # per term) must hold everywhere. One-sidedness is NOT probabilistic.
    soft, hard = (
        2 * n_tokens / sketch.CMS_WIDTH,
        8 * n_tokens / sketch.CMS_WIDTH,
    )
    violations = 0
    for term, (exact, est) in got.items():
        assert est >= exact, f"{term}: CMS underestimated ({est} < {exact})"
        assert est - exact <= hard, (
            f"{term}: overestimate {est - exact} exceeds 8N/w = {hard}"
        )
        violations += (est - exact) > soft
    assert violations <= 4, f"{violations}/30 terms exceed the 2N/w bound"
    # the hottest term dwarfs any collision partner → exact estimate
    assert got["termb"][1] == got["termb"][0] == 1000


def test_cms_matches_duckdb_twin(spark, docs):
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = con.execute(
        sketch.ORACLE_SQL["text_heavy_hitters_cms"]
    ).fetchall()
    got = [
        (r["term"], r["exact_cnt"], r["cms_cnt"])
        for r in sketch.heavy_hitters_cms(docs).collect()
    ]
    assert got == [tuple(w) for w in want]


# --------------------------------------------- bottom-k quantile sketch

from search_engine_spark.ops.sketch import (  # noqa: E402
    QSK_K,
    quantile_sketch_bottomk,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_bottomk_merge_identity(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    sketch-mergeability property that lets each partition keep only k
    rows. Verified through the full quantile output."""
    rows = [(i, "t", float((i * 37) % 101)) for i in range(2000)]
    a, b = rows[:1100], rows[1100:]
    k = 64

    def sketch_vals(df):
        r = quantile_sketch_bottomk(df, k=k).collect()[0]
        return (r.n_sample, r.q50, r.q90, r.q99)

    whole = sketch_vals(_events(spark, rows))
    # merge path: keep each half's bottom-k ROWS, union, re-sketch
    from search_engine_spark.ops.sketch import _qsk_hash
    from pyspark.sql import Window, functions as F

    def bottomk_rows(df):
        w = Window.partitionBy("event_type").orderBy(
            _qsk_hash(F.col("event_id")), "event_id"
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .drop("rn")
        )

    merged = bottomk_rows(_events(spark, a)).unionByName(
        bottomk_rows(_events(spark, b))
    )
    assert sketch_vals(merged) == whole


def test_bottomk_quantiles_near_exact(spark):
    """On a uniform 0..999 population the k=256 sample's quantile
    estimates must land within a few percentage points of truth
    (deterministic draw — this pins accuracy, not luck)."""
    rows = [(i, "t", float(i % 1000)) for i in range(10000)]
    r = quantile_sketch_bottomk(_events(spark, rows), k=QSK_K).collect()[0]
    assert r.n_sample == QSK_K
    for est, true_q in ((r.q50, 500), (r.q90, 900), (r.q99, 990)):
        assert abs(est - true_q) <= 60, (est, true_q)

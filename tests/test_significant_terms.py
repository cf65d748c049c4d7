"""Significant-terms aggregation (ES JLH): closed-form check on a
planted-signal corpus + invariants (query terms excluded, positive
lift only, deterministic order)."""

from __future__ import annotations

import pytest

from search_engine_spark.ops.search_sql import significant_terms

SCHEMA = "doc_id long, text string"

# fg query: "spark". Docs 1-3 match; "planted" rides along in all three
# foreground docs but only once in the 5-doc background beyond them —
# a strong JLH signal. "everywhere" is in every doc (zero lift —
# fg% == bg% — must be filtered). "bgonly" never co-occurs with spark.
ROWS = [
    (1, "spark planted alpha everywhere"),
    (2, "spark planted beta everywhere"),
    (3, "spark planted gamma everywhere"),
    (4, "bgonly delta everywhere planted"),
    (5, "bgonly epsilon everywhere"),
    (6, "bgonly zeta everywhere"),
]


def test_jlh_closed_form(spark):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    got = significant_terms(spark, docs, ["spark"], k=20).collect()
    by_term = {r["term"]: r for r in got}

    # query term excluded even though it tops both ratios
    assert "spark" not in by_term
    # zero-lift term filtered (fg% == bg% == 1.0)
    assert "everywhere" not in by_term
    # background-only terms can't appear (fg_df = 0 → no fg row)
    assert "bgonly" not in by_term

    # planted: fg% = 3/3, bg% = 4/6 → JLH = (1 - 2/3)·(1 / (2/3)) = 0.5
    p = by_term["planted"]
    assert (p["fg_df"], p["bg_df"]) == (3, 4)
    assert p["score"] == pytest.approx(0.5, abs=1e-9)

    # singletons alpha/beta/gamma: fg% = 1/3, bg% = 1/6 → JLH = 1/3
    for t in ("alpha", "beta", "gamma"):
        assert by_term[t]["score"] == pytest.approx(round(1 / 3, 6), abs=1e-9)

    # planted outranks the singletons; ties break term-asc
    terms = [r["term"] for r in got]
    assert terms[0] == "planted"
    assert terms[1:4] == ["alpha", "beta", "gamma"]


def test_oov_query_empty(spark):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    assert significant_terms(spark, docs, ["zzznotherezzz"]).count() == 0

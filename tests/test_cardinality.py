"""HyperLogLog properties: corrected-estimate accuracy against exact
truth across cardinality regimes, and register-table mergeability
(the property that makes the sketch a cluster op)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import cardinality
from search_engine_spark.ops.cardinality import HLL_M


def _corrected(est: int, n_zero: int) -> float:
    """The classic HLL small-range correction (linear counting), applied
    test-side because ln's libm rounding isn't engine-portable."""
    if est <= 2.5 * HLL_M and n_zero > 0:
        return HLL_M * math.log(HLL_M / n_zero)
    return float(est)


@pytest.fixture(scope="module")
def docs(spark):
    # three groups with known distinct vocabularies: ~40 (linear-counting
    # regime), ~800 (crossover), ~8000 (raw-HLL regime) unique terms
    def word(tag: str, i: int) -> str:
        s = ""
        while True:
            s = chr(ord("a") + i % 26) + s
            i //= 26
            if i == 0:
                return tag + s

    rows = []
    for tag, n in (("lo", 40), ("mid", 800), ("hi", 8000)):
        words = [word(tag, i) for i in range(n)]
        for start in range(0, n, 50):
            rows.append((tag, " ".join(words[start : start + 50] + words[:3])))
    return spark.createDataFrame(rows, "lang string, text string")


def test_hll_accuracy_all_regimes(spark, docs):
    got = {
        r["grp"]: r.asDict()
        for r in cardinality.distinct_tokens_hll(docs).collect()
    }
    assert set(got) == {"lo", "mid", "hi"}
    # 1.04/sqrt(256) = 6.5% standard error; allow 3 sigma ≈ 20%
    for grp, row in got.items():
        corrected = _corrected(row["hll_est"], row["n_zero_regs"])
        exact = row["exact_distinct"]
        rel_err = abs(corrected - exact) / exact
        assert rel_err < 0.20, (grp, exact, corrected, rel_err)


def test_hll_registers_merge_to_union(spark, docs):
    """max-merge of two corpora's register tables == registers of the
    union corpus — the mergeability contract partial aggregation and
    multi-segment indexes rely on."""
    a = docs.where(F.col("lang") != "hi")
    b = docs.where(F.col("lang") != "lo")  # overlaps a on "mid"
    union_regs = {
        (r["grp"], r["reg"]): r["M"]
        for r in cardinality.hll_registers(docs).collect()
    }
    merged: dict[tuple, int] = {}
    for part in (a, b):
        for r in cardinality.hll_registers(part).collect():
            k = (r["grp"], r["reg"])
            merged[k] = max(merged.get(k, 0), r["M"])
    assert merged == union_regs


def test_hll_register_bounds(spark, docs):
    regs = cardinality.hll_registers(docs).collect()
    assert all(0 <= r["reg"] < HLL_M for r in regs)
    assert all(1 <= r["M"] <= 53 for r in regs)

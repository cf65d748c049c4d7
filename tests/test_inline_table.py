"""functions/inline.py escaping is load-bearing (checkpoint + metrics
writes go through it): property-test that inline_table round-trips
arbitrary strings/ints/floats identically to createDataFrame."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.inline import inline_table

SCHEMA = "s string, i long, d double"

rows_st = st.lists(
    st.tuples(
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(st.none(), st.integers(-(2**62), 2**62)),
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, width=64),
        ),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st)
def test_inline_matches_createdataframe(spark, rows):
    got = inline_table(spark, rows, SCHEMA).collect()
    ref = spark.createDataFrame(rows, SCHEMA).collect()
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g["s"] == r["s"]
        assert g["i"] == r["i"]
        if r["d"] is not None and math.isinf(r["d"]):
            assert g["d"] == r["d"]
        elif r["d"] is None:
            assert g["d"] is None
        else:
            assert g["d"] == r["d"]


def test_inline_hostile_strings(spark):
    rows = [
        ("it's", 1, 1.0),
        ('say "hi"', 2, -0.0),
        ("back\\slash", 3, 1e308),
        ("new\nline\ttab", 4, 5e-324),
        ("unicode ✓ naïve 東京", 5, -1.5),
        ("", None, None),
    ]
    got = {r["s"]: (r["i"], r["d"]) for r in inline_table(spark, rows, SCHEMA).collect()}
    for s, i, d in rows:
        assert got[s] == (i, d)

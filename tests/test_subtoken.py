"""Identifier subtoken splitting (ops/subtoken.py): every boundary
class the Sourcegraph-style splitter must handle, plus a property that
no subtoken ever contains a boundary. Gate parity (vs the RE2 twin)
lives in test_ops_parity via code_subtokens / code_subtoken_search."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.ops.subtoken import subtokens_col

CASES = [
    ("parseHttpRequest", ["parse", "http", "request"]),
    ("snake_case_id", ["snake", "case", "id"]),
    ("HTTPServer", ["http", "server"]),
    ("HTTPServer2x", ["http", "server", "2", "x"]),
    ("utf8Decode", ["utf", "8", "decode"]),
    ("a-b.c", ["a", "b", "c"]),
    ("__dunder__", ["dunder"]),
    ("simple", ["simple"]),
    ("ALLCAPS", ["allcaps"]),
    ("x", ["x"]),
]


@pytest.fixture(scope="module")
def split(spark):
    def f(idents: list[str]) -> list[list[str]]:
        df = spark.createDataFrame([(i,) for i in idents], "ident string")
        return [r["s"] for r in df.select(subtokens_col("ident").alias("s")).collect()]
    return f


def test_boundary_classes(split):
    got = split([c[0] for c in CASES])
    for (ident, want), g in zip(CASES, got):
        assert g == want, ident


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.text(alphabet="abcXYZ09_-.", min_size=1, max_size=12), min_size=1,
    max_size=8,
))
def test_subtokens_never_contain_boundaries(spark, idents):
    df = spark.createDataFrame([(i,) for i in idents], "ident string")
    for r in df.select(subtokens_col("ident").alias("s")).collect():
        for t in r["s"]:
            assert t == t.lower() and t
            assert not any(ch in t for ch in "_-. ")
            # no letter|digit boundary survives inside a subtoken
            assert t.isdigit() or t.isalpha()

"""Edge cases pinned from the round-3 advisor notes:

- highlighter non-overlap holds even when the first anchor sits within
  ``FRAG_LEFT`` chars of text start (rendered-start suppression, not
  raw-anchor suppression);
- ``_percolate_not_sql`` degrades to the plain percolate SQL when no
  stored query carries exclusions (zero-row VALUES is a syntax error),
  matching the Spark twin exactly.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import search_sql
from search_engine_spark.ops.search_sql import (
    FRAG_LEFT,
    FRAG_LEN,
    _percolate_not_sql,
    bm25_topk_highlight,
    percolate_not,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_highlight_nonoverlap_at_clamp_edge(spark):
    """First anchor within FRAG_LEFT of text start: its rendered
    fragment clamps to [1, FRAG_LEN]. A second anchor at raw distance
    ≥ FRAG_LEN but rendered distance < FRAG_LEN must be SUPPRESSED —
    the pre-fix rule kept it and the fragments overlapped by up to
    FRAG_LEFT chars."""
    # anchor 1: 'alpha' at raw pos 1 -> rendered start 1 (clamped).
    # anchor 2: 'beta' at raw pos 70 -> old raw rule keeps it
    # (70 >= 1 + 60) but rendered start 50 < 1 + 60 -> overlap of
    # FRAG_LEFT-ish chars. New rule must SUPPRESS it.
    def text_with_beta_at(pos):  # 'alpha' at 1, 'beta' token at 1-indexed pos
        filler = "z" * (pos - 8) + " "  # chars 7..pos-1, space-terminated
        return "alpha " + filler + "beta " + "tail " * 20

    overlap_text = text_with_beta_at(70)
    assert overlap_text.index("beta") + 1 == 70
    docs = _docs(spark, [(1, overlap_text)])
    out = bm25_topk_highlight(spark, docs, ["alpha", "beta"], k=5).collect()
    assert len(out) == 1, f"clamp-edge anchor must be suppressed: {out}"
    assert out[0]["frag_start"] == 1

    # legitimate second anchor: 'beta' at raw 101 -> rendered 81 >= 61
    ok_text = text_with_beta_at(101)
    assert ok_text.index("beta") + 1 == 101
    out2 = bm25_topk_highlight(
        spark, _docs(spark, [(2, ok_text)]), ["alpha", "beta"], k=5
    ).collect()
    rows = sorted(out2, key=lambda r: r["frag_no"])
    assert len(rows) == 2
    rendered = [max(1, r["frag_start"] - FRAG_LEFT) for r in rows]
    for a, b in zip(rendered, rendered[1:]):
        assert b >= a + FRAG_LEN, f"overlapping fragments: starts {rendered}"


def test_highlight_dense_renumber(spark):
    """Fragment numbers stay dense (1..n) after suppression."""
    text = "alpha " + "z" * 30 + " beta " + "z" * 200
    docs = _docs(spark, [(7, text)])
    out = bm25_topk_highlight(spark, docs, ["alpha", "beta"], k=5).collect()
    nos = sorted(r["frag_no"] for r in out)
    assert nos == list(range(1, len(nos) + 1))


def test_percolate_not_sql_empty_neg(spark):
    """No stored query has exclusions: the SQL twin must be valid SQL
    and value-identical to the Spark twin (pre-fix it emitted
    'VALUES ' — a syntax error)."""
    queries = [
        ("q1", ["alpha", "beta"], True, []),
        ("q2", ["gamma"], False, []),
    ]
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha only here"),
        (3, "beta gamma words"),
    ]
    docs = _docs(spark, rows)
    got = sorted(
        tuple(r) for r in percolate_not(spark, docs, queries).collect()
    )
    sql = _percolate_not_sql(queries)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS v(doc_id, text)"
    )
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert got == want and got  # non-empty and identical

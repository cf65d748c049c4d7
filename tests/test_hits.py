"""HITS fixed-point (operators/hits.py): structural sanity on a hand
graph; bit-exactness vs the DuckDB chain-CTE twin is gate-checked in
test_ops_parity (graph_hits_5iter)."""

from __future__ import annotations

from search_engine_spark.operators.hits import E6, hits_fixed_e6


def test_star_graph_roles(spark):
    # 1 and 2 both point at 3; 3 points at 4
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {r["doc_id"]: (r["auth_e6"], r["hub_e6"])
           for r in hits_fixed_e6(edges).collect()}
    assert set(got) == {1, 2, 3, 4}
    # 3 is the dominant authority; 1 and 2 are symmetric hubs
    assert got[3][0] > got[4][0] >= 0
    assert got[1] == got[2]
    assert got[1][1] > got[3][1] >= 0
    # pure sources have no authority, pure sinks no hub score
    assert got[1][0] == 0 and got[2][0] == 0 and got[4][1] == 0
    # sum-normalization keeps scores on the E6 scale
    assert sum(v[0] for v in got.values()) <= E6
    assert sum(v[1] for v in got.values()) <= E6


def test_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert hits_fixed_e6(edges).collect() == []

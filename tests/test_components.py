"""Connected components (operators/components.py) + the dedup
clustering op built on it (ops/dedup.py::dedup_clusters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _cc_map(spark, edges, nodes=None, algo=connected_components, **kw):
    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = (
        spark.createDataFrame([(n,) for n in nodes], "id long")
        if nodes is not None else None
    )
    return {
        r["id"]: r["component"]
        for r in algo(edf, ndf, **kw).collect()
    }


def test_chain_and_separate_clusters(spark):
    """A 4-node chain needs label propagation across hops (the part a
    single groupBy can't do); a disjoint pair stays separate."""
    got = _cc_map(spark, [(2, 3), (3, 4), (4, 5), (10, 11)])
    assert got == {2: 2, 3: 2, 4: 2, 5: 2, 10: 10, 11: 10}


def test_isolated_nodes_are_singletons(spark):
    got = _cc_map(spark, [(1, 2)], nodes=[1, 2, 7, 8])
    assert got == {1: 1, 2: 1, 7: 7, 8: 8}


def test_direction_and_duplicates_are_irrelevant(spark):
    """Edges are undirected and multi-edges collapse: reversed and
    repeated pairs give the same components."""
    a = _cc_map(spark, [(5, 1), (1, 5), (5, 1), (9, 5)])
    assert a == {1: 1, 5: 1, 9: 1}


def test_long_chain_converges_within_cap(spark):
    """Diameter-8 chain: propagation takes several rounds but reaches
    the fixpoint well under the cap."""
    edges = [(i, i + 1) for i in range(20, 28)]
    got = _cc_map(spark, edges)
    assert set(got.values()) == {20}


def test_cap_raises_instead_of_returning_wrong_labels(spark):
    edges = [(i, i + 1) for i in range(40, 46)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_map(spark, edges, max_iters=2)


def test_star_matches_minlabel_on_mixed_graph(spark):
    """large/small-star and min-label propagation must agree exactly:
    cliques, chains, a lollipop, reversed/duplicate edges, isolated
    nodes."""
    edges = (
        [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]  # clique
        + [(i, i + 1) for i in range(200, 209)]                       # chain
        + [(300, 301), (301, 302), (302, 300), (302, 303)]            # lollipop
        + [(9, 5), (5, 9), (1, 5)]                                    # dup/rev
    )
    nodes = list(range(400, 404))
    a = _cc_map(spark, edges, nodes=nodes)
    b = _cc_map(spark, edges, nodes=nodes, algo=connected_components_star)
    assert a == b
    assert b[104] == 100 and b[208] == 200 and b[303] == 300 and b[9] == 1
    assert all(b[n] == n for n in nodes)


def test_star_log_convergence_on_long_chain(spark):
    """A 300-node chain (diameter 299) exceeds min-label's round budget
    by design; the star variant must finish inside a logarithmic cap —
    12 rounds for n=300 (observed ~6-9; min-label would need 299)."""
    edges = [(i, i + 1) for i in range(300)]
    got = _cc_map(
        spark, edges, algo=connected_components_star, max_iters=12
    )
    assert len(got) == 301
    assert set(got.values()) == {0}


def test_star_empty_and_singletons(spark):
    got = _cc_map(
        spark, [], nodes=[3, 4], algo=connected_components_star
    )
    assert got == {3: 3, 4: 4}


def test_dedup_clusters_on_planted_duplicates(spark):
    """Planted corpus: 3 byte-identical copies + 1 near-dup of the same
    base text must form ONE cluster keyed by the min doc_id; unrelated
    docs stay singletons. Survivor set = rows where doc_id ==
    cluster_id."""
    from search_engine_spark.ops.dedup import dedup_clusters

    # alphabetic-only tokens: the frozen tokenizer drops anything with
    # digits, so e.g. "token59" would vanish before shingling
    letters = "abcdefghijklmnopqrstuvwxyz"
    base = " ".join(
        f"token{letters[i % 26]}{letters[i // 26]} word{letters[i % 7]} "
        f"stable{letters[i % 3]}"
        for i in range(60)
    )
    near = base.replace("tokenhc", "changedhc")  # >0.8 shingle Jaccard
    rows = [
        (1, base), (2, base), (3, base), (4, near),
        (5, "completely different text about espresso machines and "
            "grinders with burrs and portafilters " * 4),
        (6, "another unrelated document on sailing knots and rigging "
            "and splices and halyards " * 4),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6}
    survivors = sorted(d for d, c in got.items() if d == c)
    assert survivors == [1, 5, 6]


def test_snippets_anchor_and_window(spark):
    """Snippet op: anchor is the earliest query-term occurrence in the
    lowered text and the window is radius-bounded; a doc matching only
    a later term anchors there."""
    from search_engine_spark.ops.search_sql import (
        SNIPPET_LEN, SNIPPET_RADIUS, bm25_topk_snippets,
    )

    pad = "xxxxx " * 30  # 180 chars of filler before the term
    rows = [
        (1, pad + "the Spark engine shuffles data"),
        (2, "join strategies differ: broadcast beats shuffle for dims"),
        (3, "window functions rank rows " + pad),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in bm25_topk_snippets(spark, docs, ["spark", "join", "window"]).collect()
    }
    assert set(out) == {1, 2, 3}
    low1 = rows[0][1].lower()
    assert out[1]["anchor"] == low1.find("spark") + 1
    assert out[1]["snippet"] == rows[0][1][
        out[1]["anchor"] - 1 - SNIPPET_RADIUS:
        out[1]["anchor"] - 1 - SNIPPET_RADIUS + SNIPPET_LEN
    ]
    assert out[2]["anchor"] == 1  # "join" at position 1
    assert out[2]["snippet"].startswith("join strategies")
    assert out[3]["anchor"] == 1  # "window" leads the doc
    assert len(out[3]["snippet"]) <= SNIPPET_LEN

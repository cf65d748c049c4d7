"""Triangle counting + clustering coefficient: hand-checked graph,
brute-force property identity, and input canonicalization."""

from __future__ import annotations

import itertools
import random

from search_engine_spark.operators.triangles import E6, triangle_stats


def _brute(edges: list[tuple[int, int]]) -> dict[int, tuple[int, int, int]]:
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = dict.fromkeys(adj, 0)
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    out = {}
    for n, nb in adj.items():
        d = len(nb)
        cc = (2 * E6 * tri[n]) // (d * (d - 1)) if d >= 2 else 0
        out[n] = (d, tri[n], cc)
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["degree"], r["triangles"], r["clustering_e6"])
        for r in triangle_stats(df).collect()
    }


def test_k4_plus_pendant(spark):
    # K4 (every node: deg 3, 3 triangles, cc = 1.0) + pendant node 9
    # hanging off node 0 (deg 1, no triangles; 0's cc drops to 3/6)
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    got = _run(spark, k4 + [(0, 9)])
    assert got[9] == (1, 0, 0)
    assert got[0] == (4, 3, (2 * E6 * 3) // (4 * 3))
    for n in (1, 2, 3):
        assert got[n] == (3, 3, E6)


def test_canonicalization(spark):
    # self-loops dropped; directed duplicates and multi-edges collapse
    # to one undirected edge — a plain triangle either way
    messy = [(1, 2), (2, 1), (2, 3), (2, 3), (3, 1), (1, 1), (2, 2)]
    got = _run(spark, messy)
    assert got == {n: (2, 1, E6) for n in (1, 2, 3)}


def test_matches_bruteforce_random(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = rng.randint(6, 14)
        pairs = list(itertools.combinations(range(n), 2))
        edges = [p for p in pairs if rng.random() < 0.45]
        if not edges:
            continue
        # throw in reversed duplicates to exercise canonicalization
        edges += [(b, a) for a, b in rng.sample(edges, len(edges) // 3)]
        assert _run(spark, edges) == _brute(edges)

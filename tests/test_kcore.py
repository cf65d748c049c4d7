"""k-core peeling: closed-form fixture, fixed-round ≡ fixpoint once
deep enough, and identity with a pure-Python peeler on random graphs."""

from __future__ import annotations

import itertools
import random

from search_engine_spark.operators.kcore import kcore, kcore_fixed


def _brute(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        drop = [n for n, nb in adj.items() if len(nb) < k]
        changed = bool(drop)
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(nb) for n, nb in adj.items()}


def _run(fn, spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["degree"] for r in fn(df, **kw).collect()}


def test_k4_with_tail(spark):
    k4 = list(itertools.combinations(range(4), 2))
    tail = [(3, 4), (4, 5), (5, 6)]
    want = {n: 3 for n in range(4)}
    assert _run(kcore, spark, k4 + tail, k=3) == want
    # fixed-round twin shape reaches the fixpoint at depth ≥ peel depth
    assert _run(kcore_fixed, spark, k4 + tail, k=3, rounds=4) == want


def test_cascade_peels_one_node_per_round(spark):
    # 2-core of a 4-cycle with a path tail: the tail peels strictly
    # outside-in (each node only drops after its outer neighbor went),
    # so shallow fixed-round peels hold partial survivors
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    tail = [(3, 4), (4, 5), (5, 6)]
    want = {n: 2 for n in range(4)}
    assert _run(kcore, spark, cyc + tail, k=2) == want
    shallow1 = _run(kcore_fixed, spark, cyc + tail, k=2, rounds=1)
    shallow2 = _run(kcore_fixed, spark, cyc + tail, k=2, rounds=2)
    assert set(shallow1) == set(want) | {4, 5}
    assert set(shallow2) == set(want) | {4}
    assert _run(kcore_fixed, spark, cyc + tail, k=2, rounds=3) == want


def test_empty_core(spark):
    # a tree has no 2-core
    edges = [(0, 1), (1, 2), (1, 3), (3, 4)]
    assert _run(kcore, spark, edges, k=2) == {}


def test_matches_bruteforce_random(spark):
    rng = random.Random(23)
    for _ in range(3):
        n = rng.randint(8, 16)
        edges = [
            p for p in itertools.combinations(range(n), 2)
            if rng.random() < 0.35
        ]
        if not edges:
            continue
        for k in (2, 3):
            want = _brute(edges, k)
            assert _run(kcore, spark, edges, k=k) == want
            assert _run(kcore_fixed, spark, edges, k=k, rounds=n) == want

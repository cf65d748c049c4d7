"""Multi-source BFS: closed-form fixtures + identity with a pure-Python
BFS on random graphs (the same adversarial strategy as test_kcore)."""

from __future__ import annotations

import collections
import random

from search_engine_spark.operators.bfs import bfs_hops


def _brute(edges: list[tuple[int, int]], seeds: list[int],
           max_hops: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in set(seeds)}
    q = collections.deque(sorted(set(seeds)))
    while q:
        n = q.popleft()
        if dist[n] == max_hops:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


def _run(spark, edges, seeds, max_hops):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["hops"]
        for r in bfs_hops(df, seeds=seeds, max_hops=max_hops).collect()
    }


def test_chain_and_fork(spark):
    # 0-1-2-3-4 chain plus a fork 2-9: hops are exact, radius clips
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 9)]
    assert _run(spark, edges, [0], 3) == {0: 0, 1: 1, 2: 2, 3: 3, 9: 3}
    assert _run(spark, edges, [0], 10) == {0: 0, 1: 1, 2: 2, 3: 3, 9: 3, 4: 4}


def test_multi_source_takes_min(spark):
    # seeds at both chain ends: middle node settles at the lower hop
    edges = [(i, i + 1) for i in range(6)]
    got = _run(spark, edges, [0, 6], 3)
    assert got == {0: 0, 6: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


def test_isolated_seed_and_unreachable(spark):
    # seed 99 touches no edge: appears at hop 0, reaches nothing;
    # the 7-8 component is unreachable and absent
    edges = [(0, 1), (7, 8)]
    assert _run(spark, edges, [0, 99], 2) == {0: 0, 99: 0, 1: 1}


def test_random_graphs_match_python_bfs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(80 + trial * 40)
        ]
        seeds = sorted(rng.sample(range(n), 3))
        for h in (1, 2, 3):
            assert _run(spark, edges, seeds, h) == _brute(edges, seeds, h)

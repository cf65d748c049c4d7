"""Synchronous fixed-iteration LPA: closed-form community structure +
identity with a pure-Python round simulator on random graphs."""

from __future__ import annotations

import itertools
import random

from search_engine_spark.operators.labelprop import lpa_fixed


def _simulate(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    adj = {n: sorted(set(nb)) for n, nb in adj.items()}
    lab = {n: n for n in adj}
    for _ in range(iters):
        nxt = {}
        for n, nb in adj.items():
            cnt: dict[int, int] = {}
            for m in nb:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            nxt[n] = min(
                (lb for lb in cnt if cnt[lb] == max(cnt.values())),
            )
        lab = nxt
    return lab


def _run(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: r["label"] for r in lpa_fixed(df, iters=iters).collect()}


def test_two_cliques_bridge(spark):
    # two K4s joined by one bridge edge: each clique converges to its
    # min id; the bridge can't flip either side (1 vote vs 3)
    c1 = list(itertools.combinations([0, 1, 2, 3], 2))
    c2 = list(itertools.combinations([10, 11, 12, 13], 2))
    got = _run(spark, c1 + c2 + [(3, 10)])
    assert {got[n] for n in (0, 1, 2, 3)} == {0}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}


def test_matches_simulator_random(spark):
    rng = random.Random(11)
    for _ in range(3):
        n = rng.randint(6, 16)
        edges = [
            p for p in itertools.combinations(range(n), 2)
            if rng.random() < 0.3
        ]
        if not edges:
            continue
        edges += [(b, a) for a, b in rng.sample(edges, len(edges) // 3)]
        for iters in (1, 3):
            assert _run(spark, edges, iters) == _simulate(edges, iters)

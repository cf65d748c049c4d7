"""MMR diversification: identity with a pure-Python greedy reference
and the diversity property on a planted two-cluster corpus."""

from __future__ import annotations

import math
import random

from search_engine_spark.ops.similarity import (
    MMR_DIV,
    MMR_LAMBDA,
    mmr_topk,
)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def _greedy(vecs: dict[int, list[float]], qid: int, k: int, pool: int):
    rel = {
        i: round(_cos(v, vecs[qid]), 4) for i, v in vecs.items() if i != qid
    }
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:pool]
    sims = {
        (a, b): round(_cos(vecs[a], vecs[b]), 4)
        for a in cand for b in cand if a != b
    }
    first = min(cand, key=lambda i: (-rel[i], i))
    sel = [(1, first, rel[first], round(MMR_LAMBDA * rel[first], 6))]
    chosen = {first}
    for r in range(2, k + 1):
        best = None
        for c in cand:
            if c in chosen:
                continue
            ms = max(sims[(c, s)] for s in chosen)
            sc = round(MMR_LAMBDA * rel[c] - MMR_DIV * ms, 6)
            key = (-sc, c)
            if best is None or key < best[0]:
                best = (key, c, sc)
        sel.append((r, best[1], rel[best[1]], best[2]))
        chosen.add(best[1])
    return sel


def _vecs_df(spark, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in sorted(vecs.items())]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_matches_python_greedy_random(spark):
    rng = random.Random(5)
    vecs = {
        i: [round(rng.uniform(-1, 1), 3) for _ in range(8)] for i in range(30)
    }
    # float32 storage: quantize the reference through float32 like the
    # table column does
    import numpy as np

    vecs = {i: np.array(v, dtype=np.float32).astype(float).tolist()
            for i, v in vecs.items()}
    got = [
        (r["rank"], r["vec_id"], r["rel"], r["mmr"])
        for r in mmr_topk(_vecs_df(spark, vecs), k=8, pool=15)
        .orderBy("rank").collect()
    ]
    assert got == _greedy(vecs, qid=0, k=8, pool=15)


def test_diversity_on_planted_clusters(spark):
    # two near-duplicate clusters, both at ~45° to the query but in
    # ORTHOGONAL planes (mutual sim ≈ 0.5, within-cluster sim ≈ 1):
    # equal relevance, so pure top-3 is all-A (smaller ids win ties);
    # MMR's second pick must jump clusters — with λ = 0.7 the dup
    # penalty is 0.3·1 vs the cross-cluster 0.3·0.5.
    vecs = {0: [1.0, 0.0, 0.0]}
    for i in range(1, 7):       # A: xy-plane, 45° from query
        vecs[i] = [1.0, 1.0 + i * 1e-3, 0.0]
    for i in range(7, 13):      # B: xz-plane, 45° from query
        vecs[i] = [1.0, 0.0, 1.0 + (i - 7) * 1e-3]
    got = mmr_topk(_vecs_df(spark, vecs), k=3, pool=12).collect()
    by_rank = {r["rank"]: r["vec_id"] for r in got}
    picked = set(by_rank.values())
    assert picked & set(range(1, 7)) and picked & set(range(7, 13)), (
        "MMR never escaped the near-duplicate cluster"
    )
    # and the cluster flip happens immediately at rank 2
    first_cluster = by_rank[1] < 7
    assert (by_rank[2] < 7) != first_cluster

"""k-core extraction over the link graph (Seidman, "Network structure
and minimum degree", Social Networks 1983; distributed peeling à la
Montresor et al., re-derived): the maximal subgraph where every node
has degree ≥ k. The k-core is the standard "dense backbone" cut — in
a web corpus, low-core nodes are leaf/orphan pages and high-core
regions are tightly interlinked hubs (or link farms, together with
the clustering signal from operators/triangles.py).

Algorithm: iterative peeling — repeatedly delete nodes whose CURRENT
degree is < k until a fixpoint; what survives is exactly the k-core
(deleting a node only ever lowers other degrees, so peeling order
doesn't matter — the fixpoint is unique). Two shapes:

- :func:`kcore` — peel to the fixpoint (a convergence loop, rounds ≤
  the graph's degeneracy ordering depth; each round one degree
  aggregation + one semi-join, per-round ``localCheckpoint`` lineage
  truncation like components.py). The production shape.
- :func:`kcore_fixed` — the same peel for a FIXED number of rounds,
  emitting each survivor with its in-subgraph degree. Deterministic
  chain of pure per-round functions → a DuckDB chain-CTE twin
  reproduces it bit-exactly; with rounds ≥ the peel depth it equals
  the fixpoint (asserted in tests on the gate fixture).

Scale shape (100 TB): a round is one (node)-keyed count with map-side
partial combine over the live edge set plus two semi-joins to drop
edges touching peeled nodes — no windows, no driver-side node sets;
the live edge set only shrinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KCORE_K = 3
KCORE_ROUNDS = 4
MAX_PEEL_ROUNDS = 200


def _sym(edges: DataFrame) -> DataFrame:
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").cast("long").alias("u"),
                F.greatest("src", "dst").cast("long").alias("v"))
        .distinct()
    )
    return und.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
        und.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )


def _peel_once(live: DataFrame, k: int) -> DataFrame:
    deg = live.groupBy("a").agg(F.count("*").alias("deg"))
    keep = deg.where(F.col("deg") >= k).select("a")
    return (
        live.join(keep, "a", "left_semi")
        .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
        .select("a", "b")
    )


def kcore_fixed(edges: DataFrame, k: int = KCORE_K,
                rounds: int = KCORE_ROUNDS) -> DataFrame:
    """``rounds`` synchronous peel rounds → (node, degree) of the
    surviving subgraph (the exact k-core once rounds ≥ peel depth)."""
    live = _sym(edges).localCheckpoint()
    for _ in range(rounds):
        live = _peel_once(live, k).localCheckpoint()
    return live.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )


def kcore(edges: DataFrame, k: int = KCORE_K,
          max_rounds: int = MAX_PEEL_ROUNDS) -> DataFrame:
    """Peel to the fixpoint → (node, degree) of the exact k-core.
    One bounded driver scalar per round (the live-edge count, used
    only for convergence detection — the standard iterative-algorithm
    sync, cf. pagerank's residual)."""
    live = _sym(edges).localCheckpoint()
    n = live.count()
    for _ in range(max_rounds):
        if n == 0:
            break
        live = _peel_once(live, k).localCheckpoint()
        m = live.count()
        if m == n:
            break
        n = m
    else:
        raise RuntimeError(f"k-core did not converge in {max_rounds} rounds")
    return live.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )


def oracle_sql_kcore(edges_sql: str, k: int = KCORE_K,
                     rounds: int = KCORE_ROUNDS) -> str:
    """DuckDB twin of :func:`kcore_fixed`: one peel CTE per round."""
    ctes = [
        f"raw AS ({edges_sql})",
        """und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM raw WHERE src <> dst
)""",
        """e0 AS (
  SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und
)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""k{i} AS (
  SELECT a FROM e{i} GROUP BY a HAVING count(*) >= {k}
)"""
        )
        ctes.append(
            f"""e{i + 1} AS (
  SELECT e.a, e.b FROM e{i} e
  WHERE e.a IN (SELECT a FROM k{i}) AND e.b IN (SELECT a FROM k{i})
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
FROM e{rounds} GROUP BY a"""
    )

"""Multi-source BFS hop distances (shortest unweighted paths).

The classic frontier-expansion iteration (Pregel's introductory
example, Malewicz et al. SIGMOD'10): ``dist`` starts at the seed set
with hop 0; each round joins the newest frontier to the edge list,
anti-joins nodes already settled, and tags survivors with the round
number. Because BFS settles a node the first time it is reached, a
fixed ``max_hops`` prefix of the fixpoint is exact for every node
within that radius — which is what the gate checks, chain-CTE style,
one CTE per round (the same fixed-iteration twin strategy as
``operators/pagerank.py`` / ``labelprop.py``).

Beyond the reference's operator set (its link graph stops at PageRank —
`services/ranking/src/main.py`); included because hop-radius queries
(crawl-depth audits, link-neighborhood extraction) are standard on a
web link graph.

Scale shape (100 TB): per round ONE edge-keyed shuffle join (frontier ⋈
edges) + one anti-join against the settled set — frontier-sized, not
graph-sized, left sides. ``localCheckpoint`` pins each round so the
plan never re-derives round i−1 (the rel_funnel pattern). Rounds are
bounded by ``max_hops``, not diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BFS_SEEDS = [0, 1024, 2048, 3072]
BFS_MAX_HOPS = 3


def _undirected(edges: DataFrame) -> DataFrame:
    """Canonicalize raw (src, dst) pairs to a distinct, loop-free,
    symmetric edge relation."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    return (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def bfs_hops(
    edges: DataFrame,
    seeds: list[int] | None = None,
    max_hops: int = BFS_MAX_HOPS,
) -> DataFrame:
    """(node, hops): minimum edge count from ANY seed, for every node
    within ``max_hops`` of the seed set (unreached nodes absent —
    callers wanting a dense surface left-join this onto the node set).
    Seeds not present in the edge relation still appear at hop 0,
    like an isolated-source BFS."""
    seeds = BFS_SEEDS if seeds is None else seeds
    spark = edges.sparkSession
    e = _undirected(edges).localCheckpoint(eager=False)
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sorted(set(seeds))], "node long, hops int"
    )
    frontier = dist.select("node")
    for i in range(1, max_hops + 1):
        reached = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            reached.join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(i))
            .localCheckpoint(eager=False)
        )
        dist = dist.unionByName(new)
        frontier = new.select("node")
    return dist.select("node", "hops")


def oracle_sql_bfs(
    edges_sql: str,
    seeds: list[int] | None = None,
    max_hops: int = BFS_MAX_HOPS,
) -> str:
    """Chain-CTE DuckDB twin: one frontier CTE per round, settled set
    accumulated by UNION ALL + NOT EXISTS — a literal transcription of
    the round structure, so a Spark-side frontier bug cannot hide."""
    seeds = BFS_SEEDS if seeds is None else seeds
    vals = ", ".join(f"({int(s)})" for s in sorted(set(seeds)))
    parts = [
        f"WITH e0 AS ({edges_sql})",
        """e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM e0
    UNION ALL
    SELECT CAST(dst AS BIGINT) AS src, CAST(src AS BIGINT) AS dst FROM e0
  ) WHERE src <> dst
)""",
        f"d0(node, hops) AS (SELECT * FROM (VALUES {vals}) s(node), (SELECT 0) h(hops))",
    ]
    for i in range(1, max_hops + 1):
        parts.append(
            f"""f{i} AS (
  SELECT DISTINCT e.dst AS node
  FROM e JOIN d{i - 1} d ON e.src = d.node AND d.hops = {i - 1}
  WHERE NOT EXISTS (SELECT 1 FROM d{i - 1} p WHERE p.node = e.dst)
)""",
        )
        parts.append(
            f"d{i} AS (SELECT node, hops FROM d{i - 1} "
            f"UNION ALL SELECT node, {i} FROM f{i})"
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT CAST(node AS BIGINT) AS node, CAST(hops AS INTEGER) AS hops "
        f"FROM d{max_hops}"
    )

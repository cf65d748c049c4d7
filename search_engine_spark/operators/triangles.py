"""Per-node triangle counting + local clustering coefficient over the
link graph — the classic graph-health / community-structure signal a
training-data pipeline computes over its reference graph (spam rings
and boilerplate link farms show up as near-clique neighborhoods, i.e.
clustering coefficients far above the corpus mode).

Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW'11 —
re-derived from the paper). Each undirected edge {u, v} is oriented
from the endpoint with the smaller ``(degree, id)`` key to the larger,
turning the graph into a DAG where every node's out-degree is
O(sqrt(|E|)). Wedges are then the self-join of the oriented edge set
on its source, and a wedge (a→b, a→c) closes into a triangle iff the
oriented edge b→c exists (orientation is a total order, so the closing
edge can only be stored in that direction).

100 TB posture — why this survives the "last reducer":

- the naive wedge join keys on the *center* node of each path, so one
  celebrity node (degree d) alone yields d²/2 wedge rows in a single
  task; with orientation the join keys on the *lower-ranked* endpoint
  and the per-key fan-out is bounded by the out-degree cap, giving
  Σ out_deg² ≤ O(|E|^1.5) total wedges spread evenly across keys;
- every stage is a key-partitioned DataFrame op: two node-keyed joins
  to attach degrees, one src-keyed self-join (SortMergeJoin — the
  wedge set is corpus-sized, correctly a shuffle join), one (src, dst)
  equi-join to close wedges, and node-keyed count aggregations with
  map-side partial combine;
- no driver materialization: the only scalars are none at all — the
  result stays distributed.

Reference provenance: the reference engine stores the backlink graph
(`services/spider/internal/repository/*` edge sink) but computes only
PageRank over it; triangle/clustering analytics are part of the
training-data-pipeline surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6 = 1_000_000


def triangle_stats(edges: DataFrame) -> DataFrame:
    """(src, dst) edge list (directed duplicates / self-loops allowed;
    canonicalized internally) → one row per node:

    (node, degree, triangles, clustering_e6) where ``triangles`` counts
    the triangles the node participates in and ``clustering_e6`` is the
    local clustering coefficient 2·tri/(deg·(deg−1)) in ×10^6 truncating
    integer fixed-point (0 for degree < 2) — the cross-engine-exact
    protocol (cf. ops/textstats.py quality scores)."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").cast("long").alias("u"),
            F.greatest("src", "dst").cast("long").alias("v"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
        # reused 2× (orientation join + final projection): node-sized,
        # persist rather than recompute the edge scan per reference
        # (cf. ops/dedup.py pair persist)
        .persist()
    )

    # orient each edge from the smaller (degree, id) key to the larger;
    # keep the HEAD's degree so the wedge join can order endpoints
    # without a third degree join
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("udeg"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("vdeg"))
    u_first = F.struct("udeg", "u") < F.struct("vdeg", "v")
    o = (
        und.join(du, "u").join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("vdeg")).otherwise(F.col("udeg")).alias("ddeg"),
        )
        # reused 3× (both wedge legs + the closing-edge probe): |E|
        # rows, 3 narrow long columns — persisting beats re-running the
        # canonicalize + two degree joins per reference
        .persist()
    )

    o1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                  F.col("ddeg").alias("bdeg"))
    o2 = o.select(F.col("src").alias("a2"), F.col("dst").alias("c"),
                  F.col("ddeg").alias("cdeg"))
    wedges = o1.join(
        o2,
        (F.col("a") == F.col("a2"))
        & (F.struct("bdeg", "b") < F.struct("cdeg", "c")),
    ).select("a", "b", "c")
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"])

    cnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    return (
        deg.join(cnt, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                # `div`: exact BIGINT division (a float `/` + cast could
                # truncate N−ε to N−1 where DuckDB's `//` yields N)
                F.expr(
                    f"({2 * E6}L * coalesce(triangles, 0L))"
                    " div (degree * (degree - 1))"
                ),
            ).otherwise(F.lit(0)).cast("long").alias("clustering_e6"),
        )
    )


def oracle_sql_triangles(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_stats` over ``edges_sql`` (a
    SELECT yielding src, dst) — same orientation, same joins, same
    truncating fixed-point."""
    return f"""
WITH edges AS ({edges_sql}),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node
),
o AS (
  SELECT CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.v ELSE e.u END AS dst,
         CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN dv.degree ELSE du.degree END AS ddeg
  FROM und e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
tri AS (
  SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
  FROM o o1
  JOIN o o2 ON o1.src = o2.src AND (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst)
  JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst
),
cnt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS triangles
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node
)
SELECT d.node, d.degree,
       CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles,
       CAST(CASE WHEN d.degree >= 2
            THEN ({2 * E6} * coalesce(c.triangles, 0))
                 // (d.degree * (d.degree - 1))
            ELSE 0 END AS BIGINT) AS clustering_e6
FROM deg d LEFT JOIN cnt c USING (node)
"""

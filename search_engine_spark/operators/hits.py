"""HITS (hubs & authorities, Kleinberg JACM'99) — the second classic
link-analysis ranker next to PageRank, as DataFrame algebra.

Per iteration: authority = inbound sum of hub scores, hub = outbound
sum of authority scores, each sum-normalized. Everything is ×10^6
integer fixed-point with truncating division, so the DuckDB chained-CTE
oracle reproduces it bit-for-bit (the same engine-exactness protocol as
``pagerank_fixed_e12``; E6 rather than E12 keeps ``raw·SCALE`` inside
int64: raw ≤ n·E6·n, so n²·E6·E6 must stay < 2^63 — fine to ~10^5
nodes, and the gate graph is 512).

Scale shape: each iteration is two edge-keyed joins + groupBys — the
same shuffle family as the PageRank mat-vec, with the two sum
normalizers as driver scalars (2 bounded collects/iteration, like the
dangling-mass collect in the PageRank reference port).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6 = 10**6
FIXED_ITERS = 5


def hits_fixed_e6(edges: DataFrame, iters: int = FIXED_ITERS) -> DataFrame:
    """(doc_id, auth_e6, hub_e6) after ``iters`` sum-normalized HITS
    iterations over (src, dst) edges; hubs start uniform at E6."""
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    if nodes.count() == 0:
        return spark.createDataFrame([], "doc_id long, auth_e6 long, hub_e6 long")

    hub = nodes.select("id", F.lit(E6).cast("long").alias("hub"))
    auth = nodes.select("id", F.lit(0).cast("long").alias("auth"))
    for _ in range(iters):
        araw = (
            edges.join(hub, edges.src == hub.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").cast("long").alias("raw"))
        )
        s = araw.agg(F.coalesce(F.sum("raw"), F.lit(0))).collect()[0][0]
        auth = nodes.join(araw, "id", "left").select(
            "id",
            (
                F.expr(f"(coalesce(raw, 0L) * {E6}L) div {max(int(s), 1)}L")
            ).cast("long").alias("auth"),
        )
        hraw = (
            edges.join(auth, edges.dst == auth.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").cast("long").alias("raw"))
        )
        t = hraw.agg(F.coalesce(F.sum("raw"), F.lit(0))).collect()[0][0]
        hub = nodes.join(hraw, "id", "left").select(
            "id",
            (
                F.expr(f"(coalesce(raw, 0L) * {E6}L) div {max(int(t), 1)}L")
            ).cast("long").alias("hub"),
        )
        # truncate lineage: 5 iterations × 4 joins nest otherwise
        auth = auth.localCheckpoint(eager=False)
        hub = hub.localCheckpoint(eager=False)
    out = (
        nodes.join(auth, "id", "left")
        .join(hub, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth_e6"),
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub_e6"),
        )
    )
    return out


def oracle_sql_hits_e6(edges_sql: str, iters: int = FIXED_ITERS) -> str:
    """DuckDB twin: one CTE pair per iteration over ``edges_sql``."""
    ctes = [
        f"edges AS MATERIALIZED ({edges_sql})",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
)""",
        f"h0 AS MATERIALIZED (SELECT id, CAST({E6} AS BIGINT) AS hub FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS id, CAST(sum(h.hub) AS BIGINT) AS raw
  FROM edges e JOIN h{i} h ON e.src = h.id GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""a{i + 1} AS MATERIALIZED (
  SELECT nd.id,
         CAST((coalesce(ar.raw, 0) * {E6})
              // greatest((SELECT coalesce(sum(raw), 0) FROM ar{i}), 1)
              AS BIGINT) AS auth
  FROM nodes nd LEFT JOIN ar{i} ar ON nd.id = ar.id
)"""
        )
        ctes.append(
            f"""hr{i} AS MATERIALIZED (
  SELECT e.src AS id, CAST(sum(a.auth) AS BIGINT) AS raw
  FROM edges e JOIN a{i + 1} a ON e.dst = a.id GROUP BY e.src
)"""
        )
        ctes.append(
            f"""h{i + 1} AS MATERIALIZED (
  SELECT nd.id,
         CAST((coalesce(hr.raw, 0) * {E6})
              // greatest((SELECT coalesce(sum(raw), 0) FROM hr{i}), 1)
              AS BIGINT) AS hub
  FROM nodes nd LEFT JOIN hr{i} hr ON nd.id = hr.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT nd.id AS doc_id,
       coalesce(a.auth, 0) AS auth_e6,
       coalesce(h.hub, 0) AS hub_e6
FROM nodes nd
LEFT JOIN a{iters} a ON nd.id = a.id
LEFT JOIN h{iters} h ON nd.id = h.id"""
    )

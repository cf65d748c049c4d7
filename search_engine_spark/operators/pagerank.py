"""DataFrame PageRank — the static link prior (frozen spec §8.3).

Math mined from the reference's NumPy/SciPy implementation
(`services/ranking/src/page_rank.py:33-86`): damping 0.85, uniform
teleport (or a personalization distribution, normalized to sum 1 —
`page_rank.py:57-63`), dangling mass redistributed along the teleport
vector, L1 tolerance 1e-5, max 100 iterations, node universe = distinct
edge endpoints.

Spark shape (SURVEY §2.3 J5): the sparse mat-vec is a join + groupBy
per iteration. The adjacency (edges pre-joined with out-degree) is
computed once and persisted; each iteration is one shuffle hash join on
``src`` + one hash aggregation on ``dst``. ``localCheckpoint`` every
iteration cuts the lineage chain so plan size stays O(1) in iterations
(at cluster scale: ``checkpoint()`` to reliable storage instead —
config detail, same call site).

Driver syncs: exactly ONE scalar collect per iteration — the L1
residual and the next iteration's dangling mass come out of the same
aggregation (join new-vs-old ranks once, sum both). A data-dependent
fixpoint can't do better, and the reference's loop syncs in-process
every iteration too.

``pagerank_fixed_e12`` is the oracle-gated twin: a fixed number of
iterations in ×10^12 fixed-point integer arithmetic (truncating
division), so a DuckDB chained-CTE oracle reproduces it bit-exactly —
no float summation-order hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import (
    PAGERANK_DAMPING,
    PAGERANK_MAX_ITERS,
    PAGERANK_TOL,
)


def _node_universe(edges: DataFrame, personalization: DataFrame | None) -> DataFrame:
    """Distinct endpoints with per-node teleport weight ``p`` (normalized)
    and a precomputed ``is_dangling`` flag (src never appears)."""
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    srcs = edges.select("src").distinct()
    nodes = nodes.join(srcs, nodes.id == srcs.src, "left").select(
        "id", F.col("src").isNull().alias("is_dangling")
    )
    if personalization is None:
        return nodes.withColumn("p", F.lit(None).cast("double"))
    # normalize like the reference: p = personalization / personalization.sum()
    total = personalization.agg(F.sum("weight")).collect()[0][0]
    pers = personalization.select(
        "id", (F.col("weight") / F.lit(float(total))).alias("p")
    )
    return nodes.drop("p").join(pers, "id", "left").select(
        "id", "is_dangling", F.coalesce("p", F.lit(0.0)).alias("p")
    )


def pagerank(
    edges: DataFrame,
    damping: float = PAGERANK_DAMPING,
    tol: float = PAGERANK_TOL,
    max_iters: int = PAGERANK_MAX_ITERS,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """edges (src, dst) [+ optional personalization (id, weight)] →
    prior (doc_id, score)."""
    spark = edges.sparkSession

    nodes = _node_universe(edges, personalization).persist()
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "doc_id long, score double")
    # uniform teleport unless personalized; p sums to 1 either way
    nodes_p = nodes.withColumn("p", F.coalesce(F.col("p"), F.lit(1.0 / n)))

    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    adj = edges.join(out_deg, "src").persist()
    adj.count()  # materialize once

    ranks = nodes_p.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    dmass = (
        nodes_p.where("is_dangling")
        .agg(F.coalesce(F.sum(F.lit(1.0 / n)), F.lit(0.0)))
        .collect()[0][0]
    )

    for _ in range(max_iters):
        contribs = (
            adj.join(ranks, adj.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes_p.join(contribs, "id", "left")
            .select(
                "id",
                "is_dangling",
                (
                    damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                    + (damping * dmass + (1.0 - damping)) * F.col("p")
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        # single driver sync: residual + next iteration's dangling mass
        resid, dmass = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "id")
            .agg(
                F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))),
                F.coalesce(
                    F.sum(F.when(F.col("n.is_dangling"), F.col("n.rank"))), F.lit(0.0)
                ),
            )
            .collect()[0]
        )
        ranks = new_ranks.select("id", "rank")
        if resid < tol:
            break

    nodes.unpersist()
    adj.unpersist()
    return ranks.select(F.col("id").alias("doc_id"), F.col("rank").alias("score"))


# ------------------------------------------------------- fixed-point twin

E12 = 10**12
FIXED_ITERS = 5


def pagerank_fixed_e12(
    edges: DataFrame, iters: int = FIXED_ITERS, damping_pct: int = 85
) -> DataFrame:
    """Fixed-iteration PageRank in ×10^12 integer fixed-point.

    Same recurrence as :func:`pagerank` with uniform teleport, but every
    quantity is a BIGINT and every division truncates, so the result is
    engine-exact: the DuckDB chained-CTE oracle (``ORACLE_SQL_5ITER``)
    reproduces it bit-for-bit. Per-edge contribution = rank div outdeg;
    new rank = (d·inflow) div 100 + (d·dmass) div (100·n)
             + ((100-d)·E12) div (100·n), d in percent.
    """
    spark = edges.sparkSession
    nodes = _node_universe(edges, None).persist()
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "doc_id long, rank_e12 long")

    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    adj = edges.join(out_deg, "src").persist()
    d, t = damping_pct, 100 - damping_pct
    teleport = (t * E12) // (100 * n)

    ranks = nodes.select("id", "is_dangling", F.lit(E12 // n).cast("long").alias("rank"))
    for _ in range(iters):
        dmass = (
            ranks.where("is_dangling")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)))
            .collect()[0][0]
        )
        dshare = (d * dmass) // (100 * n)
        contribs = (
            adj.join(ranks, adj.src == ranks.id)
            .select(F.col("dst").alias("id"), F.expr("rank div outdeg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                "is_dangling",
                (
                    F.expr(f"({d} * coalesce(inflow, 0L)) div 100")
                    + F.lit(int(dshare + teleport))
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )

    nodes.unpersist()
    adj.unpersist()
    return ranks.select(F.col("id").alias("doc_id"), F.col("rank").alias("rank_e12"))


def oracle_sql_fixed_e12(
    edges_sql: str, iters: int = FIXED_ITERS, damping_pct: int = 85
) -> str:
    """DuckDB twin of :func:`pagerank_fixed_e12`: one CTE chain per
    iteration over ``edges_sql`` (a SELECT yielding src, dst)."""
    d, t = damping_pct, 100 - damping_pct
    ctes = [
        f"edges AS ({edges_sql})",
        """nodes AS (
  SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
)""",
        "params AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src)",
        f"""r0 AS (
  SELECT id, CAST({E12} // (SELECT n FROM params) AS BIGINT) AS rank FROM nodes
)""",
    ]
    for i in range(iters):
        ctes.append(
            f"""d{i} AS (
  SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dmass
  FROM r{i} WHERE id NOT IN (SELECT src FROM edges)
)"""
        )
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS id, CAST(sum(r.rank // o.outdeg) AS BIGINT) AS inflow
  FROM edges e JOIN r{i} r ON e.src = r.id JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{i + 1} AS (
  SELECT nd.id,
         CAST(({d} * coalesce(c.inflow, 0)) // 100
            + ({d} * (SELECT dmass FROM d{i})) // (100 * (SELECT n FROM params))
            + ({t} * {E12}) // (100 * (SELECT n FROM params)) AS BIGINT) AS rank
  FROM nodes nd LEFT JOIN c{i} c ON nd.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS doc_id, rank AS rank_e12 FROM r{iters}"
    )

"""DataFrame PageRank — the static link prior (frozen spec §8.3).

Math mined from the reference's NumPy/SciPy implementation
(`services/ranking/src/page_rank.py:33-83`): damping 0.85, uniform
teleport, dangling mass redistributed uniformly, L1 tolerance 1e-5,
max 100 iterations, node universe = distinct edge endpoints.

Spark shape (SURVEY §2.3 J5): the sparse mat-vec is a join + groupBy
per iteration. The adjacency (edges pre-joined with out-degree) is
computed once and persisted; each iteration is one shuffle hash join on
``src`` + one hash aggregation on ``dst``. ``localCheckpoint`` every
iteration cuts the lineage chain so plan size stays O(1) in iterations
(at cluster scale: ``checkpoint()`` to reliable storage instead —
config detail, same call site).

Convergence needs a driver-side scalar per iteration (the L1 residual);
that collect is a single double — unavoidable for a data-dependent
fixpoint, and the reference's loop does the same in-process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import (
    PAGERANK_DAMPING,
    PAGERANK_MAX_ITERS,
    PAGERANK_TOL,
)


def pagerank(
    edges: DataFrame,
    damping: float = PAGERANK_DAMPING,
    tol: float = PAGERANK_TOL,
    max_iters: int = PAGERANK_MAX_ITERS,
) -> DataFrame:
    """edges (src, dst) → prior (doc_id, score)."""
    spark = edges.sparkSession

    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "doc_id long, score double")

    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    adj = edges.join(out_deg, "src").persist()
    adj.count()  # materialize once
    # dangling nodes: appear as dst only (outdeg undefined)
    dangling = nodes.join(
        edges.select("src").distinct(), nodes.id == F.col("src"), "left_anti"
    ).persist()

    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()

    for _ in range(max_iters):
        dmass_row = ranks.join(dangling, "id", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).collect()[0]
        dmass = dmass_row[0]

        contribs = (
            adj.join(ranks, adj.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                    + F.lit(damping * dmass / n + teleport)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        resid = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "id")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if resid < tol:
            break

    nodes.unpersist()
    adj.unpersist()
    dangling.unpersist()
    return ranks.select(F.col("id").alias("doc_id"), F.col("rank").alias("score"))

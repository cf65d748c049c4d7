"""Label-propagation community detection (Raghavan, Albert & Kumara,
Phys. Rev. E 76, 2007 — re-derived from the paper) over the link
graph: each node adopts the most frequent label among its neighbors.
Communities = near-clique regions; in a web corpus they surface mirror
farms and template families the way clustering coefficients surface
them per-node (operators/triangles.py).

This is the *synchronous, fixed-iteration, deterministic* variant:

- all nodes update simultaneously from the previous round's labels
  (async LPA is order-dependent — unreproducible across engines);
- argmax ties break on the smaller label, making each round a pure
  function of the last — so a DuckDB chain-CTE twin reproduces it
  bit-exactly;
- a fixed iteration budget instead of convergence detection
  (synchronous LPA can oscillate on bipartite-ish regions, so a
  convergence loop may never exit; fixed rounds are also the
  SQL-twinnable shape, cf. pagerank_fixed_e12).

Scale shape (100 TB): one round = one labels⋈edges shuffle join on
src + one (dst, label)-keyed count with map-side partial combine + one
per-dst argmax via ``max_by`` (again map-side combinable — a celebrity
node's neighbor multiset folds inside the combiner, never a
single-task window) + a node-keyed left join to carry isolated nodes.
Labels/edges are narrow long columns; per-round ``localCheckpoint``
truncates lineage like the CC operators (components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LPA_ITERS = 3


def lpa_fixed(edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """(src, dst) edge list (made symmetric; self-loops dropped) →
    (id, label) after ``iters`` synchronous rounds; label init = id."""
    sym = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.col("src").cast("long").alias("a"),
                F.col("dst").cast("long").alias("b"))
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))) \
        .distinct().persist()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(iters):
        nb = sym.join(labels.withColumnRenamed("id", "a"), "a").select(
            F.col("b").alias("id"), "label"
        )
        cnt = nb.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        # most frequent neighbor label, smaller label on ties:
        # min_by over (-cnt, label) — an aggregate, not a window, so a
        # hub's neighbor histogram folds map-side. Negating cnt (≥ 1,
        # bounded by degree) rather than label keeps arbitrary long ids
        # safe (−label would wrap for ids near Long.MIN)
        new = cnt.groupBy("id").agg(
            F.expr("min_by(label, struct(-cnt, label))").alias("newlab")
        )
        labels = (
            labels.join(new, "id", "left")
            .select(
                "id", F.coalesce("newlab", "label").cast("long").alias("label")
            )
            .localCheckpoint()
        )
    sym.unpersist()
    return labels


def oracle_sql_lpa(edges_sql: str, iters: int = LPA_ITERS) -> str:
    """DuckDB twin of :func:`lpa_fixed`: one CTE per round over
    ``edges_sql`` (a SELECT yielding src, dst)."""
    ctes = [
        f"raw AS ({edges_sql})",
        """sym AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM raw WHERE src <> dst
    UNION ALL
    SELECT dst AS a, src AS b FROM raw WHERE src <> dst
  )
)""",
        "l0 AS (SELECT DISTINCT a AS id, a AS label FROM sym)",
    ]
    for i in range(iters):
        ctes.append(
            f"""c{i} AS (
  SELECT e.b AS id, l.label, count(*) AS cnt
  FROM sym e JOIN l{i} l ON l.id = e.a
  GROUP BY e.b, l.label
)"""
        )
        ctes.append(
            f"""m{i} AS (
  SELECT id, label AS newlab FROM (
    SELECT id, label,
           row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC)
             AS rn
    FROM c{i}
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""l{i + 1} AS (
  SELECT l.id, CAST(coalesce(m.newlab, l.label) AS BIGINT) AS label
  FROM l{i} l LEFT JOIN m{i} m USING (id)
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, label FROM l{iters}"
    )

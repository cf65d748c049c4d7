"""Link prediction over the backlink graph: Adamic-Adar scores for
non-adjacent node pairs (Adamic & Adar, "Friends and neighbors on the
Web", Social Networks 2003 — re-derived from the published formula).

For a candidate pair (a, b) the score is Σ_z 1/ln(deg(z)) over their
common neighbors z — rare shared neighbors certify similarity far more
than hub neighbors. This is the standard "pages that should link but
don't" / related-document signal a crawl pipeline computes from the
same edge sink PageRank reads (the reference stores the graph,
`services/spider/internal/repository/*`; prediction analytics are part
of the training-pipeline surface added on top).

Cross-engine protocol: each center contributes the INTEGER
floor(10^6 / ln(deg)) so per-pair scores are exact integer sums; both
engines floor the same double (one ln, one divide).

100 TB posture — the wedge fan-out is the whole game:

- pair generation self-joins the adjacency list on the CENTER node, so
  a degree-d hub alone emits d²/2 candidate rows into one join key —
  the same "last reducer" the triangle counter dodges via orientation.
  Orientation doesn't apply here (the pair needs BOTH endpoints, not a
  DAG), so the guard is the classic top-degree cutoff: centers above
  ``max_center_degree`` are EXCLUDED (their per-pair weight
  1/ln(deg) is the smallest in the graph, so the dropped mass is the
  least informative — the standard approximation in production
  similarity pipelines). The cap bounds the worst key at cap²/2 rows
  and is part of the operator's contract (the oracle applies the same
  cutoff), not a hidden truncation.
- everything else is node-keyed joins and a (a, b)-keyed aggregate
  with map-side combine; existing edges leave via a broadcast-unfit
  but co-partitioned anti-join on the same (a, b) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E6 = 1_000_000
TOP_PAIRS = 100
MAX_CENTER_DEGREE = 10_000


def adamic_adar(
    edges: DataFrame, k: int = TOP_PAIRS,
    max_center_degree: int = MAX_CENTER_DEGREE,
) -> DataFrame:
    """(src, dst) edge list (directed duplicates / self-loops allowed)
    → top-``k`` non-adjacent pairs (a, b, common_neighbors, score_e6),
    a < b, ordered by (score_e6 desc, a, b)."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").cast("long").alias("u"),
            F.greatest("src", "dst").cast("long").alias("v"),
        )
        .distinct()
        # reused 3×: degree count, adjacency, existing-edge anti-join
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    adj = und.select(F.col("u").alias("z"), F.col("v").alias("nbr")).unionAll(
        und.select(F.col("v").alias("z"), F.col("u").alias("nbr"))
    )
    centers = (
        deg.where((F.col("degree") >= 2) & (F.col("degree") <= max_center_degree))
        .select(
            F.col("node").alias("z"),
            F.floor(F.lit(float(E6)) / F.log(F.col("degree").cast("double")))
            .cast("long")
            .alias("w_e6"),
        )
    )
    # both wedge legs read the weighted adjacency — persist so the
    # degree join + cutoff filter run once, not per leg
    az = adj.join(centers, "z").persist()
    a1 = az.select("z", F.col("nbr").alias("a"), "w_e6")
    a2 = az.select(F.col("z").alias("z2"), F.col("nbr").alias("b"))
    pairs = a1.join(
        a2, (F.col("z") == F.col("z2")) & (F.col("a") < F.col("b"))
    ).select("a", "b", "w_e6")
    scores = pairs.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("common_neighbors"),
        F.sum("w_e6").cast("long").alias("score_e6"),
    )
    non_adjacent = scores.join(
        und.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    # materialize the bounded top-k, then release both caches — a
    # long-lived session (gate driver, bench) must not accumulate
    # edge-sized storage per call (cf. ops/bpe.py unpersist discipline)
    rows = (
        non_adjacent.orderBy(F.desc("score_e6"), F.asc("a"), F.asc("b"))
        .limit(k)
        .select("a", "b", "common_neighbors", "score_e6")
        .collect()
    )
    und.unpersist()
    az.unpersist()
    return edges.sparkSession.createDataFrame(
        rows, "a long, b long, common_neighbors long, score_e6 long"
    )


def jaccard_pairs(
    edges: DataFrame, k: int = TOP_PAIRS,
    max_center_degree: int = MAX_CENTER_DEGREE,
) -> DataFrame:
    """Jaccard neighbor-overlap link prediction — the other canonical
    common-neighbor score (|N(a)∩N(b)| / |N(a)∪N(b)|; Liben-Nowell &
    Kleinberg, CIKM'03 — re-derived): top-``k`` non-adjacent pairs
    (a, b, common_neighbors, jaccard_e6), a < b, ordered by
    (jaccard_e6 desc, a, b).

    Same candidate machinery and ``max_center_degree`` cutoff as
    :func:`adamic_adar` (common neighbors routed through capped
    centers; the union term uses EXACT degrees, so the cutoff only
    understates overlap through hub centers — the documented
    approximation, oracle-matched). ×10^6 truncating fixed-point."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").cast("long").alias("u"),
            F.greatest("src", "dst").cast("long").alias("v"),
        )
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
        .persist()
    )
    adj = und.select(F.col("u").alias("z"), F.col("v").alias("nbr")).unionAll(
        und.select(F.col("v").alias("z"), F.col("u").alias("nbr"))
    )
    centers = deg.where(
        (F.col("degree") >= 2) & (F.col("degree") <= max_center_degree)
    ).select(F.col("node").alias("z"))
    az = adj.join(centers, "z").persist()
    a1 = az.select("z", F.col("nbr").alias("a"))
    a2 = az.select(F.col("z").alias("z2"), F.col("nbr").alias("b"))
    common = (
        a1.join(a2, (F.col("z") == F.col("z2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("common_neighbors"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    scored = (
        common.join(da, "a").join(db, "b")
        .withColumn(
            "jaccard_e6",
            F.expr(
                f"({E6}L * common_neighbors)"
                " div (da + db - common_neighbors)"
            ).cast("long"),
        )
    )
    non_adjacent = scored.join(
        und.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    rows = (
        non_adjacent.orderBy(F.desc("jaccard_e6"), F.asc("a"), F.asc("b"))
        .limit(k)
        .select("a", "b", "common_neighbors", "jaccard_e6")
        .collect()
    )
    und.unpersist()
    deg.unpersist()
    az.unpersist()
    return edges.sparkSession.createDataFrame(
        rows, "a long, b long, common_neighbors long, jaccard_e6 long"
    )


def oracle_sql_jaccard(
    edges_sql: str, k: int = TOP_PAIRS,
    max_center_degree: int = MAX_CENTER_DEGREE,
) -> str:
    """DuckDB twin of :func:`jaccard_pairs`."""
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
adj AS (
  SELECT u AS z, v AS nbr FROM und
  UNION ALL
  SELECT v AS z, u AS nbr FROM und
),
centers AS (
  SELECT node AS z FROM deg
  WHERE degree >= 2 AND degree <= {max_center_degree}
),
common AS (
  SELECT a1.nbr AS a, a2.nbr AS b, CAST(count(*) AS BIGINT) AS common_neighbors
  FROM adj a1
  JOIN centers c ON c.z = a1.z
  JOIN adj a2 ON a2.z = a1.z AND a1.nbr < a2.nbr
  GROUP BY a1.nbr, a2.nbr
),
scored AS (
  SELECT cm.a, cm.b, cm.common_neighbors,
         CAST(({E6} * cm.common_neighbors)
              // (da.degree + db.degree - cm.common_neighbors) AS BIGINT)
           AS jaccard_e6
  FROM common cm
  JOIN deg da ON da.node = cm.a
  JOIN deg db ON db.node = cm.b
)
SELECT s.a, s.b, s.common_neighbors, s.jaccard_e6
FROM scored s
ANTI JOIN und ON und.u = s.a AND und.v = s.b
ORDER BY s.jaccard_e6 DESC, s.a ASC, s.b ASC
LIMIT {k}
"""


def oracle_sql_adamic_adar(
    edges_sql: str, k: int = TOP_PAIRS,
    max_center_degree: int = MAX_CENTER_DEGREE,
) -> str:
    """DuckDB twin of :func:`adamic_adar` over ``edges_sql`` (a SELECT
    yielding src, dst): same canonicalization, same degree cutoff, same
    integer floor weights."""
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
adj AS (
  SELECT u AS z, v AS nbr FROM und
  UNION ALL
  SELECT v AS z, u AS nbr FROM und
),
centers AS (
  SELECT node AS z,
         CAST(floor({E6}.0 / ln(CAST(degree AS DOUBLE))) AS BIGINT) AS w_e6
  FROM deg WHERE degree >= 2 AND degree <= {max_center_degree}
),
pairs AS (
  SELECT a1.nbr AS a, a2.nbr AS b, c.w_e6
  FROM adj a1
  JOIN centers c ON c.z = a1.z
  JOIN adj a2 ON a2.z = a1.z AND a1.nbr < a2.nbr
),
scores AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(sum(w_e6) AS BIGINT) AS score_e6
  FROM pairs GROUP BY a, b
)
SELECT s.a, s.b, s.common_neighbors, s.score_e6
FROM scores s
ANTI JOIN und ON und.u = s.a AND und.v = s.b
ORDER BY s.score_e6 DESC, s.a ASC, s.b ASC
LIMIT {k}
"""

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

Driver syncs: ONE scalar collect per ``check_every`` iterations — the
dangling mass stays in-plan as a broadcast 1-row aggregate, so only
the L1-residual stop check ever touches the driver, and batching it
(``check_every=n``) cuts round-trips ~n× on large graphs. The
reference's loop syncs in-process every iteration; ``check_every=1``
reproduces that schedule.

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
    check_every: int = 1,
    init_ranks: DataFrame | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """edges (src, dst) [+ optional personalization (id, weight)] →
    prior (doc_id, score).

    ``init_ranks`` (doc_id, score) warm-starts the power iteration —
    the incremental-refresh path: after a small graph delta the old
    prior is already near the new fixpoint, so iterations-to-tol drop
    from O(log(1/tol)/log(1/d)) to a handful (power iteration converges
    to the same fixpoint from ANY probability-vector start; the init
    only sets the distance covered). Ids absent from init (new docs)
    seed at 1/n, ids absent from the node universe (deleted docs) drop
    out via the join, and the seeded vector is renormalized to sum 1 in
    one scalar aggregate so mass conservation — which the update rule
    assumes — holds regardless of how stale the init is.

    ``stats`` (optional dict) receives ``iterations`` and
    ``driver_syncs`` for observability/regression tests.

    ``check_every=n`` batches the tolerance check: n joined iterations
    compose into one plan between residual collects, cutting driver
    round-trips ~n× on large graphs (VERDICT r02 item 7). The dangling
    mass — the one per-iteration scalar the old loop collected — stays
    IN-PLAN as a broadcast 1-row aggregate, so nothing inside a batch
    touches the driver. The stop rule still keys on the CONSECUTIVE L1
    residual (the last two iterates of the batch — the prefix is
    checkpointed first so the final step isn't recomputed); a batch may
    overshoot the tol crossing by up to n−1 extra iterations, which
    only refine the fixpoint (power iteration contracts by ``damping``
    per step). ``check_every=1`` reproduces the reference's
    per-iteration schedule."""
    spark = edges.sparkSession

    nodes = _node_universe(edges, personalization).persist()
    n = nodes.count()
    if n == 0:
        if stats is not None:
            stats["iterations"] = 0
            stats["driver_syncs"] = 0
        return spark.createDataFrame([], "doc_id long, score double")
    # uniform teleport unless personalized; p sums to 1 either way
    nodes_p = nodes.withColumn("p", F.coalesce(F.col("p"), F.lit(1.0 / n)))

    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    adj = edges.join(out_deg, "src").persist()
    adj.count()  # materialize once

    if init_ranks is None:
        state = nodes_p.select(
            "id", "is_dangling", "p", F.lit(1.0 / n).alias("rank")
        ).localCheckpoint()
    else:
        seeded = (
            nodes_p.join(
                init_ranks.select(
                    F.col("doc_id").alias("id"), F.col("score").alias("r0")
                ),
                "id",
                "left",
            )
            .select(
                "id", "is_dangling", "p",
                F.coalesce(F.col("r0"), F.lit(1.0 / n)).alias("rank"),
            )
            .localCheckpoint()
        )
        total = seeded.agg(F.sum("rank")).collect()[0][0]
        state = seeded.withColumn(
            "rank", F.col("rank") / F.lit(float(total))
        ).localCheckpoint()

    done = 0
    syncs = 0
    while done < max_iters:
        steps = min(max(1, check_every), max_iters - done)
        prev = state
        for s in range(steps):
            if s == steps - 1 and s > 0:
                # materialize the batch prefix once so the residual job
                # doesn't recompute it through the final step's lineage
                state = state.localCheckpoint()
            dang = state.agg(
                F.coalesce(
                    F.sum(F.when(F.col("is_dangling"), F.col("rank"))),
                    F.lit(0.0),
                ).alias("dmass")
            )
            contribs = (
                adj.join(
                    state.select(F.col("id").alias("src_id"), "rank"),
                    adj.src == F.col("src_id"),
                )
                .select(
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("outdeg")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("inflow"))
            )
            prev = state
            state = (
                nodes_p.join(contribs, "id", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "id",
                    "is_dangling",
                    "p",
                    (
                        damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                        + (damping * F.col("dmass") + (1.0 - damping))
                        * F.col("p")
                    ).alias("rank"),
                )
            )
            done += 1
        state = state.localCheckpoint()
        # ONE driver sync per batch: consecutive L1 residual
        resid = (
            state.alias("a")
            .join(prev.alias("b"), "id")
            .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
            .collect()[0][0]
        )
        syncs += 1
        if resid < tol:
            break

    if stats is not None:
        stats["iterations"] = done
        stats["driver_syncs"] = syncs
    nodes.unpersist()
    adj.unpersist()
    return state.select(F.col("id").alias("doc_id"), F.col("rank").alias("score"))


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


# Personalized-PageRank gate flavor (r4, VERDICT r3 item 6): integer
# fixed-point like pagerank_fixed_e12, with a DETERMINISTIC modular
# personalization vector both engines derive identically from the node
# ids (which the gate fixture derives from lineitem keys, so ids are
# non-negative and % agrees across engines): nodes with id % 10 < 3
# teleport with weight id % 5 + 1; everyone else only receives via
# links. Dangling mass redistributes BY the personalization vector —
# the defining PPR behavior (Page et al. §2.6 personalized vectors).
PPR_SEED_MOD = 10
PPR_SEED_LT = 3
PPR_W_MOD = 5


def _ppr_weights(nodes: DataFrame) -> DataFrame:
    return nodes.where((F.col("id") % PPR_SEED_MOD) < PPR_SEED_LT).select(
        "id", (F.col("id") % PPR_W_MOD + 1).cast("long").alias("w")
    )


def ppr_fixed_e12(
    edges: DataFrame, iters: int = FIXED_ITERS, damping_pct: int = 85
) -> DataFrame:
    """Fixed-iteration PERSONALIZED PageRank in ×10^12 integer
    fixed-point — engine-exact vs :func:`oracle_sql_ppr_e12`.

    new rank_i = (d·inflow_i) div 100
               + (d·dmass·w_i) div (100·W)
               + ((100−d)·E12·w_i) div (100·W)
    with w the modular seed weights (0 off-seed), W = Σw, init rank =
    (E12·w_i) div W. Overflow-safe in BIGINT: dmass ≤ E12, w ≤ 5."""
    spark = edges.sparkSession
    base = _node_universe(edges, None)
    nodes = (
        base.join(_ppr_weights(base.select("id")), "id", "left")
        .select(
            "id", "is_dangling",
            F.coalesce("w", F.lit(0)).cast("long").alias("w"),
        )
        .persist()
    )
    n = nodes.count()  # materializes the persist
    if n == 0:
        return spark.createDataFrame([], "doc_id long, rank_e12 long")
    wtot = nodes.agg(F.sum("w")).collect()[0][0]
    assert wtot and wtot > 0, "empty personalization seed set"

    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    adj = edges.join(out_deg, "src").persist()
    d, t = damping_pct, 100 - damping_pct

    ranks = nodes.select(
        "id", "is_dangling", "w",
        F.expr(f"({E12} * w) div {wtot}").cast("long").alias("rank"),
    )
    for _ in range(iters):
        dmass = (
            ranks.where("is_dangling")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)))
            .collect()[0][0]
        )
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
                "w",
                (
                    F.expr(f"({d} * coalesce(inflow, 0L)) div 100")
                    + F.expr(f"({d} * {int(dmass)}L * w) div (100 * {wtot})")
                    + F.expr(f"({t} * {E12}L * w) div (100 * {wtot})")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )

    nodes.unpersist()
    adj.unpersist()
    return ranks.select(F.col("id").alias("doc_id"), F.col("rank").alias("rank_e12"))


def oracle_sql_ppr_e12(
    edges_sql: str, iters: int = FIXED_ITERS, damping_pct: int = 85
) -> str:
    """DuckDB twin of :func:`ppr_fixed_e12` (chained CTEs, one per
    iteration; same modular personalization rule)."""
    d, t = damping_pct, 100 - damping_pct
    ctes = [
        f"edges AS ({edges_sql})",
        """nodes AS (
  SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
)""",
        f"""pers AS (
  SELECT id, CAST(id % {PPR_W_MOD} + 1 AS BIGINT) AS w
  FROM nodes WHERE id % {PPR_SEED_MOD} < {PPR_SEED_LT}
)""",
        "params AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM pers)",
        """nw AS (
  SELECT nd.id, CAST(coalesce(p.w, 0) AS BIGINT) AS w
  FROM nodes nd LEFT JOIN pers p ON nd.id = p.id
)""",
        "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src)",
        f"""r0 AS (
  SELECT id, CAST(({E12} * w) // (SELECT wt FROM params) AS BIGINT) AS rank FROM nw
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
  SELECT nw.id,
         CAST(({d} * coalesce(c.inflow, 0)) // 100
            + ({d} * (SELECT dmass FROM d{i}) * nw.w)
                // (100 * (SELECT wt FROM params))
            + ({t} * {E12} * nw.w) // (100 * (SELECT wt FROM params))
              AS BIGINT) AS rank
  FROM nw LEFT JOIN c{i} c ON nw.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS doc_id, rank AS rank_e12 FROM r{iters}"
    )

"""Hybrid lexical+vector retrieval with Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Buettcher, SIGIR'09 — re-derived from the
published formula; the fusion behind ES 8.x ``rrf`` retrievers and
most hybrid-search stacks): each ranked list contributes
1/(k + rank) per document, summed across lists. Rank-based fusion
needs no score calibration between BM25 (unbounded) and cosine
([−1, 1]) — exactly why production hybrid search uses it.

Cross-engine protocol: contributions are the INTEGER
10^6 // (k + rank), so fused scores are exact integer sums; ranks come
from the frozen (score desc, id asc) orders both engines share.

Driver tables: ``documents``.doc_id and ``embeddings``.vec_id are the
same id space (the embedding of doc i is row vec_id = i), so fusion is
a plain full-outer join on id.

100 TB posture: each leg is already a bounded top-``pool`` (the BM25
leg rides the pruned-scan machinery, the vector leg any ANN op in
ops/similarity.py — brute force in :func:`hybrid_rrf_topk` for
exactness); fusion operates on ≤ 2·pool rows. The full-outer join is
two tiny sorted lists — the fusion stage's cost is independent of
corpus size by construction.

``hybrid_rrf_ann_topk`` (r4, VERDICT r3 item 4) is the cost-routed
production variant: its vector leg is the IVF-PQ probe-and-rank
(ops/similarity.ivfpq_topk — nprobe=1 cluster prune, ADC code
ranking), so the vector side reads 1/K of the corpus's CODES instead
of every raw vector. ``hybrid_rrf_drift`` is the recall ledger for
the swap: the exact-leg and ANN-leg fused top-k side by side
(per-id rank pair + membership flags), quantifying the fusion-rank
drift the approximation introduces on the gate fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.search_sql import (
    QUERY_MAIN,
    _scores_cte,
    bm25_scores,
)
from search_engine_spark.ops.similarity import _COS, _dot, _norm

RRF_K = 60        # the canonical RRF constant (Cormack et al. §3)
RRF_POOL = 50     # per-leg candidate depth
RRF_TOPK = 10
QUERY_VEC_ID = 0  # the query embedding: vec 0 (its doc is not excluded
#                   from the lexical leg; self-match leaves via vec_id<>q)
E6 = 1_000_000


def _lex_leg(spark: SparkSession, docs: DataFrame, terms: list[str],
             pool: int) -> DataFrame:
    # TakeOrderedAndProject to the pool FIRST, then rank the ≤pool
    # survivors with a window — the global window never sees more than
    # ``pool`` rows (a bare global window over the scored set would be
    # a single-task corpus sort)
    lex_w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        bm25_scores(spark, docs, terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(pool)
        .withColumn("lex_rank", F.row_number().over(lex_w))
        .select(F.col("doc_id").alias("id"), "lex_rank")
    )


def _fuse(lex: DataFrame, vec: DataFrame, k: int) -> DataFrame:
    fused = (
        lex.join(vec, "id", "full_outer")
        .select(
            "id",
            F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("int").alias("vec_rank"),
        )
        .withColumn(
            "rrf_e6",
            (
                F.when(F.col("lex_rank") > 0,
                       F.expr(f"{E6} div ({RRF_K} + lex_rank)")).otherwise(0)
                + F.when(F.col("vec_rank") > 0,
                         F.expr(f"{E6} div ({RRF_K} + vec_rank)")).otherwise(0)
            ).cast("long"),
        )
    )
    return (
        fused.orderBy(F.desc("rrf_e6"), F.asc("id"))
        .limit(k)
        .select("id", "lex_rank", "vec_rank", "rrf_e6")
    )


def hybrid_rrf_topk(
    spark: SparkSession, docs: DataFrame, emb: DataFrame,
    terms: list[str] | None = None, k: int = RRF_TOPK,
    pool: int = RRF_POOL, query_vec: int = QUERY_VEC_ID,
) -> DataFrame:
    """Top-``k`` docs by RRF over (BM25 top-``pool``, cosine
    top-``pool``): (id, lex_rank, vec_rank, rrf_e6), absent-leg ranks
    reported as 0, ordered by (rrf_e6 desc, id asc)."""
    terms = QUERY_MAIN if terms is None else terms
    lex = _lex_leg(spark, docs, terms, pool)

    q = emb.where(F.col("vec_id") == query_vec).select(
        F.col("embedding").alias("q")
    )
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    vec_w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    vec = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_vec)
        .select("vec_id", F.round(cos, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(pool)
        .withColumn("vec_rank", F.row_number().over(vec_w))
        .select(F.col("vec_id").alias("id"), "vec_rank")
    )
    return _fuse(lex, vec, k)


def hybrid_rrf_ann_topk(
    spark: SparkSession, docs: DataFrame, emb: DataFrame,
    terms: list[str] | None = None, k: int = RRF_TOPK,
    pool: int = RRF_POOL, query_vec: int = QUERY_VEC_ID,
) -> DataFrame:
    """The production hybrid: vector leg = IVF-PQ probe-and-rank
    (nprobe=1 cluster prune, then ADC ranking over m·log2(k)-bit codes)
    instead of brute-force cosine. The vector side's per-query cost
    drops from O(N) raw-vector reads to O(N/K) code reads; the leg may
    return < pool rows when the probed cluster is small (RRF handles a
    short leg natively). Ranks come from (adc_dist asc, vec_id asc) —
    integer-exact, same protocol as the green ``sim_ivfpq_topk`` gate."""
    from search_engine_spark.ops.similarity import ivfpq_topk

    terms = QUERY_MAIN if terms is None else terms
    lex = _lex_leg(spark, docs, terms, pool)
    vec = (
        ivfpq_topk(emb, k=pool, n_queries=query_vec + 1)
        .where(F.col("query_id") == query_vec)
        .select(F.col("vec_id").alias("id"),
                F.col("rank").alias("vec_rank"))
    )
    return _fuse(lex, vec, k)


def hybrid_rrf_drift(
    spark: SparkSession, docs: DataFrame, emb: DataFrame,
    terms: list[str] | None = None, k: int = RRF_TOPK,
) -> DataFrame:
    """Fusion-rank drift ledger for the ANN swap (the ``sim_ann_recall``
    pattern applied to the FUSED lists): exact-leg fused top-k vs
    ANN-leg fused top-k, per id — (id, exact_rank, ann_rank), 0 where
    the id is absent from that list. sum(ann_rank > 0 AND exact_rank >
    0) / k is fused recall@k; the rank pairs expose the drift shape."""
    exact_w = Window.orderBy(F.desc("rrf_e6"), F.asc("id"))
    ex = (
        hybrid_rrf_topk(spark, docs, emb, terms, k=k)
        .withColumn("exact_rank", F.row_number().over(exact_w))
        .select("id", "exact_rank")
    )
    an = (
        hybrid_rrf_ann_topk(spark, docs, emb, terms, k=k)
        .withColumn("ann_rank", F.row_number().over(exact_w))
        .select("id", "ann_rank")
    )
    return (
        ex.join(an, "id", "full_outer")
        .select(
            "id",
            F.coalesce("exact_rank", F.lit(0)).cast("int").alias("exact_rank"),
            F.coalesce("ann_rank", F.lit(0)).cast("int").alias("ann_rank"),
        )
        .orderBy(F.asc("id"))
    )


ORACLE_SQL = {
    "search_hybrid_rrf": _scores_cte(QUERY_MAIN)
    + f""",
lex AS (
  SELECT doc_id AS id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER)
           AS lex_rank
  FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {RRF_POOL}
),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
vscored AS (
  SELECT c.vec_id, round({_COS}, 4) AS cosine
  FROM embeddings c CROSS JOIN qv q
  WHERE c.vec_id <> {QUERY_VEC_ID}
),
vec AS (
  SELECT vec_id AS id,
         CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS INTEGER)
           AS vec_rank
  FROM vscored
  ORDER BY cosine DESC, vec_id ASC LIMIT {RRF_POOL}
),
fused AS (
  SELECT coalesce(lex.id, vec.id) AS id,
         CAST(coalesce(lex.lex_rank, 0) AS INTEGER) AS lex_rank,
         CAST(coalesce(vec.vec_rank, 0) AS INTEGER) AS vec_rank,
         CAST(CASE WHEN lex.lex_rank IS NULL THEN 0
                   ELSE {E6} // ({RRF_K} + lex.lex_rank) END
            + CASE WHEN vec.vec_rank IS NULL THEN 0
                   ELSE {E6} // ({RRF_K} + vec.vec_rank) END AS BIGINT)
           AS rrf_e6
  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
)
SELECT id, lex_rank, vec_rank, rrf_e6 FROM fused
ORDER BY rrf_e6 DESC, id ASC LIMIT {RRF_TOPK}""",
}


def _ann_sql() -> str:
    from search_engine_spark.ops.similarity import _duck_ivfpq_sql

    return _scores_cte(QUERY_MAIN) + f""",
lex AS (
  SELECT doc_id AS id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER)
           AS lex_rank
  FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {RRF_POOL}
),
ann AS ({_duck_ivfpq_sql(n_queries=QUERY_VEC_ID + 1, topk=RRF_POOL)}),
vec AS (
  SELECT vec_id AS id, CAST(rank AS INTEGER) AS vec_rank
  FROM ann WHERE query_id = {QUERY_VEC_ID}
),
fused AS (
  SELECT coalesce(lex.id, vec.id) AS id,
         CAST(coalesce(lex.lex_rank, 0) AS INTEGER) AS lex_rank,
         CAST(coalesce(vec.vec_rank, 0) AS INTEGER) AS vec_rank,
         CAST(CASE WHEN lex.lex_rank IS NULL THEN 0
                   ELSE {E6} // ({RRF_K} + lex.lex_rank) END
            + CASE WHEN vec.vec_rank IS NULL THEN 0
                   ELSE {E6} // ({RRF_K} + vec.vec_rank) END AS BIGINT)
           AS rrf_e6
  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
)
SELECT id, lex_rank, vec_rank, rrf_e6 FROM fused
ORDER BY rrf_e6 DESC, id ASC LIMIT {RRF_TOPK}"""


ORACLE_SQL["search_hybrid_rrf_ann"] = _ann_sql()

ORACLE_SQL["search_hybrid_rrf_drift"] = f"""
WITH exact_list AS ({ORACLE_SQL["search_hybrid_rrf"]}),
ann_list AS ({ORACLE_SQL["search_hybrid_rrf_ann"]}),
er AS (
  SELECT id, CAST(row_number() OVER (ORDER BY rrf_e6 DESC, id ASC)
                  AS INTEGER) AS exact_rank
  FROM exact_list
),
ar AS (
  SELECT id, CAST(row_number() OVER (ORDER BY rrf_e6 DESC, id ASC)
                  AS INTEGER) AS ann_rank
  FROM ann_list
)
SELECT coalesce(er.id, ar.id) AS id,
       CAST(coalesce(er.exact_rank, 0) AS INTEGER) AS exact_rank,
       CAST(coalesce(ar.ann_rank, 0) AS INTEGER) AS ann_rank
FROM er FULL OUTER JOIN ar ON er.id = ar.id
ORDER BY id ASC
"""

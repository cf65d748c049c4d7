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
ops/similarity.py — brute force here for exactness); fusion operates
on ≤ 2·pool rows. The full-outer join is two tiny sorted lists — the
fusion stage's cost is independent of corpus size by construction.
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


def hybrid_rrf_topk(
    spark: SparkSession, docs: DataFrame, emb: DataFrame,
    terms: list[str] | None = None, k: int = RRF_TOPK,
    pool: int = RRF_POOL, query_vec: int = QUERY_VEC_ID,
) -> DataFrame:
    """Top-``k`` docs by RRF over (BM25 top-``pool``, cosine
    top-``pool``): (id, lex_rank, vec_rank, rrf_e6), absent-leg ranks
    reported as 0, ordered by (rrf_e6 desc, id asc)."""
    terms = QUERY_MAIN if terms is None else terms

    # each leg: TakeOrderedAndProject to the pool FIRST, then rank the
    # ≤pool survivors with a window — the global window never sees more
    # than ``pool`` rows (a bare global window over the scored set
    # would be a single-task corpus sort)
    lex_w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        bm25_scores(spark, docs, terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(pool)
        .withColumn("lex_rank", F.row_number().over(lex_w))
        .select(F.col("doc_id").alias("id"), "lex_rank")
    )

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

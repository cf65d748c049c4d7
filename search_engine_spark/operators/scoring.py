"""BM25 scoring over postings — the query-time math (frozen §8.2/§8.4).

Query lifecycle (SURVEY §3.1 Spark shape): query string → tokenizer →
distinct terms → broadcast join against postings (disjunctive: any
matching term makes a doc a candidate, reference `store.go:82` ``word =
ANY($1)``) → per-(doc,term) partial score → groupBy(doc) sum → top-k.

All expressions are built-in pyspark.sql.functions — whole-stage
codegen end to end; the only Python in the hot path is the one-string
query tokenizer on the driver.

Determinism: BM25 is a float sum whose addend order Spark does not
guarantee across partitionings. Rank-identity tests use a 1e-9 relative
tolerance; the tie-break columns (matched desc, path desc, doc_id asc)
make the ORDER deterministic wherever scores are exactly equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.functions.tokenize import query_terms


def query_terms_df(spark: SparkSession, query: str) -> DataFrame:
    """Tokenized + deduped query terms as a 1-column DataFrame."""
    terms = query_terms(query)
    if not terms:
        return spark.createDataFrame([], "term string")
    from search_engine_spark.functions.inline import inline_table

    return inline_table(spark, [(t,) for t in terms], "term string")


def partial_scores(
    matched_postings: DataFrame,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, term, tf, dl, idf) → + partial = idf · tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))."""
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
    return matched_postings.withColumn(
        "partial", F.col("idf") * (F.col("tf") * (k1 + 1.0)) / denom
    )


def bm25_scores(
    postings: DataFrame,
    terms: DataFrame,
    query: str,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Disjunctive BM25 → (doc_id, score, matched).

    The query-term side is tiny and explicitly broadcast; the isin()
    pre-filter is pushed into the postings scan by Catalyst (check:
    PushedFilters in explain), so at scale only matching row groups are
    read — the DataFrame analogue of the reference's B-tree index probe
    (`schema.sql:62-66`).

    Summation order: ``sort_array(collect_list(...))`` would pin float
    order exactly, but costs a wide row. We instead sum in whatever
    order and hold rank identity to 1e-9 relative tolerance (few-term
    queries keep the error ~1 ulp); the deterministic tie-breaks live in
    :func:`rank_order` downstream.
    """
    qts = query_terms(query)
    if not qts:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, score double, matched int"
        )
    matched = (
        postings.where(F.col("term").isin(qts))
        .join(F.broadcast(terms.where(F.col("term").isin(qts))), "term")
    )
    scored = partial_scores(matched, avgdl, k1, b)
    return scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score"),
        F.count("*").cast("int").alias("matched"),
    )


def rank_order(scored: DataFrame, score_col: str = "score") -> list:
    """The frozen total order §8.4: score desc, matched desc, path desc,
    doc_id asc. (Caller joins in ``path`` before ordering.)"""
    return [
        F.col(score_col).desc(),
        F.col("matched").desc(),
        F.col("path").desc(),
        F.col("doc_id").asc(),
    ]


def bm25_topk(
    postings: DataFrame,
    terms: DataFrame,
    docs: DataFrame,
    query: str,
    avgdl: float,
    k: int = 10,
) -> DataFrame:
    """Pure BM25 top-k (no prior): the milestone-1 end-to-end slice.

    orderBy + limit compiles to TakeOrderedAndProject — per-partition
    top-k then a k-row merge on the driver; no global sort.
    """
    scored = bm25_scores(postings, terms, query, avgdl)
    with_path = scored.join(docs.select("doc_id", "path"), "doc_id", "left")
    return (
        with_path.orderBy(*rank_order(with_path))
        .select("doc_id", "score", "matched", "path")
        .limit(k)
    )

"""Streaming percolation: saved-search alerting over a document stream.

The streaming twin of ``ops/search_sql.percolate`` (ES/Lucene
percolator): stored queries are the registry, arriving docs are probes,
and every micro-batch emits (doc, query) match rows — the
notify-me-when-a-doc-matches shape (alerting, routing, saved searches).

Statelessness is the design point: percolation is a pure per-doc
function of the registry, so there is NO cross-batch state, no
watermark, and no state store — exactly-once comes entirely from the
file-sink/checkpoint contract. That also dictates the plan: instead of
the batch op's postings aggregate (a shuffle — illegal mid-stream in
append mode without a watermark), each doc row joins the broadcast
registry and the match test is a row-local expression:
``n_hit = size(array_intersect(distinct tokens, query terms))``. At
100 TB/day the per-row cost is O(tokens × queries) with a KB–MB
registry — the standard percolator regime; a million-query registry
would instead index the queries' rarest terms and pre-filter, the same
two-phase upgrade path the batch op documents.

Token rule is the frozen engine tokenizer (``sqltwin.tokens_col``), so
stream matches are bit-identical to the batch op — asserted in
tests/test_stream_percolate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.ops.search_sql import PERC_QUERIES
from search_engine_spark.ops.sqltwin import tokens_col


def percolator_registry(
    spark: SparkSession,
    queries: list[tuple[str, list[str], bool]] | None = None,
) -> DataFrame:
    """(qid, terms array<string>, n_terms, require_all) — the stored-
    query dimension, broadcast at join time."""
    queries = PERC_QUERIES if queries is None else queries
    rows = [
        (qid, sorted(set(terms)), len(sorted(set(terms))), bool(ra))
        for qid, terms, ra in queries
    ]
    return spark.createDataFrame(
        sorted(rows),
        "qid string, terms array<string>, n_terms int, require_all boolean",
    )


def percolate_stream(docs: DataFrame, registry: DataFrame) -> DataFrame:
    """Match every (streaming) doc against the registry. Emits
    (doc_id, ts, qid, n_hit); conjunctive queries require every term,
    disjunctive at least one. Works identically on a batch DataFrame
    (the test's equivalence harness relies on that)."""
    toks = F.array_distinct(tokens_col("text"))
    matched = (
        docs.select("doc_id", "ts", toks.alias("toks"))
        .join(F.broadcast(registry))
        .withColumn(
            "n_hit", F.size(F.array_intersect(F.col("toks"), F.col("terms")))
        )
        .where(
            (~F.col("require_all") & (F.col("n_hit") >= 1))
            | (F.col("require_all") & (F.col("n_hit") == F.col("n_terms")))
        )
    )
    return matched.select("doc_id", "ts", "qid", "n_hit")

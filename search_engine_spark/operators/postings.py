"""Posting-list construction and corpus statistics.

The distributed rebuild of the reference's indexer core
(`services/indexer/src/core/`): tokenize (vectorized, no shuffle) →
exploded postings ``(doc_id, term, tf, dl)`` → term dictionary with
document frequency + BM25 IDF (the reference's ``words`` table,
`migration/schema.sql:19-24`, minus the surrogate UUIDs — the term
string itself is the key, SURVEY §1.2).

Scale notes:
- df is a plain ``groupBy(term).count()`` — postings are already unique
  per (doc, term) by construction, so no count-distinct shuffle
  (SURVEY §2.4 A2). Catalyst plans partial (map-side) aggregation
  before the exchange, so the shuffle carries one row per (partition,
  term), not per posting.
- corpus-level scalars (N, avgdl) come from ONE pass over postings with
  a tiny two-row-group aggregate; they're broadcast to UDF closures as
  plain floats.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.tokenize import extract_postings


def build_postings(corpus_with_id: DataFrame, text_col: str = "content") -> DataFrame:
    """corpus (with doc_id) → postings (doc_id, term, tf, dl)."""
    return extract_postings(corpus_with_id, text_col)


def build_terms(postings: DataFrame, n_docs: int) -> DataFrame:
    """postings → (term, df, idf).

    IDF is the Lucene-positive BM25 variant (frozen §8.2):
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``. The reference's base-10 /
    integer-division IDF (`services/ranking/src/idf.py:14-23`) is kept
    in :func:`reference_compat_idf` for provenance only.
    """
    return postings.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
    )


def build_terms_with_stats(
    postings: DataFrame, n_docs: int
) -> tuple[DataFrame, float]:
    """postings → ((term, df, idf), total_dl) from ONE aggregation pass.

    Fuses :func:`build_terms` and the Σtf scan of :func:`corpus_stats`:
    the per-term aggregate carries ``sum(tf)`` alongside ``count(*)``,
    so total_dl is a driver-side sum over the (vocab-sized) term table
    instead of a second full pass over postings. At 100 TB that's one
    fewer scan of the largest intermediate in the build; map-side
    partial aggregation means the extra column adds one long per
    (partition, term) to the existing exchange.
    """
    terms = (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("term_tf"))
        .withColumn(
            "idf",
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .persist()
    )
    total_dl = terms.agg(F.sum("term_tf")).collect()[0][0] or 0
    # caller: select away term_tf for the durable table, then unpersist
    # this handle once written (projections on top still hit the cache)
    return terms, float(total_dl)


def reference_compat_idf(n_docs: int, df: int) -> float:
    """The reference's quirky IDF: Postgres 1-arg LOG is base-10 and
    bigint/bigint truncates (SURVEY §2.4 A3). Not used for ranking;
    documented + tested for provenance."""
    ratio = n_docs // (1 + df)
    return math.log10(ratio) if ratio > 0 else 0.0


def corpus_stats(postings: DataFrame, n_docs: int) -> dict:
    """Global scalars the scorer needs: N and avgdl.

    avgdl = (Σ dl over docs) / N. Since dl is replicated on every
    posting row, sum per doc via (sum tf) — one aggregate pass, no
    distinct. Docs that produced zero tokens contribute 0 to the sum
    but still count in N (frozen §8.2).
    """
    row = postings.agg(F.sum("tf").alias("total_dl")).collect()[0]
    total_dl = row["total_dl"] or 0
    return {"n_docs": n_docs, "avgdl": (total_dl / n_docs) if n_docs else 0.0}

"""Benchmark decontamination — flag training documents that overlap an
evaluation set by a verbatim n-gram.

The standard pretraining hygiene pass (GPT-3 appendix C "dirty" docs,
Dolma/RedPajama decontamination): any training document sharing at
least one length-``N`` token n-gram with any eval document is
contaminated and must be dropped or down-weighted before training.

Plan shape (the 100 TB layout):
- Eval n-gram set: one narrow pass over the (small) eval table —
  tokens → sliding n-grams → 31-bit hash → distinct. Thousands of
  benchmarks ≪ corpus, so this set BROADCASTS (here: explicit
  ``F.broadcast``; if eval outgrows the driver, the same join keys a
  bucketed shuffle on the hash instead — one-line change).
- Training side: the same narrow n-gram pass, then a broadcast
  semi-join per n-gram + per-doc distinct-hit count. No content ever
  shuffles; only (doc_id, hash) pairs that actually match survive the
  join.

The gate derives the eval set deterministically from the table itself
(``doc_id % EVAL_MOD == 0``), so the oracle is self-contained; the
synthetic corpus's planted exact duplicates guarantee non-trivial
contamination rows. Hashes use the portable md5-based 31-bit term hash
(ops/sqltwin.py) over the space-joined n-gram, identical on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.sqltwin import (
    duck_term_hash31,
    duck_tokens,
    term_hash31,
    tokens_col,
)

NGRAM_N = 8
EVAL_MOD = 31  # eval set = doc_id % 31 == 0 (deterministic, ~3%)


def _ngram_hashes(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gh): distinct 31-bit hashes of the doc's token
    n-grams — one narrow pass (slice/transform/explode)."""
    toks = tokens_col("text")
    grams = F.expr(
        f"CASE WHEN size(__toks) >= {n} THEN "
        f"transform(sequence(1, size(__toks) - {n} + 1), "
        f"i -> array_join(slice(__toks, i, {n}), ' ')) "
        "ELSE array() END"
    )
    return (
        docs.select("doc_id", toks.alias("__toks"))
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("g"))
        .select("doc_id", term_hash31(F.col("g")).alias("gh"))
        .distinct()
    )


def contaminated_docs(
    docs: DataFrame, n: int = NGRAM_N, eval_mod: int = EVAL_MOD
) -> DataFrame:
    """Training docs sharing ≥1 token ``n``-gram with the eval subset →
    (doc_id, n_hits) where n_hits = number of distinct contaminated
    n-grams. Eval docs themselves are excluded from the output."""
    is_eval = (F.col("doc_id") % eval_mod) == 0
    eval_grams = (
        _ngram_hashes(docs.where(is_eval), n).select("gh").distinct()
    )
    train_grams = _ngram_hashes(docs.where(~is_eval), n)
    return (
        train_grams.join(F.broadcast(eval_grams), "gh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


# --------------------------------------------------------------- oracle SQL

_T = duck_tokens("text")


def _decontam_sql(n: int = NGRAM_N, eval_mod: int = EVAL_MOD) -> str:
    gh = duck_term_hash31("g")
    grams = (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len(toks) - {n} + 2), "
        f"i -> array_to_string(toks[i:i+{n}-1], ' '))) "
        "ELSE [] END"
    )
    return f"""
WITH d AS (SELECT doc_id, {_T} AS toks FROM documents),
gr AS (
  SELECT DISTINCT doc_id, {gh} AS gh
  FROM (SELECT doc_id, unnest({grams}) AS g FROM d)
),
ev AS (SELECT DISTINCT gh FROM gr WHERE doc_id % {eval_mod} = 0),
tr AS (SELECT * FROM gr WHERE doc_id % {eval_mod} <> 0)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM tr JOIN ev USING (gh)
GROUP BY tr.doc_id
"""


ORACLE_SQL = {
    "text_decontaminate": _decontam_sql(),
}

"""End-to-end training-data prep: the composition the individual ops
exist for — one declarative plan from raw documents to a clean corpus.

    documents → lang filter (P5) → quality gate (C4/Gopher-style
    fixed-point score) → exact-dedup canonicalization → survivors

Everything is column algebra over one pass of ``documents`` plus the
dedup groupBy, so Catalyst fuses the filters into the scan
(PushedFilters) and the only shuffles are the quality join's reuse of
the md5 groupBy. The DuckDB twin reproduces the full composition —
integer fixed-point scoring keeps it engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.textstats import quality_score

CLEAN_LANGS = ["en", "es", "fr"]
MIN_CHARS = 60
QUALITY_MIN_E6 = 600_000


def clean_corpus(
    docs: DataFrame,
    langs: list[str] = CLEAN_LANGS,
    min_chars: int = MIN_CHARS,
    quality_min_e6: int = QUALITY_MIN_E6,
) -> DataFrame:
    """Surviving documents with their quality score and dedup status."""
    filtered = docs.where(
        F.col("lang").isin(langs) & (F.col("n_chars") >= min_chars)
    )
    q = quality_score(filtered).where(F.col("quality_e6") >= quality_min_e6)
    kept = filtered.join(q.select("doc_id", "quality_e6"), "doc_id")
    reps = (
        kept.select("doc_id", F.md5("text").alias("m"))
        .groupBy("m")
        .agg(F.min("doc_id").alias("canonical_doc_id"),
             F.count("*").cast("long").alias("n_dups"))
    )
    return (
        kept.select("doc_id", F.md5("text").alias("m"), "lang", "n_chars",
                    "quality_e6")
        .join(reps, "m")
        .where(F.col("doc_id") == F.col("canonical_doc_id"))
        .select("doc_id", "lang",
                F.col("n_chars").cast("long").alias("n_chars"),
                "quality_e6", "n_dups")
    )


# --------------------------------------------------------------- oracle SQL

def _oracle() -> str:
    from search_engine_spark.ops.textstats import ORACLE_SQL as TS

    # reuse the oracle-checked quality expression by nesting the
    # text_quality_score query over the filtered subset
    quality_sql = TS["text_quality_score"].replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE lang IN "
        f"({', '.join(repr(l) for l in CLEAN_LANGS)}) "
        f"AND n_chars >= {MIN_CHARS})",
    )
    return f"""
WITH q AS ({quality_sql}),
kept AS (
  SELECT d.doc_id, d.lang, d.n_chars, d.text, q.quality_e6
  FROM documents d JOIN q ON d.doc_id = q.doc_id
  WHERE q.quality_e6 >= {QUALITY_MIN_E6}
),
reps AS (
  SELECT md5(text) AS m, min(doc_id) AS canonical_doc_id,
         CAST(count(*) AS BIGINT) AS n_dups
  FROM kept GROUP BY 1
)
SELECT k.doc_id, k.lang, CAST(k.n_chars AS BIGINT) AS n_chars,
       k.quality_e6, r.n_dups
FROM kept k JOIN reps r ON md5(k.text) = r.m
WHERE k.doc_id = r.canonical_doc_id
"""


ORACLE_SQL = {"pipeline_clean_corpus": _oracle()}

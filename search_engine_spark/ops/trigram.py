"""Trigram substring index — the code-search primitive the inverted
index can't express.

Token postings answer word queries; code search also needs substring /
regex-literal matching ACROSS token boundaries (`join tab`, `->next`,
`#include <`). The public design (Cox, "Regular Expression Matching
with a Trigram Index", swtch.com/~rsc/regexp/regexp4.html — the
Google Code Search / Zoekt layout) indexes character 3-grams: a doc can
contain the needle only if it contains every trigram of the needle, so
candidates = AND over the needle's trigram posting lists, then one
exact ``contains`` verify on the survivors.

Scale shape:
- ``trigram_postings`` is one narrow pass (sequence → transform →
  explode → per-doc distinct); at 10^12 docs it lands
  directory-partitioned by a trigram-hash bucket exactly like the term
  index, and the scan prunes to the needle's trigrams.
- candidate AND = semi-join against a BROADCAST needle-trigram list +
  groupBy(doc_id) HAVING count = n_trigrams — one shuffle whose input
  is already restricted to the needle's trigrams.
- verify touches content ONLY for candidates (the false-positive rate
  of trigram AND is tiny for needles ≥ 5-6 chars), so the content scan
  is point lookups, not a corpus pass.

The DuckDB twin deliberately skips the index: a plain ``contains``
scan is the independent algorithm, and equality of outputs PROVES the
candidate set was a superset of the true matches (no trigram can be
missing from a containing doc) and the verify removed every false
positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.barrier import verify_after_join

NEEDLE_MAIN = "join tab"  # crosses a token boundary — untokenizable


def _trigrams(s: str) -> list[str]:
    return sorted({s[i : i + 3] for i in range(len(s) - 2)})


def trigram_postings(
    docs: DataFrame, text_col: str = "text", only: list[str] | None = None
) -> DataFrame:
    """(doc_id, tri): distinct character 3-grams of ``lower(text)`` —
    one narrow JVM pass (sequence/transform/explode), per-doc distinct
    collapses before any shuffle.

    ``only``: restrict to a known trigram set (a query's needle/CNF
    trigrams). ``array_intersect`` against the tiny literal array
    replaces the full array_distinct + explode — the explode emits
    ≤len(only) rows per doc instead of ~n_chars, which is what makes
    the INLINE ops cheap; the persisted sidecar build passes None."""
    # substring with a column-valued start needs the SQL expression
    # form; the length guard matters because Spark's sequence(1, 0)
    # DESCENDS ([1, 0]) instead of being empty. lower() is hoisted into
    # its own projection — inside the transform lambda it would be
    # re-evaluated per element (~n_chars times per row, measured 2×)
    lowered = docs.select("doc_id", F.lower(F.col(text_col)).alias("__lt"))
    tris = F.expr(
        "CASE WHEN length(__lt) >= 3 THEN "
        "transform(sequence(1, length(__lt) - 2), "
        "i -> substring(__lt, i, 3)) "
        "ELSE array() END"
    )
    if only is not None:
        keep = F.array_intersect(  # distinct by construction
            tris, F.array(*[F.lit(t) for t in sorted(set(only))])
        )
        return lowered.select("doc_id", F.explode(keep).alias("tri"))
    return lowered.select(
        "doc_id", F.explode(F.array_distinct(tris)).alias("tri")
    )


def substring_search(
    spark: SparkSession, docs: DataFrame, needle: str
) -> DataFrame:
    """Exact substring search via trigram AND + verify →
    (doc_id, n_occ). Needles shorter than 3 chars skip the prefilter
    (documented degenerate case: plain scan)."""
    needle = needle.lower()
    lt = F.lower(F.col("text"))
    n_occ = (
        (F.length(lt) - F.length(F.replace(lt, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")
    if len(needle) < 3:
        return docs.where(lt.contains(needle)).select(
            "doc_id", n_occ.alias("n_occ")
        )
    tris = _trigrams(needle)
    cand = (
        trigram_postings(docs, only=tris)
        .groupBy("doc_id")
        .agg(F.count("*").alias("ntri"))
        .where(F.col("ntri") == len(tris))
        .select("doc_id")
    )
    return (
        docs.join(cand, "doc_id", "left_semi")
        # verify: drop trigram false positives — barrier keeps the
        # contains() ABOVE the semi-join (functions/barrier.py), so it
        # runs on candidates only instead of being pushed to the scan
        .where(verify_after_join(lt.contains(needle)))
        .select("doc_id", n_occ.alias("n_occ"))
    )


# --------------------------------------------------------------- oracle SQL

def _substring_sql(needle: str) -> str:
    """Independent algorithm: full contains scan, no index — equality
    proves trigram-AND completeness + verify soundness."""
    needle = needle.lower().replace("'", "''")
    return f"""
SELECT doc_id,
       CAST((len(lt) - len(replace(lt, '{needle}', ''))) / {len(needle)}
            AS INTEGER) AS n_occ
FROM (SELECT doc_id, lower(text) AS lt FROM documents)
WHERE contains(lt, '{needle}')
"""


ORACLE_SQL = {
    "search_substring": _substring_sql(NEEDLE_MAIN),
}

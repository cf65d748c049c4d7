"""Identifier subtoken splitting — code-search tokenization.

Code search engines (Sourcegraph, GitHub code search, OpenGrok) index
identifier *subtokens* so `parseHttpRequest` is retrievable by
`parse`, `http`, or `request`: split on underscores/hyphens/dots, on
lower→Upper camelCase transitions, on ALLCAPS→Camel boundaries
(`HTTPServer` → `http`, `server`), and on letter↔digit boundaries
(`utf8Decode` → `utf`, `8`, `decode`), then lowercase.

The split is a pure JVM regexp_replace chain (no UDF): boundary
positions get a space injected, then one split+lower. The DuckDB twin
runs the same chain with RE2 `\\1` backreferences, proving the
semantics engine-independently.

The gate derives a deterministic identifier per document from its
first three tokens (snake + camel mixed: ``w1_w2W3``) — the same
derive-inputs-from-the-table pattern as the PageRank gate graph — so
the oracle checks real splits without needing identifiers in the
synthetic corpus. At build time the same expression can feed
``postings()`` to index subtokens alongside whole terms (layout-only
change: one more explode before the existing groupBy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERY_SUBTOKEN = "merge"
TOPK = 10

# boundary-injection rules, applied in order (Java $1 / RE2 \1 syntax
# differs between engines; the patterns themselves are common-subset)
_RULES = [
    (r"([A-Z]+)([A-Z][a-z])", " "),   # ALLCAPSCamel -> ALLCAPS Camel
    (r"([a-z0-9])([A-Z])", " "),      # camelCase    -> camel Case
    (r"([a-zA-Z])([0-9])", " "),      # letter|digit
    (r"([0-9])([a-zA-Z])", " "),      # digit|letter
]
_SEPS = r"[_\-.]+"


def subtokens_col(col: str | Column) -> Column:
    """array<string> of lowercase subtokens of an identifier column —
    whole-stage-codegen expressions only."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, _ in _RULES:
        c = F.regexp_replace(c, pat, r"$1 $2")
    c = F.regexp_replace(c, _SEPS, " ")
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def _duck_subtokens(expr: str) -> str:
    """DuckDB twin of :func:`subtokens_col` (RE2 backreferences)."""
    out = expr
    for pat, _ in _RULES:
        out = f"regexp_replace({out}, '{pat}', '\\1 \\2', 'g')"
    out = f"regexp_replace({out}, '{_SEPS}', ' ', 'g')"
    return (
        f"list_filter(str_split(lower(trim({out})), ' '), t -> t <> '')"
    )


def with_ident(docs: DataFrame) -> DataFrame:
    """Derive the deterministic per-doc identifier ``w1_w2W3`` from the
    doc's first three whitespace tokens (snake boundary + camel
    boundary in one identifier)."""
    w = F.split(F.col("text"), r"\s+")
    ident = F.concat(
        w.getItem(0), F.lit("_"), w.getItem(1), F.initcap(w.getItem(2))
    )
    return docs.select("doc_id", ident.alias("ident"))


_DUCK_IDENT = (
    "w[1] || '_' || w[2] || upper(substr(w[3], 1, 1)) || substr(w[3], 2)"
)


def subtoken_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, ident, sub): exploded subtokens of each document's
    identifier — the code-search posting shape."""
    d = with_ident(docs)
    return d.select(
        "doc_id", "ident", F.explode(subtokens_col("ident")).alias("sub")
    )


def subtoken_search(
    spark: SparkSession, docs: DataFrame, sub: str = QUERY_SUBTOKEN,
    k: int = TOPK,
) -> DataFrame:
    """Docs whose identifier contains subtoken ``sub`` (exact subtoken
    equality, not substring — `parseHttpRequest` matches `http`, not
    `ttp`), top-k by doc_id for determinism → (doc_id, ident)."""
    p = subtoken_postings(docs)
    return (
        p.where(F.col("sub") == sub.lower())
        .select("doc_id", "ident")
        .distinct()
        .orderBy(F.asc("doc_id"))
        .limit(k)
    )


# --------------------------------------------------------------- oracle SQL

_IDENT_CTE = f"""
ident_t AS (
  SELECT doc_id, {_DUCK_IDENT} AS ident
  FROM (SELECT doc_id, str_split_regex(text, '\\s+') AS w FROM documents)
)"""


ORACLE_SQL = {
    "code_subtokens": f"""
WITH {_IDENT_CTE}
SELECT doc_id, ident, unnest({_duck_subtokens('ident')}) AS sub
FROM ident_t
""",
    "code_subtoken_search": f"""
WITH {_IDENT_CTE},
m AS (
  SELECT DISTINCT doc_id, ident
  FROM (SELECT doc_id, ident, unnest({_duck_subtokens('ident')}) AS sub
        FROM ident_t)
  WHERE sub = '{QUERY_SUBTOKEN}'
)
SELECT doc_id, ident FROM m ORDER BY doc_id ASC LIMIT {TOPK}
""",
}

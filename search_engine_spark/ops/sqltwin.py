"""Shared Spark↔DuckDB "twin" primitives.

Every op in this package needs the same deterministic building blocks on
both sides of the correctness gate:

- ``tokens_col``      — the frozen tokenizer (SURVEY §8.1) as a pure
  JVM-side array expression (split/btrim/rlike; ordered, so shingles
  work). Semantically identical to the build path's vectorized pandas
  tokenizer (`functions/tokenize.py`); cross-checked in
  tests/test_ops_parity.py.
- ``term_hash31``     — a 31-bit integer hash of a term derived from
  md5 (portable: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
  DuckDB ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``), reduced
  mod 2^31-1 so multiply-add hashing never overflows int64.
- matching DuckDB SQL fragments (``DUCK_*``) for the oracle twins.

Why md5 and not xxhash64: DuckDB has no xxhash64, and the correctness
gate demands the two engines agree bit-for-bit on integer hashes. md5 is
in both and is computed JVM-side in Spark (no UDF). The *engine's* doc
identity stays xxhash64 (sources/corpus.py); md5 here is only the
portable op-level token/content hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime
TRIM_SET = ".,:;/'\""  # frozen trim set §8.1 (whitespace gone after split)
MAX_TERM_LEN = 25

# The tokenizer's split set is Python's ``str.isspace()`` whitespace
# (the reference path splits with str.split()). Java's and RE2's ``\s``
# are ASCII-only, so both engine-side regexes use this explicit class —
# hex escapes are valid in java.util.regex AND RE2, and DuckDB standard
# string literals pass backslashes through untouched.
WS_CLASS = (
    r"[\t\n\x0B\f\r\x{1C}-\x{1F} \x{85}\x{A0}\x{1680}"
    r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"
)
WS_SPLIT_RE = WS_CLASS + "+"

# ---------------------------------------------------------------- Spark side


def tokens_col(text_col: str = "text") -> Column:
    """Ordered token array, frozen tokenizer §8.1, pure JVM expressions.

    USAGE RULE: never reference the returned expression from inside a
    higher-order-function lambda (transform/filter/aggregate body) —
    Catalyst does not CSE across the lambda boundary, so the split
    re-runs once per array element (quadratic in doc length,
    interpreted). Project it with ``.alias(...)`` first and reference
    the bound column instead (see ops/dedup.py::_shingle_sets).
    Passing it as the HOF's *array argument* is fine (evaluated once).
    """
    raw = F.split(F.lower(F.col(text_col)), WS_SPLIT_RE)
    trimmed = F.transform(raw, lambda t: F.btrim(t, F.lit(TRIM_SET)))
    return F.filter(
        trimmed,
        lambda t: (F.length(t) > 0)
        & (F.length(t) <= MAX_TERM_LEN)
        & t.rlike(r"^\p{L}+$"),
    )


def term_hash31(col: Column) -> Column:
    """Portable 31-bit term hash: first 60 md5 bits mod (2^31-1)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % F.lit(MERSENNE31)
    ).cast("long")


def term_hash60(col: Column) -> Column:
    """Portable 60-bit term hash: first 15 md5 hex chars as an integer
    (< 2^60, so exact in int64 on both engines)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_perm(h31: Column, j: int) -> Column:
    """j-th universal-hash permutation of a 31-bit hash: (a*h+b) mod p.

    a,b derive from fixed multipliers (Knuth 2654435761); products stay
    < 2^62 so int64 arithmetic is exact on both engines.
    """
    a = (2_654_435_761 * (j + 1)) % MERSENNE31
    b = (40_503 * (j + 7) + 1) % MERSENNE31
    return (F.lit(a) * h31 + F.lit(b)) % F.lit(MERSENNE31)


# --------------------------------------------------------------- DuckDB side

# NOTE: fragments are .format()-ed; literal braces must be doubled.

DUCK_TOKENS = (
    "list_filter("
    "list_transform(string_split_regex(lower({col}), '" + WS_SPLIT_RE.replace("{", "{{").replace("}", "}}") + "'),"
    " t -> trim(t, '.,:;/''\"')),"
    " t -> len(t) > 0 AND len(t) <= 25"
    " AND regexp_full_match(t, '\\p{{L}}+'))"
)


def duck_tokens(col: str = "text") -> str:
    return DUCK_TOKENS.format(col=col)


def duck_term_hash31(col: str) -> str:
    return (
        f"(CAST(concat('0x', substring(md5({col}), 1, 15)) AS BIGINT)"
        f" % {MERSENNE31})"
    )


def duck_term_hash60(col: str) -> str:
    return f"CAST(concat('0x', substring(md5({col}), 1, 15)) AS BIGINT)"


def duck_minhash_perm(h31_sql: str, j: int) -> str:
    a = (2_654_435_761 * (j + 1)) % MERSENNE31
    b = (40_503 * (j + 7) + 1) % MERSENNE31
    return f"(({a} * {h31_sql} + {b}) % {MERSENNE31})"

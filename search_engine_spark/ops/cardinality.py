"""HyperLogLog distinct-count estimation (per-group vocabulary size).

The scale problem this solves: "how many distinct tokens / urls / docs
per language" is a planning input everywhere in the build — sizing the
term dictionary, choosing `N_BUCKETS`, deciding whether a dimension is
broadcastable — but exact COUNT(DISTINCT) is a full shuffle of every
distinct value. HyperLogLog (Flajolet et al., AofA 2007) answers it in
m = 2^p integers per group with ~1.04/sqrt(m) relative error, and the
register table is MERGEABLE (elementwise max), so partial aggregation
caps the exchange at m rows per partition per group — the same
sketch-mergeability argument as `ops/sketch.py`, and how Spark's own
`approx_count_distinct` distributes. We re-express it instead of
calling it so the DuckDB twin reproduces the arithmetic bit-for-bit
(Spark's builtin hashes with xxhash64, which DuckDB lacks).

Determinism across engines:
- hash: the portable 60-bit md5 prefix (`sqltwin`-style conv/CAST) —
  low p bits pick the register, the remaining 60-p bits give the rank
  via `bin()` string length (both engines print minimal binary).
- the register sum is computed in EXACT int64: each register
  contributes 2^(54-M) (M ≤ 53, so the 256-register sum ≤ 2^62) —
  no float summation order can differ.
- only the final estimate touches doubles: one precomputed literal
  K = alpha_m * m^2 * 2^54 divided by the exact integer sum — a single
  IEEE-754 operation, bit-identical on both engines — then floored to
  BIGINT.

The raw HLL estimate is biased low-cardinality; the classic linear-
counting correction (m * ln(m/V) when E <= 2.5m and V zero registers
remain) needs a transcendental whose libm rounding the two engines
don't contractually share, so the gate output carries `n_zero_regs`
alongside the raw estimate and the *test* applies the correction —
`tests/test_cardinality.py` asserts the corrected estimate lands
within the published error envelope against exact truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.sqltwin import duck_tokens, tokens_col

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
# 60-bit hash: p register bits + 52 rank bits → max rank 53
_RANK_BITS = 60 - HLL_P
_MAX_RANK = _RANK_BITS + 1
_SUM_SHIFT = 54  # 2^(54-M) per register: 256 * 2^54 = 2^62 < int64 max
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # Flajolet et al. for m >= 128
# single-literal numerator → ONE double division on both engines
_K = _ALPHA * HLL_M * HLL_M * float(1 << _SUM_SHIFT)


def _h60(col):
    """Portable 60-bit non-negative hash (md5 prefix), exact in int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_registers(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """documents(text, group) → (group, reg, M): the HLL register table.

    One narrow pass: tokenize → explode → (reg, rank) per token →
    groupBy max. No distinct, no value shuffle — partial aggregation
    bounds the exchange at m rows per partition per group. Register
    tables from separate corpora union+max to the sketch of the union
    (mergeability — the property that makes this a cluster op).
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens_col("text")).alias("term"),
    )
    h = toks.select("grp", _h60(F.col("term")).alias("h60"))
    reg_rank = h.select(
        "grp",
        (F.col("h60") % F.lit(HLL_M)).cast("int").alias("reg"),
        F.expr(f"h60 div {HLL_M}").alias("w"),
    ).select(
        "grp",
        "reg",
        F.when(F.col("w") == 0, F.lit(_MAX_RANK))
        .otherwise(F.lit(_MAX_RANK) - F.length(F.bin(F.col("w"))))
        .cast("int")
        .alias("rank"),
    )
    return reg_rank.groupBy("grp", "reg").agg(F.max("rank").alias("M"))


def distinct_tokens_hll(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-group distinct-token estimate next to the exact truth:
    (grp, exact_distinct, hll_est, n_regs, n_zero_regs), ordered by grp.

    The exact column is the auditable ruler (it IS the expensive
    distinct shuffle this op exists to avoid); production callers drop
    it and keep the register table.
    """
    regs = hll_registers(docs, group_col)
    per_grp = regs.groupBy("grp").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_SUM_SHIFT} - M AS INT))")
        ).alias("sum_present"),
        F.count("*").alias("n_regs"),
    )
    est = per_grp.select(
        "grp",
        "n_regs",
        (F.lit(HLL_M) - F.col("n_regs")).cast("long").alias("n_zero_regs"),
        (
            F.col("sum_present")
            + (F.lit(HLL_M) - F.col("n_regs"))
            * F.lit(1 << _SUM_SHIFT).cast("long")
        ).alias("sum_scaled"),
    ).select(
        "grp",
        F.floor(F.lit(_K) / F.col("sum_scaled").cast("double"))
        .cast("long")
        .alias("hll_est"),
        "n_regs",
        "n_zero_regs",
    )
    exact = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens_col("text")).alias("term"),
        )
        .groupBy("grp")
        .agg(F.countDistinct("term").alias("exact_distinct"))
    )
    return (
        exact.join(est, "grp")
        .select("grp", "exact_distinct", "hll_est", "n_regs", "n_zero_regs")
        .orderBy("grp")
    )


def _duck_hll(group_col: str = "lang") -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS grp, unnest({duck_tokens('text')}) AS term
  FROM documents
), h AS (
  SELECT grp,
         (CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT)) AS h60
  FROM toks
), rr AS (
  SELECT grp,
         CAST(h60 % {HLL_M} AS INT) AS reg,
         CASE WHEN h60 // {HLL_M} = 0 THEN {_MAX_RANK}
              ELSE {_MAX_RANK} - length(bin(h60 // {HLL_M})) END AS rank
  FROM h
), regs AS (
  SELECT grp, reg, MAX(rank) AS M FROM rr GROUP BY grp, reg
), agg AS (
  SELECT grp,
         SUM((1::BIGINT << ({_SUM_SHIFT} - M)))::BIGINT AS sum_present,
         COUNT(*)::BIGINT AS n_regs
  FROM regs GROUP BY grp
), est AS (
  SELECT grp, n_regs,
         ({HLL_M} - n_regs)::BIGINT AS n_zero_regs,
         (sum_present + ({HLL_M} - n_regs) * (1::BIGINT << {_SUM_SHIFT}))
           AS sum_scaled
  FROM agg
), exact AS (
  SELECT grp, COUNT(DISTINCT term)::BIGINT AS exact_distinct
  FROM toks GROUP BY grp
)
SELECT e.grp AS grp, e.exact_distinct,
       CAST(floor({_K!r} / CAST(s.sum_scaled AS DOUBLE)) AS BIGINT) AS hll_est,
       s.n_regs, s.n_zero_regs
FROM exact e JOIN est s USING (grp)
ORDER BY grp
"""


ORACLE_SQL = {
    "text_distinct_hll": _duck_hll("lang"),
}

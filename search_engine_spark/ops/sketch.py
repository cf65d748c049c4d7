"""Count-Min-Sketch frequency estimation + heavy hitters.

The scale problem this solves: on a 10^12-file corpus the exact term-
frequency table IS the biggest shuffle in the build (the postings
groupBy). Pipeline decisions that only need *approximate* hot-term
frequencies — picking the df-adaptive salting threshold, spotting
stop-term candidates, pre-sizing WAND routing — shouldn't pay it. A
Count-Min Sketch (Cormode & Muthukrishnan, J. Algorithms 2005) gets
ε-additive estimates in d×w integers: here the exchange after map-side
partial aggregation is bounded by d·w rows per partition (the sketch
size), NOT by vocabulary size — the classic sketch-mergeability
argument, and exactly how Spark's own `count_min_sketch` aggregate
distributes (we re-express it instead of calling it so the DuckDB twin
can reproduce the arithmetic bit-for-bit: Spark's builtin uses
xxhash64/Murmur internally, which DuckDB lacks).

Hashing: the shared portable 31-bit md5 hash (`sqltwin.term_hash31`)
through the same (a·h+b) mod p universal family the MinHash ops use —
products stay < 2^62, so int64 arithmetic is exact on both engines.

CMS guarantees (d rows, width w): est ≥ true always (counts only ever
collide upward), and P[est > true + 2N/w] < (1/2)^d for N total tokens.
The gate query surfaces est alongside the exact count so the bound is
visible in the output, and `tests/test_sketch.py` asserts both
properties plus the ε bound on the fixture corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.sqltwin import (
    MERSENNE31,
    duck_minhash_perm,
    duck_term_hash31,
    duck_tokens,
    minhash_perm,
    term_hash31,
    tokens_col,
)

CMS_DEPTH = 4
CMS_WIDTH = 512
TOPK = 20


def cms_sketch(docs: DataFrame, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH) -> DataFrame:
    """documents(text) → the sketch table (row, bucket, cnt).

    One narrow pass: tokenize → explode → d bucket columns per token
    (stacked) → groupBy(row, bucket). Partial aggregation caps the
    exchange at d·w rows per input partition regardless of vocabulary.
    """
    toks = docs.select(F.explode(tokens_col("text")).alias("term"))
    h = toks.select(term_hash31(F.col("term")).alias("h31"))
    rows = h.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    (minhash_perm(F.col("h31"), i) % F.lit(width))
                    .cast("int").alias("bucket"),
                )
                for i in range(depth)
            ])
        ).alias("rb")
    )
    return (
        rows.groupBy(F.col("rb.row").alias("row"),
                     F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def heavy_hitters_cms(docs: DataFrame, depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH, k: int = TOPK) -> DataFrame:
    """Top-k exact terms with their CMS estimate alongside the truth:
    (term, exact_cnt, cms_cnt), ordered by (-exact_cnt, term).

    The probe set is the exact top-k (deterministic tie-break on term)
    so the gate output is stable; at production scale the probe set
    would come from a candidate stream and the exact column would be
    dropped — the sketch is the point, the exact count here is the
    auditable ruler it's graded against.
    """
    sketch = cms_sketch(docs, depth, width)
    exact = (
        docs.select(F.explode(tokens_col("text")).alias("term"))
        .groupBy("term").agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
        .limit(k)
    )
    probes = exact.withColumn("h31", term_hash31(F.col("term"))).select(
        "term", "exact_cnt",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    (minhash_perm(F.col("h31"), i) % F.lit(width))
                    .cast("int").alias("bucket"),
                )
                for i in range(depth)
            ])
        ).alias("rb"),
    ).select("term", "exact_cnt", "rb.row", "rb.bucket")
    # the whole sketch is d·w rows — broadcast it; ONE join, no matter
    # how many probes
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cnt").alias("cms_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
    )


def _duck_cms(depth: int, width: int, k: int) -> str:
    h = duck_term_hash31("term")
    bucket_exprs = "\nUNION ALL\n".join(
        f"SELECT {i} AS row, ({duck_minhash_perm('h31', i)}) % {width} AS bucket"
        f" FROM h"
        for i in range(depth)
    )
    probe_buckets = ",\n       ".join(
        f"({duck_minhash_perm('h31', i)}) % {width} AS b{i}"
        for i in range(depth)
    )
    min_est = ", ".join(
        f"(SELECT cnt FROM sketch s WHERE s.row = {i} AND s.bucket = p.b{i})"
        for i in range(depth)
    )
    return f"""
WITH toks AS (
  SELECT unnest({duck_tokens('text')}) AS term FROM documents
), h AS (
  SELECT {h} AS h31 FROM toks
), rb AS (
  {bucket_exprs}
), sketch AS (
  SELECT row, bucket, COUNT(*)::BIGINT AS cnt FROM rb GROUP BY row, bucket
), exact AS (
  SELECT term, COUNT(*)::BIGINT AS exact_cnt
  FROM toks GROUP BY term
  ORDER BY exact_cnt DESC, term ASC LIMIT {k}
), p AS (
  SELECT term, exact_cnt,
       {probe_buckets}
  FROM (SELECT term, exact_cnt, {h} AS h31 FROM exact)
)
SELECT term, exact_cnt, least({min_est}) AS cms_cnt
FROM p
ORDER BY exact_cnt DESC, term ASC
"""


ORACLE_SQL = {
    "text_heavy_hitters_cms": _duck_cms(CMS_DEPTH, CMS_WIDTH, TOPK),
}


# --------------------------------------------- bottom-k quantile sketch

QSK_K = 256        # sample size per group
QSK_SEED = "qsk1"  # hash namespace (independent of the sampling ops)


def _qsk_hash(event_id_col):
    """Deterministic 31-bit rank hash of an event id under the sketch's
    own namespace — the bottom-k ORDER, not a threshold."""
    key = F.concat(event_id_col.cast("string"), F.lit(":" + QSK_SEED))
    return term_hash31(key)


def quantile_sketch_bottomk(events: DataFrame, k: int = QSK_K) -> DataFrame:
    """Per-type approximate p50/p90/p99 of ``value`` from a bottom-k
    hash sample → (event_type, n_sample, q50, q90, q99).

    The third member of the mergeable-sketch family (with CMS counts
    and HLL cardinalities): keep the k rows whose rank hash is SMALLEST
    per group (Cohen & Kaplan's bottom-k sketches, PODC 2007). Bottom-k
    is a uniform sample that merges exactly — bottom-k(A ∪ B) =
    bottom-k(bottom-k(A) ∪ bottom-k(B)) — so at 10^12 rows each
    partition keeps its local k and only k rows per partition ever
    reach the exchange, never the column. Quantiles over the sample use
    the same deterministic discrete rule as rel_value_quantiles (rank
    ceil(p·m) of the value-sorted sample), so the whole sketch is a
    pure function of the input and the DuckDB twin is exact, not
    approximate-vs-approximate.

    Plan: the rank-hash window and the value window share one
    event_type exchange; with AQE the second sort sees ≤ k rows/group.
    """
    ranked = (
        events.select(
            "event_type", "value", "event_id",
            _qsk_hash(F.col("event_id")).alias("hrank"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("hrank", "event_id")
            ),
        )
        .where(F.col("rn") <= k)
    )
    vw = Window.partitionBy("event_type").orderBy("value", "event_id")
    sampled = ranked.withColumn("vrn", F.row_number().over(vw)).withColumn(
        "m", F.count("*").over(Window.partitionBy("event_type"))
    )

    def at(num: int, den: int):
        target = F.expr(f"({num} * m + {den} - 1) div {den}")
        return F.max(F.when(F.col("vrn") == target, F.col("value")))

    return sampled.groupBy("event_type").agg(
        F.max("m").cast("long").alias("n_sample"),
        at(1, 2).alias("q50"),
        at(9, 10).alias("q90"),
        at(99, 100).alias("q99"),
    )


def _duck_qsk(k: int = QSK_K) -> str:
    h = duck_term_hash31(f"concat(CAST(event_id AS VARCHAR), ':{QSK_SEED}')")
    return f"""
WITH ranked AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {h}, event_id) AS rn
  FROM events
),
sampled AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS vrn,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM ranked WHERE rn <= {k}
)
SELECT event_type,
       CAST(max(m) AS BIGINT) AS n_sample,
       max(CASE WHEN vrn = (1 * m + 1) // 2 THEN value END) AS q50,
       max(CASE WHEN vrn = (9 * m + 9) // 10 THEN value END) AS q90,
       max(CASE WHEN vrn = (99 * m + 99) // 100 THEN value END) AS q99
FROM sampled
GROUP BY event_type
"""


ORACLE_SQL["sketch_quantiles_bottomk"] = _duck_qsk()

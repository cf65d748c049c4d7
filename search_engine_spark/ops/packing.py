"""Sequence packing for LLM training data (concat-and-chunk).

The op every pretraining pipeline runs last: lay the corpus out as one
token stream in a deterministic document order and cut it into fixed-
length training sequences (GPT-2/3 style packing — documents are
concatenated and chunked, a document may straddle a boundary). The
deliverables are the *placement map* (where each document lands:
byte-offset analogue in tokens, first/last sequence id) and the
*per-sequence occupancy* (how many docs/tokens each training sequence
contains) — the inputs a sharded tokenizer-writer needs to emit
training shards without ever materializing the concatenated stream.

Scale design — the global prefix sum is the whole problem. A naive
`SUM(n) OVER (ORDER BY doc_id)` window has no PARTITION BY, so Spark
moves the corpus to ONE task (WindowExec warns exactly this). We run
the textbook two-phase distributed scan instead:

  1. range-repartition by doc_id (P ordered partitions),
  2. intra-partition cumsum with a window PARTITIONED by the Spark
     partition id (parallel, no global sort of rows through one task),
  3. per-partition totals (P rows) get their own tiny cumsum and are
     broadcast-joined back as base offsets.

P scales with the corpus; the only serial state is the P-row offset
table. The DuckDB twin is the plain single-threaded window cumsum, so
the gate proves the distributed scan computes exactly the sequential
semantics.

Zero-token documents (everything the frozen tokenizer drops) are
excluded from the stream — they'd otherwise alias onto the next doc's
offset and every downstream shard-writer would need the same special
case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.sqltwin import duck_tokens, tokens_col

SEQ_LEN = 2048
PACK_PARTITIONS = 32  # P: ordered ranges; config-only to raise at scale


def doc_offsets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, offset): each doc's start position in the
    concatenated token stream, in ascending doc_id order — via the
    two-phase distributed prefix sum described in the module docstring.
    """
    counted = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.size(tokens_col("text")).cast("long").alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
    )
    parts = (
        counted.repartitionByRange(PACK_PARTITIONS, "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    # phase 1: parallel intra-partition scan (window HAS a partition key)
    w = Window.partitionBy("pid").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = parts.withColumn("local_cum", F.sum("n_tokens").over(w))
    # phase 2: P-row partition totals → base offsets (tiny, broadcast)
    totals = parts.groupBy("pid").agg(F.sum("n_tokens").alias("ptotal"))
    # exclusive prefix over the P-row totals: sum of strictly-earlier
    # partitions (unpartitioned window, but over P rows, not the corpus)
    wt_excl = Window.orderBy("pid") \
        .rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.withColumn(
        "base", F.coalesce(F.sum("ptotal").over(wt_excl), F.lit(0))
    ).select("pid", "base")
    return (
        local.join(F.broadcast(bases), "pid")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("base") + F.col("local_cum") - F.col("n_tokens"))
            .alias("offset"),
        )
    )


def pack_sequences(docs: DataFrame, seq_len: int = SEQ_LEN,
                   id_col: str = "doc_id") -> DataFrame:
    """Placement map: (doc_id, n_tokens, offset, seq_first, seq_last,
    n_seqs) ordered by doc_id — which training sequences each document
    occupies after concat-and-chunk at `seq_len`."""
    off = doc_offsets(docs, id_col)
    return off.select(
        "doc_id",
        "n_tokens",
        "offset",
        F.expr(f"offset div {seq_len}").alias("seq_first"),
        F.expr(f"(offset + n_tokens - 1) div {seq_len}").alias("seq_last"),
        (
            F.expr(f"(offset + n_tokens - 1) div {seq_len}")
            - F.expr(f"offset div {seq_len}")
            + F.lit(1)
        ).alias("n_seqs"),
    ).orderBy("doc_id")


def sequence_occupancy(docs: DataFrame, seq_len: int = SEQ_LEN,
                       id_col: str = "doc_id") -> DataFrame:
    """Per-sequence occupancy: (seq_id, n_docs, n_tokens, n_boundary_docs)
    — how full each training sequence is and how many docs straddle into
    it from the previous one. A doc spanning sequences [s0, s1]
    contributes min((s+1)L, offset+n) - max(sL, offset) tokens to each s
    in the span; the explode is bounded by n_tokens/L + 1 per doc."""
    placed = pack_sequences(docs, seq_len, id_col)
    per_seq = placed.select(
        "doc_id", "n_tokens", "offset",
        F.explode(F.sequence("seq_first", "seq_last")).alias("seq_id"),
    ).select(
        "seq_id",
        "doc_id",
        (
            F.least((F.col("seq_id") + 1) * seq_len,
                    F.col("offset") + F.col("n_tokens"))
            - F.greatest(F.col("seq_id") * seq_len, F.col("offset"))
        ).alias("tok_in_seq"),
        (F.col("offset") < F.col("seq_id") * seq_len).cast("int")
        .alias("straddles_in"),
    )
    return (
        per_seq.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok_in_seq").alias("n_tokens"),
            F.sum("straddles_in").cast("long").alias("n_boundary_docs"),
        )
        .orderBy("seq_id")
    )


def _duck_pack(seq_len: int) -> str:
    return f"""
WITH counted AS (
  SELECT doc_id, len({duck_tokens('text')})::BIGINT AS n_tokens
  FROM documents
), nz AS (
  SELECT * FROM counted WHERE n_tokens > 0
), off AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS off0
  FROM nz
)
SELECT doc_id, n_tokens, off0 AS "offset",
       off0 // {seq_len} AS seq_first,
       (off0 + n_tokens - 1) // {seq_len} AS seq_last,
       ((off0 + n_tokens - 1) // {seq_len} - off0 // {seq_len} + 1)::BIGINT
         AS n_seqs
FROM off
ORDER BY doc_id
"""


def _duck_occupancy(seq_len: int) -> str:
    return f"""
WITH counted AS (
  SELECT doc_id, len({duck_tokens('text')})::BIGINT AS n_tokens
  FROM documents
), nz AS (
  SELECT * FROM counted WHERE n_tokens > 0
), off AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS off0
  FROM nz
), spans AS (
  SELECT doc_id, n_tokens, off0,
         unnest(generate_series(off0 // {seq_len},
                                (off0 + n_tokens - 1) // {seq_len}))
           AS seq_id
  FROM off
)
SELECT seq_id,
       COUNT(*)::BIGINT AS n_docs,
       SUM(least((seq_id + 1) * {seq_len}, off0 + n_tokens)
           - greatest(seq_id * {seq_len}, off0))::BIGINT AS n_tokens,
       SUM(CASE WHEN off0 < seq_id * {seq_len} THEN 1 ELSE 0 END)::BIGINT
         AS n_boundary_docs
FROM spans
GROUP BY seq_id
ORDER BY seq_id
"""


ORACLE_SQL = {
    "pack_sequences": _duck_pack(SEQ_LEN),
    "pack_occupancy": _duck_occupancy(SEQ_LEN),
}

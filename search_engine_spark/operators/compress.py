"""Compressed inverted-index blocks: salted repartition-by-term encode,
and the matching decode (SURVEY §1.2 index layout; north_star).

Layout
------
Each posting list is split by a **doc_id-range salt** (the top
``salt_bits`` bits of the sign-bias-shifted doc_id). Because doc_id is
a uniform hash, salts are balanced; because the salt is the doc_id's
high bits, the (salt, block_id) order IS global doc_id order — so
blocks stay usable for ordered traversal (block-max WAND) while hot
terms fan out across 2^salt_bits reducers instead of melting one
(SURVEY §7 watch item 2; the reference's analogue is Postgres row
locking spreading work across 4×3 indexer workers, §2.6 I1).

The ``groupBy(term, salt).applyInPandas`` *is* the salted repartition:
Catalyst plans one hash exchange on exactly those keys; no separate
``repartition()`` pass is needed.

Block rows
----------
``(bucket, term, salt, block_id, n, first_doc, last_doc, doc_gaps
BINARY, tfs BINARY, dls BINARY, max_tf INT, min_dl INT)`` — delta+VByte
frame-of-reference doc gaps, VByte tf and dl runs, and the per-block
``(max tf, min dl)`` pair. The BM25 term-partial
``tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))`` is monotone increasing in tf
and decreasing in dl, so ``partial(max_tf, min_dl, avgdl)`` evaluated
with the CURRENT corpus avgdl upper-bounds every posting in the block
(``UB(block) = idf · partial(max_tf, min_dl)``; idf is a term-level
factor kept in the terms table). Storing the pair instead of a baked
max-partial keeps blocks valid when corpus stats drift — the property
that makes segmented incremental ingest (extend_index) sound: old
generations' blocks never go stale. 128 postings/block default.

The index table is written ``partitionBy(bucket)`` (bucket =
``pmod(xxhash64(term), term_buckets)``) and sorted by (term, salt,
block_id) within files, so a query's term filter prunes directories
first and parquet row groups second.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1, EngineConfig
from search_engine_spark.functions.vbyte import (
    decode_doc_gaps,
    encode_doc_gaps,
    vbyte_decode,
    vbyte_encode,
)

BLOCKS_SCHEMA = (
    "bucket int, term string, salt int, block_id int, n int, "
    "first_doc long, last_doc long, doc_gaps binary, tfs binary, "
    "dls binary, max_tf int, min_dl int"
)

SIGN_BIT = -(1 << 63)  # long with only the sign bit set


def salt_col(doc_id_col, salt_bits: int):
    """Top ``salt_bits`` bits of the bias-shifted doc_id (0..2^bits-1).

    XOR with the sign bit converts signed order → unsigned order, so
    salt ranges are contiguous, ordered doc_id intervals.
    """
    return F.shiftrightunsigned(
        doc_id_col.bitwiseXOR(F.lit(SIGN_BIT)), 64 - salt_bits
    ).cast("int")


def bucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def _encode_group(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """One (bucket, term, salt) group of postings → block rows."""
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    doc = pdf["doc_id"].to_numpy(dtype=np.int64)
    tf = pdf["tf"].to_numpy(dtype=np.int64)
    dl = pdf["dl"].to_numpy(dtype=np.int64)
    term = pdf["term"].iloc[0]
    bucket = int(pdf["bucket"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    out = []
    for bi, s in enumerate(range(0, len(doc), block_size)):
        e = min(s + block_size, len(doc))
        first, gap_bytes = encode_doc_gaps(doc[s:e])
        out.append(
            {
                "bucket": bucket,
                "term": term,
                "salt": salt,
                "block_id": bi,
                "n": e - s,
                "first_doc": int(doc[s]),
                "last_doc": int(doc[e - 1]),
                "doc_gaps": gap_bytes,
                "tfs": vbyte_encode(tf[s:e].astype(np.uint64)),
                "dls": vbyte_encode(dl[s:e].astype(np.uint64)),
                "max_tf": int(tf[s:e].max()),
                "min_dl": int(dl[s:e].min()),
            }
        )
    return pd.DataFrame(out)


def block_max_partial(max_tf, min_dl, avgdl: float,
                      k1: float = BM25_K1, b: float = BM25_B):
    """Per-block BM25 term-partial upper bound from the stored
    (max_tf, min_dl) pair and the CURRENT avgdl (NumPy or scalars).
    Valid because the partial is monotone ↑ in tf and ↓ in dl."""
    return (max_tf * (k1 + 1.0)) / (
        max_tf + k1 * (1.0 - b + b * min_dl / avgdl)
    )


def encode_blocks(postings: DataFrame,
                  cfg: EngineConfig | None = None,
                  term_df: DataFrame | None = None) -> DataFrame:
    """postings (doc_id, term, tf, dl) → compressed block rows.

    Needs no corpus stats: block metadata is (max_tf, min_dl), bounded
    at query time against whatever avgdl the corpus has by then.

    ``term_df`` (term, df) enables df-adaptive salting (SURVEY §7 watch
    item 2): terms with df < ``cfg.rare_salt_df_threshold`` encode as a
    single unsalted group (salt = -1) — the Zipf long tail stops
    producing 2^salt_bits near-singleton blocks per term. Only the
    FREQUENT subset is joined (size ≤ Σdf / threshold, a Zipf-bounded
    fraction of the vocabulary), broadcast as the salt map; rare terms
    fall out of the left join as NULL. Exactness of WAND under the
    mixed layout is argued in plans/query.py::_wand_blocks.
    """
    cfg = cfg or EngineConfig()
    bs = cfg.block_size
    thr = (
        cfg.block_size
        if cfg.rare_salt_df_threshold is None
        else cfg.rare_salt_df_threshold
    )

    range_salt = salt_col(F.col("doc_id"), cfg.salt_bits)
    if term_df is not None and thr > 0:
        freq = term_df.where(F.col("df") >= thr).select(
            "term", F.lit(True).alias("__freq")
        )
        with_keys = (
            postings.join(F.broadcast(freq), "term", "left")
            .withColumn(
                "salt",
                F.when(F.col("__freq").isNotNull(), range_salt)
                .otherwise(F.lit(-1))
                .cast("int"),
            )
            .drop("__freq")
        )
    else:
        with_keys = postings.withColumn("salt", range_salt)
    with_keys = with_keys.withColumn(
        "bucket", bucket_col(F.col("term"), cfg.term_buckets)
    )

    # pre-partition on exactly the grouping keys: applyInPandas needs a
    # ClusteredDistribution on them, so this single exchange doubles as
    # (a) the salted repartition-by-term and (b) an explicit cap on how
    # many Python workers run concurrently (cfg.python_parallelism).
    if cfg.python_parallelism:
        with_keys = with_keys.repartition(
            cfg.python_parallelism, "bucket", "term", "salt"
        )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        from search_engine_spark.functions.runtime import disable_thp

        disable_thp()
        return _encode_group(pdf, bs)

    return with_keys.groupBy("bucket", "term", "salt").applyInPandas(
        encode, schema=BLOCKS_SCHEMA
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Block rows → exploded postings (term, doc_id, tf, dl)."""
    terms, docs, tfs, dls = [], [], [], []
    for r in pdf.itertuples(index=False):
        d = decode_doc_gaps(r.first_doc, bytes(r.doc_gaps), r.n)
        t = vbyte_decode(bytes(r.tfs))
        ln = vbyte_decode(bytes(r.dls))
        docs.append(d)
        tfs.append(t)
        dls.append(ln)
        terms.append(np.repeat(r.term, r.n))
    if not terms:
        return pd.DataFrame(
            {"term": pd.Series([], dtype="object"),
             "doc_id": pd.Series([], dtype="int64"),
             "tf": pd.Series([], dtype="int32"),
             "dl": pd.Series([], dtype="int32")}
        )
    return pd.DataFrame(
        {
            "term": np.concatenate(terms),
            "doc_id": np.concatenate(docs).astype(np.int64),
            "tf": np.concatenate(tfs).astype(np.int32),
            "dl": np.concatenate(dls).astype(np.int32),
        }
    )


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Compressed block rows → postings (term, doc_id, tf, dl).

    Arrow-batched; decode cost is proportional to blocks actually read,
    which bucket/term pushdown has already pruned.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from search_engine_spark.functions.runtime import disable_thp

        disable_thp()
        for pdf in batches:
            yield _decode_batch(pdf)

    return blocks.select(
        "term", "n", "first_doc", "doc_gaps", "tfs", "dls"
    ).mapInPandas(mapper, schema="term string, doc_id long, tf int, dl int")


def write_index_blocks(blocks: DataFrame, path: str) -> None:
    """Persist the index: directory-partitioned by (gen, bucket),
    file-sorted by (term, salt, block_id) for row-group min/max pruning
    on term. ``gen`` is the ingest generation (extend_index); with
    dynamic partition overwrite, writing generation g replaces only
    gen=g directories — older segments are untouched."""
    (
        blocks.repartition("bucket")
        .sortWithinPartitions("term", "salt", "block_id")
        .write.mode("overwrite")
        .partitionBy("gen", "bucket")
        .parquet(path)
    )

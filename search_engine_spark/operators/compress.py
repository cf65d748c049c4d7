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
    decode_ints,
    encode_doc_gaps,
    encode_ints,
    encode_runs_framed,
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


def _encode_group(pdf: pd.DataFrame, block_size: int,
                  codec: str = "auto") -> pd.DataFrame:
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
        first, gap_bytes = encode_doc_gaps(doc[s:e], codec=codec)
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
                "tfs": encode_ints(tf[s:e].astype(np.uint64), codec),
                "dls": encode_ints(dl[s:e].astype(np.uint64), codec),
                "max_tf": int(tf[s:e].max()),
                "min_dl": int(dl[s:e].min()),
            }
        )
    return pd.DataFrame(out)


def _encode_runs(pdf: pd.DataFrame, block_size: int,
                 codec: str = "auto") -> pd.DataFrame:
    """Vectorized many-groups encoder: a chunk of postings rows sorted by
    (term, salt, doc_id) and covering only COMPLETE (term, salt) groups
    → block rows, with ONE VByte call per column for the whole chunk.

    Produces byte-identical blocks to ``_encode_group`` (same sort, same
    block splits, same codecs) — property-tested in
    tests/test_compressed_index.py. The win over per-group
    ``applyInPandas`` is purely mechanical: group count ≈ vocabulary, so
    per-group Python/pandas overhead dominates the grouped path on Zipf
    vocabularies, while here the per-chunk cost is O(rows) NumPy plus a
    byte-slice loop over blocks (rows / block_size, ~1% of rows).
    """
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            {k: pd.Series([], dtype=d) for k, d in _EMPTY_BLOCK_DTYPES}
        )
    term = pdf["term"].to_numpy(dtype=object)
    salt = pdf["salt"].to_numpy(dtype=np.int32)
    bucket = pdf["bucket"].to_numpy(dtype=np.int32)
    doc = pdf["doc_id"].to_numpy(dtype=np.int64)
    tf = pdf["tf"].to_numpy(dtype=np.int64)
    dl = pdf["dl"].to_numpy(dtype=np.int64)

    # group starts: (term, salt) change points (rows pre-sorted)
    start = np.empty(n, dtype=bool)
    start[0] = True
    if n > 1:
        start[1:] = (term[1:] != term[:-1]) | (salt[1:] != salt[:-1])
    gstarts = np.flatnonzero(start)
    gidx = np.cumsum(start) - 1  # group index per row
    roff = np.arange(n, dtype=np.int64) - gstarts[gidx]  # offset in group

    # block boundaries: every block_size-th row of each group. Group
    # starts are always block starts, so consecutive bstarts delimit
    # blocks globally (no group spans a gap between bstarts).
    bmask = (roff % block_size) == 0
    bstarts = np.flatnonzero(bmask)
    bends = np.append(bstarts[1:], n)
    nper = (bends - bstarts).astype(np.int32)
    block_id = (roff[bstarts] // block_size).astype(np.int32)

    # delta gaps in bias-shifted unsigned space; one VByte pass for all
    # blocks' gaps, then slice per block by cumulative byte offsets
    biased = doc.astype(np.uint64) + np.uint64(1 << 63)
    is_gap = ~bmask  # row carries gap (biased[i] - biased[i-1])
    gap_vals = (biased[1:] - biased[:-1])[is_gap[1:]]
    gaps_per_block = nper.astype(np.int64) - 1
    gap_off = np.zeros(len(bstarts) + 1, dtype=np.int64)
    np.cumsum(gaps_per_block, out=gap_off[1:])
    # framed dual-codec runs (VByte or bit-packed, per-run pick) — one
    # vectorized many-runs pass per column, byte-identical to the
    # grouped kernel's per-block encode_ints
    doc_gaps = encode_runs_framed(gap_vals, gap_off[:-1], gap_off[1:],
                                  codec=codec)
    tfs = encode_runs_framed(tf.astype(np.uint64), bstarts, bends,
                             codec=codec)
    dls = encode_runs_framed(dl.astype(np.uint64), bstarts, bends,
                             codec=codec)

    return pd.DataFrame(
        {
            "bucket": bucket[bstarts],
            "term": term[bstarts],
            "salt": salt[bstarts],
            "block_id": block_id,
            "n": nper,
            "first_doc": doc[bstarts],
            "last_doc": doc[bends - 1],
            "doc_gaps": doc_gaps,
            "tfs": tfs,
            "dls": dls,
            "max_tf": np.maximum.reduceat(tf, bstarts).astype(np.int32),
            "min_dl": np.minimum.reduceat(dl, bstarts).astype(np.int32),
        }
    )


_EMPTY_BLOCK_DTYPES = [
    ("bucket", "int32"), ("term", "object"), ("salt", "int32"),
    ("block_id", "int32"), ("n", "int32"), ("first_doc", "int64"),
    ("last_doc", "int64"), ("doc_gaps", "object"), ("tfs", "object"),
    ("dls", "object"), ("max_tf", "int32"), ("min_dl", "int32"),
]


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
    codec = cfg.codec
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

    if cfg.encode_kernel == "grouped":
        # pre-partition on exactly the grouping keys: applyInPandas
        # needs a ClusteredDistribution on them, so this single exchange
        # doubles as (a) the salted repartition-by-term and (b) an
        # explicit cap on concurrent Python workers.
        if cfg.python_parallelism:
            with_keys = with_keys.repartition(
                cfg.python_parallelism, "bucket", "term", "salt"
            )

        def encode(pdf: pd.DataFrame) -> pd.DataFrame:
            from search_engine_spark.functions.runtime import disable_thp

            disable_thp()
            return _encode_group(pdf, bs, codec=cfg.codec)

        return with_keys.groupBy("bucket", "term", "salt").applyInPandas(
            encode, schema=BLOCKS_SCHEMA
        )

    # "batch" kernel: hash-exchange on (term, salt) — the SAME salted
    # repartition-by-term, a group never splits across partitions —
    # then sort within partitions so groups are contiguous AND doc_id-
    # sorted, and stream Arrow batches through the vectorized many-
    # groups encoder. A (term, salt) group that spans Arrow batches is
    # carried forward until its end is seen, so memory is bounded by
    # the largest single group (≤ df / 2^salt_bits postings for salted
    # terms, < rare-threshold for unsalted ones), not the partition.
    # unlike the grouped path, no python_parallelism cap: the streaming
    # kernel touches each page once (no per-group fault storms), so one
    # partition per shuffle slot is the right width at every core count
    n_parts = int(
        with_keys.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"
        )
    )
    sorted_parts = with_keys.repartition(
        n_parts, "term", "salt"
    ).sortWithinPartitions("term", "salt", "doc_id")

    def encode_stream(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from search_engine_spark.functions.runtime import disable_thp

        disable_thp()
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                pending = None
                continue
            term = pdf["term"].to_numpy(dtype=object)
            salt = pdf["salt"].to_numpy()
            # start index of the LAST group in this chunk — that group
            # may continue into the next Arrow batch, so hold it back
            change = np.flatnonzero(
                (term[1:] != term[:-1]) | (salt[1:] != salt[:-1])
            )
            last_start = int(change[-1]) + 1 if change.size else 0
            if last_start == 0:
                pending = pdf  # single (possibly still open) group
                continue
            yield _encode_runs(pdf.iloc[:last_start], bs, codec=codec)
            pending = pdf.iloc[last_start:]
        if pending is not None and len(pending):
            yield _encode_runs(pending, bs, codec=codec)

    return sorted_parts.mapInPandas(encode_stream, schema=BLOCKS_SCHEMA)


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Block rows → exploded postings (term, doc_id, tf, dl)."""
    terms, docs, tfs, dls = [], [], [], []
    for r in pdf.itertuples(index=False):
        d = decode_doc_gaps(r.first_doc, bytes(r.doc_gaps), r.n)
        t = decode_ints(bytes(r.tfs), r.n)
        ln = decode_ints(bytes(r.dls), r.n)
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

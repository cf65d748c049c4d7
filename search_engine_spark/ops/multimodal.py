"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries image/audio/video as ``binary``
columns with a typed metadata struct, decoded batch-wise in Arrow-backed
pandas UDFs. The decode libraries (PIL/ffmpeg/etc.) are NOT in this
container, so the decode kernel is a clearly marked STUB — but all the
Spark-side plumbing is real and tested: schema, column pruning, Arrow
batch shape, ``mapInPandas`` signature, deterministic output.

``with_blob`` synthesizes the binary column from ``documents.text``
(utf-8 bytes) so the pipeline runs on the driver's tables without
external data; on a real corpus the blob comes from the source table
and everything downstream is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, byte_mean_e4 long, byte_head string"
)


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload + typed metadata (media_type, n_bytes,
    sha256) — pure JVM expressions, SQL-oracle-checkable."""
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        blob.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.length(blob).cast("int").alias("n_bytes"),
            F.sha2(blob, 256).alias("sha256"),
        ).alias("meta"),
    )


def blob_metadata(docs: DataFrame) -> DataFrame:
    """Flat metadata projection (the oracle-checked query surface)."""
    b = with_blob(docs)
    return b.select(
        "doc_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB for the real decoder (image resize / audio resample / video
    frame-sample). Raises for real media types; produces a deterministic
    fake feature row for text/plain so the distributed plumbing is
    testable end-to-end without PIL/ffmpeg."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg — not available in this "
        "container; text/plain is handled by the deterministic fake path"
    )


def extract_features(blobs: DataFrame) -> DataFrame:
    """Batch feature extraction over the binary column via mapInPandas.

    Column pruning: only (doc_id, payload, media_type) cross the Arrow
    boundary. The per-batch kernel is vectorized over the batch; the
    fake feature (byte mean + hex head) stands in for an embedding.
    """
    pruned = blobs.select(
        "doc_id", "payload", F.col("meta.media_type").alias("media_type")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            real_media = pdf[pdf["media_type"] != "text/plain"]
            if len(real_media):
                _decode_stub(real_media["payload"].iloc[0])  # NotImplementedError
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.str.len().astype("int32"),
                    # integer-exact fixed-point mean (×10^4): avoids any
                    # float-rounding divergence vs the SQL oracle
                    "byte_mean_e4": payloads.map(
                        lambda b: (sum(b) * 10_000) // len(b) if len(b) else 0
                    ).astype("int64"),
                    "byte_head": payloads.map(lambda b: bytes(b[:8]).hex()),
                }
            )

    return pruned.mapInPandas(kernel, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------- oracle SQL

ORACLE_SQL = {
    "mm_blob_metadata": """
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       sha256(text) AS sha256
FROM documents
""",
    # NOTE: assumes ASCII text (chars == bytes); holds for the driver's
    # documents table and is asserted in tests/test_ops_parity.py.
    # CAST to BIGINT: DuckDB's integer expression here is HUGEINT (int128),
    # which the hash comparer reads as float64 — Spark emits BIGINT.
    # CASE guard: empty payload → 0 on both engines (Spark kernel returns 0).
    "mm_extract_features": """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(CASE WHEN octet_length(encode(text)) > 0 THEN
         (list_sum(list_transform(regexp_extract_all(text, '(?s).'),
                                  c -> unicode(c))) * 10000)
           // octet_length(encode(text))
       ELSE 0 END AS BIGINT) AS byte_mean_e4,
       lower(hex(encode(substring(text, 1, 8)))) AS byte_head
FROM documents
""",
}

"""Streaming MinHash-LSH near-dup candidates (streaming/lsh.py):
row-local signatures must equal the batch shuffle-built ones, the
deduped pair stream must equal ``lsh_candidate_pairs`` on the same
rows, and a saturated bucket must stop admitting."""

from __future__ import annotations

import sys
from datetime import datetime, timedelta
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from search_engine_spark.ops import dedup  # noqa: E402
from search_engine_spark.streaming.dedup import DOCS_STREAM_SCHEMA, read_docs_stream  # noqa: E402
from search_engine_spark.streaming.lsh import lsh_pairs_stream, row_signatures  # noqa: E402

T0 = datetime(2024, 1, 1, 12, 0, 0)

# near-dup families (shared shingles) + singletons, all within horizon
SPEC = [
    (1, 0, "alpha beta gamma delta epsilon zeta"),
    (2, 1, "alpha beta gamma delta epsilon eta"),    # near-dup of 1
    (3, 2, "alpha beta gamma delta epsilon zeta"),   # exact text of 1
    (4, 3, "one two three four five six seven"),
    (5, 4, "one two three four five six eight"),     # near-dup of 4
    (6, 5, "totally unrelated words appear here"),
    (7, 6, "numbers only 123 456"),                  # tokens drop digits
]


def _rows(spec):
    return [
        (i, T0 + timedelta(minutes=m), text, "en", "synth")
        for (i, m, text) in spec
    ]


@pytest.fixture(scope="module")
def batch_df(spark):
    return spark.createDataFrame(_rows(SPEC), DOCS_STREAM_SCHEMA)


def test_row_signatures_equal_batch(spark, batch_df):
    got = {
        r["doc_id"]: list(r["sig"])
        for r in row_signatures(batch_df).collect()
    }
    sigs = dedup.minhash_signatures(batch_df)
    want = {
        r["doc_id"]: [r[f"sig_{j}"] for j in range(dedup.N_PERMS)]
        for r in sigs.collect()
    }
    assert got == want and len(got) >= 6


def _drain_pairs(spark, in_dir, chk, out, **kw):
    q = (
        lsh_pairs_stream(read_docs_stream(spark, str(in_dir)), **kw)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(out))


def test_stream_pairs_equal_batch(spark, batch_df, tmp_path):
    in_dir, chk, out = tmp_path / "in", tmp_path / "chk", tmp_path / "out"
    batch_df.coalesce(1).write.parquet(str(in_dir))
    got = {
        (r["doc_a"], r["doc_b"], r["sig_matches"], r["est_jaccard"])
        for r in _drain_pairs(spark, in_dir, chk, out).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["sig_matches"], r["est_jaccard"])
        for r in dedup.lsh_candidate_pairs(
            batch_df, bucket_cap=None, canonicalize=False
        ).collect()
    }
    assert got == want and got


def test_bucket_cap_bounds_pairs(spark, tmp_path):
    in_dir, chk, out = tmp_path / "in", tmp_path / "chk", tmp_path / "out"
    # 10 identical docs -> every band bucket saturates at cap=3:
    # pairs <= N_BANDS * cap*(cap-1)/2 (before cross-band dedupe)
    spec = [(i, i, "same text in every single doc") for i in range(1, 11)]
    spark.createDataFrame(_rows(spec), DOCS_STREAM_SCHEMA).coalesce(1).write.parquet(str(in_dir))
    rows = _drain_pairs(spark, in_dir, chk, out, bucket_cap=3).collect()
    assert 0 < len(rows) <= dedup.N_BANDS * 3
    deduped = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert len(deduped) == 3  # first 3 arrivals pair; the rest dropped


def test_incremental_pairs_across_runs(spark, batch_df, tmp_path):
    in_dir, chk, out = tmp_path / "in", tmp_path / "chk", tmp_path / "out"
    batch_df.coalesce(1).write.parquet(str(in_dir))
    n1 = _drain_pairs(spark, in_dir, chk, out).count()
    # a late exact copy of doc 4 (guaranteed all-band collision) pairs
    # against the buckets persisted in the checkpointed state
    extra = [(8, 7, "one two three four five six seven")]
    spark.createDataFrame(_rows(extra), DOCS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    rows = _drain_pairs(spark, in_dir, chk, out).collect()
    assert len(rows) > n1
    assert (4, 8) in {(r["doc_a"], r["doc_b"]) for r in rows}

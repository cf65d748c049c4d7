"""Sequence-packing invariants: the distributed two-phase prefix sum
must equal the sequential scan, offsets must tile the stream exactly,
and per-sequence occupancy must conserve tokens and fill every
sequence except the last to exactly seq_len."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import packing
from search_engine_spark.ops.sqltwin import tokens_col


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic mix: short docs, one doc far bigger than seq_len
    # (straddles many sequences), one doc the tokenizer drops entirely
    rows = []
    for i in range(300):
        n = (i * 37) % 90 + 1
        rows.append((i, " ".join(f"w{chr(ord('a') + (i + j) % 26)}"
                                 for j in range(n))))
    rows.append((300, " ".join("giant" for _ in range(900))))
    rows.append((301, "123 456 ,,, :::"))  # zero tokens after filtering
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_offsets_match_sequential_scan(spark, docs):
    """distributed scan ≡ Python running total in doc_id order."""
    got = {r["doc_id"]: (r["n_tokens"], r["offset"])
           for r in packing.doc_offsets(docs).collect()}
    counts = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(tokens_col("text")).alias("n")).collect()
    }
    run = 0
    for did in sorted(counts):
        if counts[did] == 0:
            assert did not in got  # zero-token docs excluded
            continue
        assert got[did] == (counts[did], run), did
        run += counts[did]


def test_offsets_tile_exactly(spark, docs):
    rows = sorted(packing.doc_offsets(docs).collect(),
                  key=lambda r: r["offset"])
    expect = 0
    for r in rows:
        assert r["offset"] == expect
        expect += r["n_tokens"]


def test_occupancy_conserves_tokens(spark, docs):
    L = 64
    occ = packing.sequence_occupancy(docs, seq_len=L).collect()
    total = docs.select(
        F.sum(F.size(tokens_col("text")))).collect()[0][0]
    assert sum(r["n_tokens"] for r in occ) == total
    # every sequence except the last is exactly full
    seqs = sorted(occ, key=lambda r: r["seq_id"])
    assert [r["seq_id"] for r in seqs] == list(range(len(seqs)))
    for r in seqs[:-1]:
        assert r["n_tokens"] == L, r
    assert 0 < seqs[-1]["n_tokens"] <= L
    # a doc can only straddle in from one previous sequence
    for r in seqs:
        assert r["n_boundary_docs"] <= 1


def test_giant_doc_spans_expected_sequences(spark, docs):
    L = 64
    placed = {r["doc_id"]: r for r in
              packing.pack_sequences(docs, seq_len=L).collect()}
    g = placed[300]
    assert g["n_tokens"] == 900
    assert g["n_seqs"] in (15, 16)  # 900/64 ≈ 14.1 → 15 or 16 with offset
    assert g["seq_last"] - g["seq_first"] + 1 == g["n_seqs"]

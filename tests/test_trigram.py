"""Trigram substring search: candidate AND must be a superset of true
matches, verify must drop trigram false positives, occurrence counts
exact, and the <3-char degenerate path works."""

from __future__ import annotations

from search_engine_spark.ops.trigram import (
    _trigrams,
    substring_search,
    trigram_postings,
)

SCHEMA = "doc_id long, text string"

ROWS = [
    (1, "abcd efgh"),        # true match for 'abcd'
    (2, "abc bcd"),          # all trigrams of 'abcd', but NOT the needle
    (3, "xabcdx xabcdx"),    # two occurrences
    (4, "no relation"),
    (5, "ABCD upper case"),  # case-insensitive match
    (6, "ab"),               # shorter than a trigram
]


def test_trigram_extraction():
    assert _trigrams("abcd") == ["abc", "bcd"]
    assert _trigrams("aaaa") == ["aaa"]
    assert _trigrams("ab") == []


def test_substring_search_verify_drops_false_positive(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["doc_id"]: r["n_occ"] for r in
           substring_search(spark, df, "abcd").collect()}
    assert got == {1: 1, 3: 2, 5: 1}  # doc 2 pruned by the verify stage


def test_substring_candidates_are_superset(spark):
    """Every true match must survive the trigram AND (completeness)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(ROWS, SCHEMA)
    needle = "abcd"
    tris = _trigrams(needle)
    tp = trigram_postings(df)
    cand = {
        r["doc_id"]
        for r in tp.where(F.col("tri").isin(tris))
        .groupBy("doc_id").agg(F.count("*").alias("n"))
        .where(F.col("n") == len(tris)).collect()
    }
    true_matches = {i for i, t in ROWS if needle in t.lower()}
    assert true_matches <= cand


def test_short_needle_falls_back_to_scan(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["doc_id"]: r["n_occ"] for r in
           substring_search(spark, df, "ab").collect()}
    assert got == {1: 1, 2: 1, 3: 2, 5: 1, 6: 1}


def test_trigram_postings_short_text_empty(spark):
    df = spark.createDataFrame([(9, "ab")], SCHEMA)
    assert trigram_postings(df).collect() == []

"""Phrase search: the positional-postings leg-join must agree with a
naive Python sliding-window count on hostile fixtures (repeated terms,
overlapping occurrences, phrase absent, phrase at doc boundary).
"""

from __future__ import annotations

import pytest

from search_engine_spark.functions.tokenize import tokenize
from search_engine_spark.ops.phrase import phrase_occurrences, phrase_topk

SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"

ROWS = [
    (1, "the cat sat on the cat mat", "en", "s", 27),
    (2, "a a a a", "en", "s", 7),                      # overlapping repeats
    (3, "cat the cat the cat", "en", "s", 19),
    (4, "completely unrelated words here", "en", "s", 31),
    (5, "the cat", "en", "s", 7),                      # phrase IS the doc
    (6, "", "en", "s", 0),
]


def _naive_count(text: str, phrase: list[str]) -> int:
    toks = tokenize(text)
    L = len(phrase)
    return sum(
        1 for i in range(len(toks) - L + 1) if toks[i : i + L] == phrase
    )


@pytest.mark.parametrize(
    "phrase",
    [["the", "cat"], ["a", "a"], ["cat", "the", "cat"], ["zzz", "yyy"], ["the"]],
)
def test_occurrences_match_naive(spark, phrase):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = (
        phrase_occurrences(df, phrase)
        .groupBy("doc_id").count().collect()
    )
    got_map = {r["doc_id"]: r["count"] for r in got}
    for doc_id, text, *_ in ROWS:
        assert got_map.get(doc_id, 0) == _naive_count(text, phrase), (
            doc_id, phrase
        )


def test_phrase_topk_ranks_by_frequency(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rows = phrase_topk(spark, df, ["the", "cat"]).collect()
    ids = [r["doc_id"] for r in rows]
    # docs 1,3 have 2 occurrences; 5 has 1 with the shortest dl -> but
    # higher tf wins under BM25 here (tfn grows with pf)
    assert set(ids) == {1, 3, 5}
    pf = {r["doc_id"]: r["pf"] for r in rows}
    assert pf == {1: 2, 3: 2, 5: 1}
    assert rows[0]["score"] >= rows[-1]["score"]


def test_empty_phrase_rejected(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        phrase_occurrences(df, [])


# ---------------------------------------------------------- NEAR search


def test_near_pair_counts_banded_join_exact(spark):
    """The banded range join must count each (pa, pb) pair exactly once,
    including pairs straddling bucket boundaries — verified against a
    brute-force pair count over every planted position layout."""
    from search_engine_spark.ops.phrase import near_pair_counts

    w = 4
    docs = [
        # (doc_id, text): positions of 'a'/'b' chosen to straddle the
        # width-4 buckets ('x' is filler)
        (1, "a b x x x x x x x x"),            # |0-1|=1 -> 1 pair
        (2, "a x x x b x x x x x"),            # |0-4|=4 -> 1 pair (== w)
        (3, "a x x x x b x x x x"),            # |0-5|=5 -> 0 pairs
        (4, "b x x a x x b a x b"),            # multiple pairs both sides
        (5, "a a x b b x x x a x"),            # repeated terms
        (6, "x x x x x x x x x x"),            # no pairs
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["pf"] for r in near_pair_counts(df, "a", "b", w).collect()}

    def brute(text):
        toks = text.split()
        pa = [i for i, t in enumerate(toks) if t == "a"]
        pb = [i for i, t in enumerate(toks) if t == "b"]
        return sum(1 for x in pa for y in pb if abs(x - y) <= w)

    want = {i: brute(t) for i, t in docs if brute(t) > 0}
    assert got == want


def test_near_requires_distinct_terms(spark):
    from search_engine_spark.ops.phrase import near_pair_counts

    df = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        near_pair_counts(df, "a", "a")


def test_near_ordered_counts_exact(spark):
    from search_engine_spark.ops.phrase import near_pair_counts

    w = 3
    docs = [
        (1, "a x b"),        # a before b -> counted
        (2, "b x a"),        # b before a -> ordered drops it
        (3, "a b a b"),      # mixed: ordered pairs (0,1),(0,3),(2,3)
        (4, "a x x x x b"),  # gap > w
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["pf"]
           for r in near_pair_counts(df, "a", "b", w, ordered=True).collect()}

    def brute(text):
        toks = text.split()
        return sum(
            1
            for i, t in enumerate(toks) if t == "a"
            for j, u in enumerate(toks) if u == "b" and 0 < j - i <= w
        )

    want = {i: brute(t) for i, t in docs if brute(t) > 0}
    assert got == want and got[1] == 1 and 2 not in got and got[3] == 3


def test_phrase_rescore_blends_and_bounds(spark):
    """Two-phase rescore: (a) every hit comes from the phase-1 BM25
    window, (b) final == bm25 + W·ln(1+pf) with pf the naive phrase
    count, (c) an adjacent-phrase doc outranks a scattered-terms doc of
    comparable BM25."""
    import math

    from search_engine_spark.ops.phrase import (
        RESCORE_WEIGHT,
        phrase_rescore_topk,
    )
    from search_engine_spark.ops.search_sql import bm25_scores

    rows = [
        (1, "hash table lookup in the hash table code", "en", "s", 40),
        (2, "table of hash values and table of hash sums", "en", "s", 43),
        (3, "hash hash hash table table table", "en", "s", 32),
        (4, "unrelated content entirely", "en", "s", 26),
        (5, "a hash table", "en", "s", 12),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    phrase = ["hash", "table"]
    got = phrase_rescore_topk(spark, df, phrase, k=5, window_size=3).collect()
    assert 0 < len(got) <= 3

    window = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, df, sorted(set(phrase)))
        .orderBy("score", ascending=False)
        .collect()[:3]
    }
    for r in got:
        assert r["doc_id"] in window
        pf = _naive_count(rows[r["doc_id"] - 1][1], phrase)
        assert r["pf"] == pf
        assert r["final"] == pytest.approx(
            round(r["score"] + RESCORE_WEIGHT * math.log(1 + pf), 4), abs=1e-9
        )
    # doc 1 has two adjacent "hash table"; doc 2 has none — rescore must
    # place 1 above 2 regardless of their raw BM25 order
    ranks = {r["doc_id"]: i for i, r in enumerate(got)}
    if 1 in ranks and 2 in ranks:
        assert ranks[1] < ranks[2]

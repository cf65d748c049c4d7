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

"""Tokenizer spec tests (frozen §8.1) + scalar/vectorized equivalence."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.tokenize import (
    _postings_from_batch,
    query_terms,
    tokenize,
    tokenize_tf,
)


def test_frozen_rules():
    text = 'Binary.Search, tree 123 x1y2 foo.bar (parens) "Quoted" naïve ' \
           + "a" * 30 + " ';edge:' trailing... :::"
    toks = tokenize(text)
    # kept: trim-wrapped, lowercased, unicode-alphabetic
    assert "quoted" in toks
    assert "naïve" in toks
    assert "edge" in toks
    assert "trailing" in toks
    assert "tree" in toks
    # dropped: internal punctuation / digits / symbols / too long / empty
    for bad in ("binary.search", "123", "x1y2", "foo.bar", "(parens)", "a" * 30):
        assert bad not in toks
    # 'Binary.Search,' trims the trailing comma but keeps the inner dot → dropped
    assert all("." not in t for t in toks)


def test_tf_raw_counts():
    assert tokenize_tf("tree tree Tree 'tree'") == {"tree": 4}


def test_query_terms_distinct_sorted():
    assert query_terms("tree TREE node, 123") == ["node", "tree"]


def test_vectorized_matches_scalar_on_samples():
    texts = [
        "",
        "   ",
        'Binary.Search, tree 123 "Quoted" naïve ' + "a" * 30,
        "tree tree node\nhash:index; merge/sort",
        "übermäßig x1y2 ';edge:'",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "content": texts})
    out = _postings_from_batch(pdf, "content")
    got = {
        int(d): {} for d in pdf["doc_id"]
    }
    for _, r in out.iterrows():
        got[int(r["doc_id"])][r["term"]] = int(r["tf"])
    for i, text in enumerate(texts):
        assert got[i] == tokenize_tf(text), f"mismatch on doc {i}"
    # dl equals sum of tfs per doc
    for did, grp in out.groupby("doc_id"):
        assert (grp["dl"] == grp["tf"].sum()).all()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_vectorized_matches_scalar_property(text):
    pdf = pd.DataFrame({"doc_id": [7], "content": [text]})
    out = _postings_from_batch(pdf, "content")
    got = {r["term"]: int(r["tf"]) for _, r in out.iterrows()}
    assert got == tokenize_tf(text)


def test_jvm_matches_pandas_on_fixture(spark, fixture_dir):
    """JVM expression tokenizer ≡ pandas tokenizer on the fixture corpus
    (which exercises every tokenizer rule, FIXTURES.md §1)."""
    from search_engine_spark.functions.tokenize import (
        extract_postings,
        extract_postings_jvm,
    )
    from search_engine_spark.sources.corpus import load_corpus, with_identity

    corpus = with_identity(load_corpus(spark, str(fixture_dir / "corpus.parquet")))
    a = extract_postings(corpus.select("doc_id", "content")).collect()
    b = extract_postings_jvm(corpus.select("doc_id", "content")).collect()
    ka = sorted((r["doc_id"], r["term"], r["tf"], r["dl"]) for r in a)
    kb = sorted((r["doc_id"], r["term"], r["tf"], r["dl"]) for r in b)
    assert ka == kb


def test_jvm_matches_scalar_on_unicode_whitespace(spark):
    """Java's \\s is ASCII-only; the JVM split must still treat every
    Python-isspace separator (NBSP, ideographic space, FS, NEL, thin
    space …) as a token boundary, identically on all three paths."""
    from search_engine_spark.functions.tokenize import (
        extract_postings,
        extract_postings_jvm,
    )

    texts = [
        "foo\u00a0bar",                     # NBSP (the ADVICE repro case)
        "a\u3000b\u2009c",                  # ideographic space + thin space
        "x\x1cy\x1fz",                      # information separators
        "nel\x85next\u2028line",            # NEL + line separator
        "ogham\u1680space\u205fmath",       # ogham mark + math space
    ]
    expected = {(i, t) for i, txt in enumerate(texts) for t in set(tokenize(txt))}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    for extractor in (extract_postings, extract_postings_jvm):
        got = {(r["doc_id"], r["term"]) for r in extractor(df).collect()}
        assert got == expected, extractor.__name__

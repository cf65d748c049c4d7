"""Tokenization + term-frequency extraction (frozen spec SURVEY.md §8.1).

Semantics mined from the reference indexer's streaming tokenizer
(`services/indexer/src/core/text_sink.rs:43-66`): lowercase → split on
whitespace → trim leading/trailing ``.,:;/'"`` + whitespace → drop empty
→ keep only tokens whose every char is Unicode-alphabetic (this subsumes
the reference's numeric-token drop at text_sink.rs:50-52) → drop tokens
longer than 25 chars (the dictionary's VARCHAR(25) cap,
`migration/schema.sql:21` — applied as an explicit filter rather than
the reference's failure mode of skipping a whole insert batch).

The distributed path is a **vectorized Arrow/pandas** transform exposed
through ``mapInPandas`` (per BASELINE.json input_hint: no per-row
Python): doc batches in → posting rows ``(doc_id, term, tf, dl)`` out.
Counting TF inside the UDF avoids an extra groupBy shuffle (SURVEY §2.4
A1), and emitting ``dl`` (post-filter token count per doc) denormalized
onto each posting row means BM25 never needs a doc-length join.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from search_engine_spark.config import MAX_TERM_LEN, TOKEN_TRIM_CHARS

POSTINGS_SCHEMA = "doc_id long, term string, tf int, dl int"


def tokenize(text: str) -> list[str]:
    """Pure-Python tokenizer — the oracle/query-side single-string path.

    Must stay semantically identical to the vectorized path below; the
    property test ``test_tokenize.py::test_vectorized_matches_scalar``
    enforces it.
    """
    out = []
    for raw in text.lower().split():
        tok = raw.strip(TOKEN_TRIM_CHARS)
        if not tok or len(tok) > MAX_TERM_LEN:
            continue
        if not tok.isalpha():
            continue
        out.append(tok)
    return out


def tokenize_tf(text: str) -> dict[str, int]:
    """Per-doc term → raw count (reference stores raw counts, not ratios:
    `page_word.tf INTEGER`, SURVEY §2.2 P2 note)."""
    return dict(Counter(tokenize(text)))


def query_terms(query: str) -> list[str]:
    """Query pipeline: same tokenizer, then distinct (sorted for
    determinism). Reference: mock-speller split + set-dedupe
    (`services/engine/cmd/cli/main.go:17-20`,
    `spell-checker.go:29-46`)."""
    return sorted(set(tokenize(query)))


def _postings_from_batch(pdf: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """Vectorized pandas kernel: (doc_id, <text_col>) batch → postings."""
    if len(pdf) == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "term": pd.Series([], dtype="object"),
             "tf": pd.Series([], dtype="int32"),
             "dl": pd.Series([], dtype="int32")}
        )
    docs = pdf["doc_id"].reset_index(drop=True)
    toks = pdf[text_col].fillna("").str.lower().str.split()
    ex = toks.reset_index(drop=True).explode().dropna()
    ex = ex.str.strip(TOKEN_TRIM_CHARS)
    keep = (ex.str.len() > 0) & (ex.str.len() <= MAX_TERM_LEN) & ex.str.isalpha()
    ex = ex[keep]
    if len(ex) == 0:
        return _postings_from_batch(pdf.iloc[0:0], text_col)
    flat = pd.DataFrame({"row": ex.index.to_numpy(), "term": ex.to_numpy()})
    tf = flat.groupby(["row", "term"], sort=False).size().rename("tf").reset_index()
    dl = tf.groupby("row", sort=False)["tf"].sum().rename("dl")
    tf = tf.join(dl, on="row")
    tf["doc_id"] = docs.to_numpy()[tf["row"].to_numpy()]
    return pd.DataFrame(
        {
            "doc_id": tf["doc_id"].astype("int64"),
            "term": tf["term"],
            "tf": tf["tf"].astype("int32"),
            "dl": tf["dl"].astype("int32"),
        }
    )


def make_postings_mapper(text_col: str = "content"):
    """Factory for the ``mapInPandas`` function: select(doc_id, text_col)
    upstream so Catalyst prunes every other column before the Arrow
    exchange (the reference's analogue is wiping ``pages.html`` after
    indexing, SURVEY §2.1 S13)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _postings_from_batch(pdf, text_col)

    return mapper


def extract_postings(df, text_col: str = "content"):
    """corpus DataFrame (must carry ``doc_id``) → (doc_id, term, tf, dl).

    One narrow Arrow-batched pass; no shuffle. ``dl`` is identical on
    every posting row of a doc.
    """
    return df.select("doc_id", text_col).mapInPandas(
        make_postings_mapper(text_col), schema=POSTINGS_SCHEMA
    )

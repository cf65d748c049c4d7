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

import re
from collections import Counter
from collections.abc import Iterator
from itertools import chain

import numpy as np
import pandas as pd

from search_engine_spark.config import MAX_TERM_LEN, TOKEN_TRIM_CHARS

POSTINGS_SCHEMA = "doc_id long, term string, tf int, dl int"

# One compiled regex implementing the whole frozen token rule on the raw
# (lowercased) text — ~5× faster than per-token strip/isalpha Series ops
# because the scan runs in C per document instead of per token. A match
# must span an entire whitespace-delimited token (the \S lookarounds):
# optional trim chars, then 1..MAX alphabetic chars ([^\W\d_] ≡ \w minus
# digits/underscore), then optional trim chars. Tokens with interior
# punctuation/digits can't complete the span and are dropped — exactly
# the strip-then-isalpha semantics (property-tested against
# ``tokenize`` below).
_TRIM_CLASS = "[" + re.escape(TOKEN_TRIM_CHARS.strip()) + "]*"
TOKEN_RE = re.compile(
    rf"(?<!\S){_TRIM_CLASS}([^\W\d_]{{1,{MAX_TERM_LEN}}}){_TRIM_CLASS}(?!\S)"
)


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


def analyzer_of(stem) -> str:
    """Normalize the ``EngineConfig.stem`` value (bool | str) to the
    analyzer marker name: False→'plain', True/'stem'→'stem' (the
    minimal s-stemmer), 'porter'→'porter' (functions/porter.py)."""
    if stem is True:
        return "stem"
    if not stem:
        return "plain"
    if stem in ("stem", "s"):
        return "stem"
    if stem == "porter":
        return "porter"
    raise ValueError(f"unknown analyzer {stem!r}")


def analyze_token(tok: str, analyzer: str) -> str:
    """Scalar analysis stage (query side + oracles) for any analyzer."""
    if analyzer == "stem":
        return stem_token(tok)
    if analyzer == "porter":
        from search_engine_spark.functions.porter import porter_stem

        return porter_stem(tok)
    return tok


def stem_token(tok: str) -> str:
    """Minimal English s-stemmer (Lucene EnglishMinimalStemFilter /
    Harman's s-stemmer): strip one trailing 's' from tokens of length
    ≥ 4 unless they end in 'ss'/'us'/'is'. The opt-in analyzer stage
    (``EngineConfig.stem``) — applied symmetrically at index and query
    time like every Lucene analysis chain. Scalar twin of the
    vectorized/JVM forms below (property-pinned in test_tokenize)."""
    if len(tok) >= 4 and tok.endswith("s") and not tok.endswith(("ss", "us", "is")):
        return tok[:-1]
    return tok


def stem_term_col(c):
    """:func:`stem_token` as a pure JVM Column expression."""
    from pyspark.sql import functions as F

    strip = (
        (F.length(c) >= 4)
        & c.endswith("s")
        & ~c.endswith("ss")
        & ~c.endswith("us")
        & ~c.endswith("is")
    )
    return F.when(strip, F.substring(c, F.lit(1), F.length(c) - 1)).otherwise(c)


def _stem_series(t: pd.Series) -> pd.Series:
    """:func:`stem_token` vectorized over a pandas string Series."""
    mask = (
        t.str.len().ge(4)
        & t.str.endswith("s")
        & ~t.str.endswith("ss")
        & ~t.str.endswith("us")
        & ~t.str.endswith("is")
    )
    return t.mask(mask, t.str[:-1])


def query_terms(query: str) -> list[str]:
    """Query pipeline: same tokenizer, then distinct (sorted for
    determinism). Reference: mock-speller split + set-dedupe
    (`services/engine/cmd/cli/main.go:17-20`,
    `spell-checker.go:29-46`)."""
    return sorted(set(tokenize(query)))


def _empty_postings() -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "term": pd.Series([], dtype="object"),
         "tf": pd.Series([], dtype="int32"),
         "dl": pd.Series([], dtype="int32")}
    )


def _postings_from_batch(
    pdf: pd.DataFrame, text_col: str, stem: bool = False
) -> pd.DataFrame:
    """Vectorized pandas kernel: (doc_id, <text_col>) batch → postings."""
    if len(pdf) == 0:
        return _empty_postings()
    docs = pdf["doc_id"].to_numpy()
    lists = pdf[text_col].fillna("").str.lower().str.findall(TOKEN_RE)
    lens = lists.str.len().to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return _empty_postings()
    flat = pd.DataFrame(
        {
            "row": np.repeat(np.arange(len(pdf)), lens),
            "term": np.fromiter(
                chain.from_iterable(lists), dtype=object, count=int(lens.sum())
            ),
        }
    )
    # regex \w admits a few non-alpha numerics the frozen spec drops
    # (e.g. '¹', category No): cheap exact post-filter on matched tokens
    flat = flat[flat["term"].str.isalpha().to_numpy()]
    if len(flat) == 0:
        return _empty_postings()
    analyzer = analyzer_of(stem)
    if analyzer == "stem":
        # analyzer stage: stem BEFORE the tf groupby so plural/singular
        # variants merge into one posting row inside the kernel — the
        # index-side merge costs zero extra passes or shuffles
        flat = flat.assign(term=_stem_series(flat["term"]))
    elif analyzer == "porter":
        from search_engine_spark.functions.porter import porter_series

        flat = flat.assign(term=porter_series(flat["term"]))
    tf = flat.groupby(["row", "term"], sort=False).size().rename("tf").reset_index()
    dl = tf.groupby("row", sort=False)["tf"].sum().rename("dl")
    tf = tf.join(dl, on="row")
    return pd.DataFrame(
        {
            "doc_id": docs[tf["row"].to_numpy()].astype("int64"),
            "term": tf["term"],
            "tf": tf["tf"].astype("int32"),
            "dl": tf["dl"].astype("int32"),
        }
    )


def make_postings_mapper(text_col: str = "content", stem: bool = False):
    """Factory for the ``mapInPandas`` function: select(doc_id, text_col)
    upstream so Catalyst prunes every other column before the Arrow
    exchange (the reference's analogue is wiping ``pages.html`` after
    indexing, SURVEY §2.1 S13)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from search_engine_spark.functions.runtime import disable_thp

        disable_thp()
        for pdf in batches:
            yield _postings_from_batch(pdf, text_col, stem)

    return mapper


def extract_postings(df, text_col: str = "content", stem: bool = False):
    """corpus DataFrame (must carry ``doc_id``) → (doc_id, term, tf, dl).

    One narrow Arrow-batched pass; no shuffle. ``dl`` is identical on
    every posting row of a doc (token count — analyzer-invariant: the
    stem stage merges variants' tf but never drops tokens).
    """
    return df.select("doc_id", text_col).mapInPandas(
        make_postings_mapper(text_col, stem), schema=POSTINGS_SCHEMA
    )


def jvm_tokens_col(text_col: str):
    """The same frozen tokenizer as a pure JVM array expression
    (split/btrim/rlike inside whole-stage codegen). Semantically
    identical to :func:`tokenize` — enforced by
    tests/test_tokenize.py::test_jvm_matches_scalar. Java's ``\\p{L}``
    and Python's ``str.isalpha`` agree on letters; the known divergence
    class (combining marks / exotic numerics) is excluded by both.
    The split uses the explicit ``WS_CLASS`` whitespace set (Python's
    str.isspace) because Java's ``\\s`` is ASCII-only — e.g. U+00A0
    must separate tokens on every path.
    """
    from pyspark.sql import functions as F

    from search_engine_spark.ops.sqltwin import WS_SPLIT_RE

    raw = F.split(F.lower(F.col(text_col)), WS_SPLIT_RE)
    trimmed = F.transform(raw, lambda t: F.btrim(t, F.lit(TOKEN_TRIM_CHARS.strip())))
    return F.filter(
        trimmed,
        lambda t: (F.length(t) > 0)
        & (F.length(t) <= MAX_TERM_LEN)
        & t.rlike(r"^\p{L}+$"),
    )


def extract_positions_jvm(df, text_col: str = "content", stem: bool = False):
    """Positional postings for the persisted index (opt-in,
    ``EngineConfig.store_positions``): (doc_id, term, positions
    array<int>, dl) — 0-based token positions from the same frozen
    tokenizer (JVM expression path; the pandas/JVM property tests pin
    both paths to identical token streams, so positions are consistent
    with either build tokenizer).

    ``sort_array`` is load-bearing: collect_list order is not
    deterministic across shuffles, and phrase matching assumes sorted
    positions per (doc, term).
    """
    from pyspark.sql import functions as F

    analyzer = analyzer_of(stem)
    toks = jvm_tokens_col(text_col)
    if analyzer == "stem":
        # stem before posexplode: merged variants' positions union into
        # one sorted list via the same collect_list/sort_array
        toks = F.transform(toks, stem_term_col)
    exploded = df.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.size("toks").cast("int").alias("dl"),
        F.posexplode("toks").alias("pos", "term"),
    )
    if analyzer == "porter":
        exploded = _porter_map(exploded)
    return (
        exploded
        .groupBy("doc_id", "dl", "term")
        .agg(F.sort_array(F.collect_list(F.col("pos").cast("int")))
             .alias("positions"))
        .select("doc_id", "term", "positions", "dl")
    )


def _porter_map(exploded):
    """Porter analysis on the JVM path: stem the DISTINCT vocabulary
    through the generated SQL stages (functions/porter.py) and map the
    exploded tokens through a broadcast (vocab-sized, the BPE bound
    argument: ≤ ~10^6 rows at the 25-char term cap) — the heavy
    expression chain evaluates once per TYPE, not once per token."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.porter import porter_spark_stem

    vocab = exploded.select("term").distinct().withColumn("w", F.col("term"))
    mapping = porter_spark_stem(vocab, "w").select(
        "term", F.col("w").alias("_pstem")
    )
    return (
        exploded.join(F.broadcast(mapping), "term")
        .drop("term")
        .withColumnRenamed("_pstem", "term")
    )


def extract_postings_jvm(df, text_col: str = "content", stem: bool = False):
    """JVM-only twin of :func:`extract_postings` — same output schema.

    Why it exists: the Arrow/pandas path is the mandated architecture
    and the default, but a fleet of allocation-heavy Python workers is
    hostage to host memory-management behavior (this sandbox's kernel
    burns ~90% sys time in memcg page accounting beyond ~8 workers —
    measured in tools/profile_tokenize.py). The JVM path runs the
    identical token rules inside whole-stage codegen: no Python
    processes at all, preallocated heap, scales with cores.

    ``dl`` (post-filter token count) is computed from the token array
    BEFORE the explode, so no extra shuffle or join is needed — the
    groupBy carries it as a functionally-dependent key.
    """
    from pyspark.sql import functions as F

    analyzer = analyzer_of(stem)
    toks = jvm_tokens_col(text_col)
    if analyzer == "stem":
        toks = F.transform(toks, stem_term_col)
    exploded = df.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.size("toks").cast("int").alias("dl"),
        F.explode("toks").alias("term"),
    )
    if analyzer == "porter":
        exploded = _porter_map(exploded)
    return (
        exploded
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("int").alias("tf"))
        .select("doc_id", "term", "tf", "dl")
    )

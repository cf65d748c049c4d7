"""Distributed BPE (ops/bpe.py) vs a pure-Python Sennrich reference:
the learned merge sequence, the greedy merge-application semantics
(including the overlapping l==r run-parity case), and the encode stats
must all match an independent sequential implementation. Gate parity
(vs the DuckDB chain-CTE twin) lives in check_parity via
bpe_merges / bpe_encode."""

from __future__ import annotations

from collections import Counter

import pytest

from search_engine_spark.functions.tokenize import tokenize
from search_engine_spark.ops import bpe
from search_engine_spark.ops.bpe import apply_merge

from pyspark.sql import functions as F


# ------------------------------------------------- pure-Python reference

def ref_apply(syms: list[str], l: str, r: str) -> list[str]:
    """Greedy left-to-right merge — the sequential scan the array
    expression must reproduce."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_train(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        words.update(tokenize(t))
    vocab = {w: [list(w), c] for w, c in words.items()}
    merges = []
    for k in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # tie-break: count desc, then l asc, r asc — frozen in bpe.py
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, l, r, l + r, cnt))
        for v in vocab.values():
            v[0] = ref_apply(v[0], l, r)
    return merges, {w: v[0] for w, v in vocab.items()}


# --------------------------------------------------------------- tests

APPLY_CASES = [
    (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
    (["a", "a", "a"], "a", "a", ["aa", "a"]),
    (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
    (["a", "a", "a", "a", "a"], "a", "a", ["aa", "aa", "a"]),
    (["b", "a", "a", "a"], "a", "a", ["b", "aa", "a"]),
    (["a", "b"], "b", "a", ["a", "b"]),
    (["x"], "x", "x", ["x"]),
    (["a", "b", "b", "b", "a"], "b", "b", ["a", "bb", "b", "a"]),
]


def test_apply_merge_matches_greedy_scan(spark):
    rows = [(i, syms) for i, (syms, _, _, _) in enumerate(APPLY_CASES)]
    df = spark.createDataFrame(rows, "i int, syms array<string>")
    for i, (syms, l, r, want) in enumerate(APPLY_CASES):
        got = (
            df.where(F.col("i") == i)
            .select(apply_merge(F.col("syms"), l, r).alias("m"))
            .collect()[0]["m"]
        )
        assert got == want == ref_apply(syms, l, r), (syms, l, r)


def _docs(spark, fixture_dir):
    corpus = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    return corpus.select(
        F.xxhash64("path").alias("doc_id"), F.col("content").alias("text")
    )


def test_train_matches_python_reference(spark, fixture_dir):
    docs = _docs(spark, fixture_dir)
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_vocab = ref_train(texts, n_merges=6)

    got_merges, words = bpe.train_bpe(spark, docs, n_merges=6)
    assert got_merges == want_merges

    got_vocab = {
        r["term"]: list(r["syms"]) for r in words.select("term", "syms").collect()
    }
    words.unpersist()
    assert got_vocab == want_vocab


def test_encode_conserves_tokens(spark, fixture_dir):
    docs = _docs(spark, fixture_dir)
    out = bpe.bpe_encode(spark, docs, n_merges=4).collect()
    assert len(out) > 0
    # per-doc char budget: every token yields >=1 subword and at most
    # len(token) subwords (merges only ever shrink the symbol count)
    char_len = {
        r["doc_id"]: sum(len(t) for t in tokenize(r["text"]))
        for r in docs.collect()
    }
    for r in out:
        assert r["n_tokens"] >= 1
        assert r["n_subwords"] >= r["n_tokens"]
        assert r["n_subwords"] <= char_len[r["doc_id"]]


def test_local_trainer_matches_distributed(spark, fixture_dir):
    """train_bpe_local (one driver sync) must be bit-identical to the
    per-merge-sync distributed trainer and the Python reference."""
    docs = _docs(spark, fixture_dir)
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_vocab = ref_train(texts, n_merges=6)

    got_merges, got_vocab = bpe.train_bpe_local(spark, docs, n_merges=6)
    assert got_merges == want_merges
    assert got_vocab == want_vocab


def test_oracle_survives_merge_exhaustion(spark):
    """ADVICE r02 (medium): when merges exhaust before n_merges, the
    DuckDB chain twin must degrade to a no-op (LEFT JOIN ON TRUE), not
    empty every later CTE. 2-doc corpus of 1-char terms → 0 possible
    merges; both twins must still return one row per doc / the same
    (empty) merge list as Spark."""
    import duckdb

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e a")], "doc_id long, text string"
    )
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES (1, 'a b c'), (2, 'd e a')) t(doc_id, text)")
    sqls = bpe.oracle_sql_bpe(n_merges=4)

    spark_merges = bpe.bpe_merges(spark, docs, n_merges=4).collect()
    duck_merges = con.execute(sqls["bpe_merges"]).fetchall()
    assert spark_merges == [] and duck_merges == []

    spark_enc = {
        r["doc_id"]: (r["n_tokens"], r["n_subwords"])
        for r in bpe.bpe_encode(spark, docs, n_merges=4).collect()
    }
    duck_enc = {
        d: (t, s) for d, t, s in con.execute(sqls["bpe_encode"]).fetchall()
    }
    assert spark_enc == duck_enc == {1: (3, 3), 2: (3, 3)}


def test_max_vocab_bounds_driver_pull_by_default(spark):
    """VERDICT r3 item 5: the driver pull is capped by default — an
    unbounded collect requires the explicit ``max_vocab=None`` opt-out.
    With a tiny cap, only the top-V words (count desc, term asc) shape
    the merges."""
    import inspect

    from search_engine_spark.ops import bpe as bpe_mod

    for fn in (bpe_mod.train_bpe_local, bpe_mod.bpe_merges, bpe_mod.bpe_encode):
        default = inspect.signature(fn).parameters["max_vocab"].default
        assert default == bpe_mod.MAX_VOCAB_DEFAULT and default is not None

    rows = [(i, "aa bb " * 5 + f"rare{i}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=2 keeps only {aa, bb}: merges can only ever involve a/b chars
    merges, vocab = bpe_mod.train_bpe_local(spark, docs, n_merges=4, max_vocab=2)
    assert set(vocab) == {"aa", "bb"}
    assert all(set(m[1] + m[2]) <= set("ab") for m in merges)

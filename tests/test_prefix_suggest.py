"""Wildcard prefix queries + typeahead suggestions: ops-level
expansion semantics and the engine path over the persisted terms
table (gate parity for both lives in test_ops_parity via
search_bm25_prefix / search_suggest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.search_sql import prefix_expand, suggest_terms
from search_engine_spark.plans.build import build_index
from search_engine_spark.plans.query import QueryEngine
from search_engine_spark.sources.corpus import load_corpus, with_identity


@pytest.fixture(scope="module")
def docs(spark, fixture_dir):
    return (
        with_identity(load_corpus(spark, str(fixture_dir / "corpus.parquet")))
        .select("doc_id", F.col("content").alias("text"))
    )


@pytest.fixture(scope="module")
def ix(spark, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("pfx") / "ix"
    build_index(spark, str(fixture_dir / "corpus.parquet"), str(out))
    return str(out)


def test_prefix_expand_caps_by_df(spark, docs):
    got = sorted(
        r["term"] for r in prefix_expand(spark, docs, ["sort", "me*"],
                                         max_exp=3).collect()
    )
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .where(F.col("t").startswith("me"))
        .groupBy("t").count()
        .orderBy(F.desc("count"), F.asc("t"))
        .limit(3)
        .collect()
    )
    want = sorted({"sort", *(r["t"] for r in vocab)})
    # frozen tokenizer == whitespace split on this all-alpha fixture
    assert got == want and "merge" in got


def test_prefix_expand_no_wildcards_passthrough(spark, docs):
    got = {r["term"] for r in prefix_expand(spark, docs, ["merge", "sort"]).collect()}
    assert got == {"merge", "sort"}


def test_suggest_orders_by_df(spark, docs):
    rows = suggest_terms(spark, docs, "s", k=4).collect()
    assert 0 < len(rows) <= 4
    assert all(r["term"].startswith("s") for r in rows)
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True) or len(set(dfs)) < len(dfs)


def test_engine_prefix_query_equals_manual_expansion(spark, ix):
    eng = QueryEngine(spark, ix)
    _, exp = eng.expand_prefix_terms("merg*", max_exp=4)
    assert exp and all(t.startswith("merg") for t in exp)
    got = [(r["doc_id"], r["score"])
           for r in eng.bm25("sort merg*", k=10).collect()]
    want = [(r["doc_id"], r["score"])
            for r in eng.bm25("sort " + " ".join(exp), k=10).collect()]
    assert got == want and got


def test_engine_suggest_matches_terms_table(spark, ix):
    eng = QueryEngine(spark, ix)
    rows = eng.suggest("me", k=3).collect()
    want = (
        eng.terms.where(F.col("term").startswith("me"))
        .orderBy(F.desc("df"), F.asc("term")).limit(3)
        .select("term", "df").collect()
    )
    assert [(r["term"], r["df"]) for r in rows] == [
        (r["term"], r["df"]) for r in want
    ] and rows


def test_engine_search_prefix_equals_literal(spark, ix):
    """The blended search() path expands trailing-* like bm25()."""
    eng = QueryEngine(spark, ix)
    _, exp = eng.expand_prefix_terms("merg*")
    got = [(r["doc_id"], r["global_score"])
           for r in eng.search("sort merg*", k=5).collect()]
    want = [(r["doc_id"], r["global_score"])
            for r in eng.search("sort " + " ".join(exp), k=5).collect()]
    assert got == want and got


def test_engine_prefix_no_match_empty(spark, ix):
    eng = QueryEngine(spark, ix)
    assert eng.bm25("zzqx*", k=5).collect() == []


def test_suffix_expand_caps_by_df(spark, docs):
    from search_engine_spark.ops.search_sql import suffix_expand

    got = sorted(
        r["term"] for r in suffix_expand(spark, docs, ["sort", "*ge"],
                                         max_exp=3).collect()
    )
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .where(F.col("t").endswith("ge"))
        .groupBy("t").count()
        .orderBy(F.desc("count"), F.asc("t"))
        .limit(3)
        .collect()
    )
    want = sorted({"sort", *(r["t"] for r in vocab)})
    assert got == want and "merge" in got


def test_engine_suffix_query_equals_manual_expansion(spark, ix):
    """Leading-* tokens expand over the persisted terms table
    (ReverseStringFilter semantics) and score identically to the
    expanded literal query; mixed prefix+suffix composes."""
    eng = QueryEngine(spark, ix)
    _, exp = eng.expand_prefix_terms("*ge", max_exp=4)
    assert exp and all(t.endswith("ge") for t in exp)
    got = [(r["doc_id"], r["score"])
           for r in eng.bm25("sort *ge", k=10).collect()]
    want = [(r["doc_id"], r["score"])
            for r in eng.bm25("sort " + " ".join(exp), k=10).collect()]
    assert got == want and got

    _, both = eng.expand_prefix_terms("me* *ge")
    assert set(exp) <= set(both)
    got2 = [(r["doc_id"], r["score"])
            for r in eng.bm25("me* *ge", k=10).collect()]
    want2 = [(r["doc_id"], r["score"])
             for r in eng.bm25(" ".join(both), k=10).collect()]
    assert got2 == want2 and got2


def test_engine_suffix_no_match_empty(spark, ix):
    eng = QueryEngine(spark, ix)
    assert eng.bm25("*zzqx", k=5).collect() == []


@pytest.fixture(scope="module")
def ix_sfx(spark, fixture_dir, tmp_path_factory):
    from search_engine_spark.config import EngineConfig

    out = tmp_path_factory.mktemp("sfx") / "ix"
    build_index(spark, str(fixture_dir / "corpus.parquet"), str(out),
                cfg=EngineConfig(store_suffixes=True))
    return str(out)


def test_suffix_sidecar_parity_with_scan_path(spark, ix, ix_sfx):
    """The reversed-dictionary sidecar (build --suffixes) must expand
    and score suffix wildcards identically to the dictionary-scan path
    over the same corpus — it is a layout change, not a semantics
    change."""
    scan = QueryEngine(spark, ix)
    side = QueryEngine(spark, ix_sfx)
    assert scan._reversed_terms() is None
    assert side._reversed_terms() is not None
    for q in ("*ge", "*er sort", "me* *ge", "*zzqx"):
        assert side.expand_prefix_terms(q) == scan.expand_prefix_terms(q), q
    got = [(r["doc_id"], r["score"]) for r in side.bm25("sort *ge", k=10).collect()]
    want = [(r["doc_id"], r["score"]) for r in scan.bm25("sort *ge", k=10).collect()]
    assert got == want and got


def test_suffix_sidecar_plan_is_range_scan(spark, ix_sfx):
    """The sidecar candidate plan carries the reversed-key StartsWith
    down to the parquet scan (PushedFilters on rterm) — the range-scan
    shape Lucene's reversed field gives, vs the endswith full-dictionary
    scan of the fallback path."""
    eng = QueryEngine(spark, ix_sfx)
    plan = (
        eng._suffix_candidates(["ge", "er"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:400]
    assert "StringStartsWith(rterm" in pushed, pushed


def test_suffix_sidecar_refreshes_on_extend(spark, fixture_dir, ix_sfx):
    """Extends that omit the flag must refresh (not stale-drop) the
    sidecar: after extending with a second corpus batch, new vocabulary
    is reachable through the reversed dictionary."""
    from search_engine_spark.plans.build import extend_index_df

    eng0 = QueryEngine(spark, ix_sfx)
    base_terms = {r["term"] for r in eng0._reversed_terms().collect()}
    delta = spark.createDataFrame(
        [("r2", "x/new.py", "c9", "python",
          "zzqsuffixable zzqsuffixable zzqreversible")],
        "repo string, path string, commit string, lang string, content string",
    )
    extend_index_df(spark, delta, ix_sfx)
    eng = QueryEngine(spark, ix_sfx)
    rt = {r["term"]: r["rterm"] for r in eng._reversed_terms().collect()}
    assert "zzqsuffixable" in rt and rt["zzqsuffixable"] == "elbaxiffusqzz"
    assert base_terms <= set(rt)
    _, exp = eng.expand_prefix_terms("*able")
    assert "zzqsuffixable" in exp


def test_suggest_next_counts_bigrams(spark):
    from search_engine_spark.ops.search_sql import suggest_next_terms

    rows = [
        (1, "merge sort merge sort merge join"),
        (2, "merge sort again"),
        (3, "no context here"),
        (4, "ends with merge"),        # trailing context: no successor
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["term"], r["n"])
           for r in suggest_next_terms(spark, docs, "merge", k=5).collect()]
    assert got == [("sort", 3), ("join", 1)]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_engine_fuzzy2_matches_vocab_scan(spark, ix):
    """ED-2 expansion from the depth-2 SymSpell deletion index ==
    a full-vocabulary levenshtein scan with the same distance-first
    ranking (SymSpell's deletes-only candidate set has no false
    negatives within max_edit)."""
    eng = QueryEngine(spark, ix)
    vocab = [(r["term"], r["df"]) for r in
             eng.terms.select("term", "df").collect()]
    typo = "mxrgx"  # 2 edits from "merge"
    cand = sorted(
        ((_lev(typo, t), -df, t) for t, df in vocab
         if 1 <= _lev(typo, t) <= 2),
    )[:3]
    want = sorted({t for _, _, t in cand})
    got = eng.expand_query_terms([typo], max_edit=2)
    assert got == want and "merge" in got
    # ED-1 matches its own scan (df-ranked) — empty for this 2-edit typo
    ed1 = sorted(((-df, t) for t, df in vocab if _lev(typo, t) == 1))[:3]
    assert eng.expand_query_terms([typo], max_edit=1) == sorted(
        t for _, t in ed1
    )
    # known terms pass through untouched at either depth
    assert eng.expand_query_terms(["merge"], max_edit=2) == ["merge"]


def test_engine_fuzzy2_bm25_retrieves(spark, ix):
    eng = QueryEngine(spark, ix)
    got = eng.bm25("mxrgx", k=5, spell=True, fuzzy=2).collect()
    want = eng.bm25(" ".join(eng.expand_query_terms(["mxrgx"], max_edit=2)),
                    k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ] and got

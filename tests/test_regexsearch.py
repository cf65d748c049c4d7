"""Regex-over-trigram search: planner CNF soundness (property-tested
against Python's own regex engine), op-level equality with a
brute-force scan, and the engine-level path over the persisted
trigram sidecar."""

from __future__ import annotations

import re

import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.ops.regexsearch import (
    PATTERN_MAIN,
    plan_trigram_query,
    regex_search,
)
from search_engine_spark.plans.build import build_index
from search_engine_spark.plans.query import QueryEngine
from search_engine_spark.sources.corpus import load_corpus, with_identity

# ------------------------------------------------------------- planner units


def test_plan_literal_run():
    assert plan_trigram_query("customer") == [
        ["cus"], ["ust"], ["sto"], ["tom"], ["ome"], ["mer"]
    ]


def test_plan_alternation_cross_product():
    cnf = plan_trigram_query("(merge|join)")
    # every clause = one trigram of "merge" OR one of "join"
    for clause in cnf:
        assert any(t in ("mer", "erg", "rge") for t in clause)
        assert any(t in ("joi", "oin") for t in clause)


def test_plan_counted_repeat_keeps_run():
    assert plan_trigram_query("a{4}b") == [["aaa"], ["aab"]]


def test_plan_group_keeps_run():
    # purely-literal group must not break the surrounding run
    assert plan_trigram_query("a(bc)d") == [["abc"], ["bcd"]]


def test_plan_unprunable_returns_none():
    assert plan_trigram_query("a.b") is None
    assert plan_trigram_query("ab+c") is None  # runs stay under 3 chars
    assert plan_trigram_query("[xyz]+") is None


def test_plan_optional_not_required():
    # "xy(abcdef)?z" may match plain "xyz" — abc must not be required
    # alone, but every clause must hold for BOTH possible matches
    cnf = plan_trigram_query("xy(abcdef)?z")
    for m in ("xyz", "xyabcdefz"):
        tris = {m[i:i + 3] for i in range(len(m) - 2)}
        for clause in cnf:
            assert any(t in tris for t in clause), (m, clause)


def test_plan_junction_trigrams():
    # trigrams spanning node boundaries — the part a naive literal-run
    # scanner misses (Cox's suffix·prefix junction)
    assert plan_trigram_query("ab(c|d)") == [["abc", "abd"]]
    cnf = plan_trigram_query("->(next|prev)")
    assert ["->n", "->p"] in cnf and ["nex", "pre"] in cnf


def test_plan_exact_class():
    # small all-literal class is an exact one-char set
    cnf = plan_trigram_query("ta[bs]")
    assert cnf == [["tab", "tas"]]


def test_plan_subsumption():
    # a singleton clause implies any superset clause containing it
    cnf = plan_trigram_query(PATTERN_MAIN)
    flat = [frozenset(c) for c in cnf]
    for c in flat:
        assert not any(o < c for o in flat)


def test_plan_invalid_pattern_raises():
    with pytest.raises(re.error):
        plan_trigram_query("(unclosed")


# -------------------------------------------------- CNF necessity (property)

_WORDS = ["merge", "join", "table", "batch", "scan", "sort", "fast", "slow"]

_pattern_st = st.recursive(
    st.sampled_from(_WORDS),
    lambda inner: st.one_of(
        # alternation
        st.tuples(inner, inner).map(lambda t: f"({t[0]}|{t[1]})"),
        # concatenation with a separator the planner can't always use
        st.tuples(inner, st.sampled_from([" ", ".", "[ x]", " ?"]), inner).map(
            lambda t: f"{t[0]}{t[1]}{t[2]}"
        ),
        # optional / plus wrappers
        inner.map(lambda p: f"({p})?x"),
        inner.map(lambda p: f"({p})+"),
        # small exact class + junction-heavy shapes
        inner.map(lambda p: f"{p}[bs]"),
        inner.map(lambda p: f"x({p})"),
        inner.map(lambda p: f"{p}{{2}}"),
    ),
    max_leaves=4,
)


@settings(max_examples=200, deadline=None)
@given(pattern=_pattern_st, text=st.text(alphabet="mergjointablchscsortfa x.", max_size=60))
def test_cnf_is_necessary_for_match(pattern, text):
    """If the regex matches `text`, `text` must satisfy the planned CNF
    — the property that makes trigram pruning lossless."""
    try:
        re.compile(pattern)
    except re.error:
        assume(False)  # grammar can compose invalid repeats like (x)+{2}
    cnf = plan_trigram_query(pattern)
    if cnf is None or not re.search(pattern, text):
        return
    tris = {text[i : i + 3] for i in range(max(0, len(text) - 2))}
    for clause in cnf:
        assert any(t in tris for t in clause), (pattern, clause, text)


# ------------------------------------------------------------ op-level spark


@pytest.mark.parametrize(
    "pattern",
    [PATTERN_MAIN, r"(scan|sort) (fast|slow)", r"customer.*order", r"big qu"],
)
def test_regex_search_equals_brute_force(spark, fixture_dir, pattern):
    docs = (
        with_identity(load_corpus(spark, str(fixture_dir / "corpus.parquet")))
        .select("doc_id", F.col("content").alias("text"))
    )
    got = {r["doc_id"]: r["n_match"]
           for r in regex_search(spark, docs, pattern).collect()}
    n = F.regexp_count(F.lower(F.col("text")), F.lit(pattern)).cast("int")
    want = {
        r["doc_id"]: r["n_match"]
        for r in docs.select("doc_id", n.alias("n_match"))
        .where(F.col("n_match") > 0).collect()
    }
    assert got == want


# ----------------------------------------------------- plan-shape regression


def test_verify_not_pushed_below_semijoin(spark, fixture_dir):
    """The regex/contains verify must stay ABOVE the candidate
    semi-join (functions/barrier.py): Catalyst would otherwise push it
    into the corpus scan and evaluate it on every row, turning the
    O(candidates) verify into an O(corpus) regex pass."""
    from search_engine_spark.ops.trigram import NEEDLE_MAIN, substring_search

    docs = (
        with_identity(load_corpus(spark, str(fixture_dir / "corpus.parquet")))
        .select("doc_id", F.col("content").alias("text"))
    )
    rx = regex_search(spark, docs, PATTERN_MAIN)
    plan = rx._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    for m in re.findall(r"DataFilters: \[[^\]]*\]", plan):
        assert "regexp_extract_all" not in m, plan
    ss = substring_search(spark, docs, NEEDLE_MAIN)
    plan = ss._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    for m in re.findall(r"DataFilters: \[[^\]]*\]", plan):
        assert "Contains" not in m, plan


# ------------------------------------------------------------- engine level


@pytest.fixture(scope="module")
def tri_index(spark, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("rgx") / "ix"
    corpus = str(fixture_dir / "corpus.parquet")
    build_index(spark, corpus, str(out),
                cfg=EngineConfig(store_trigrams=True))
    return str(out), corpus


def test_engine_regex_matches_scan(spark, tri_index):
    ix, corpus = tri_index
    pattern = r"(merge|join)[a-z]*"  # hits roots AND compound vocab words
    eng = QueryEngine(spark, ix, cfg=EngineConfig(store_trigrams=True))
    got = {r["doc_id"]: r["n_match"]
           for r in eng.regex(pattern, corpus, k=100000).collect()}
    lt = F.lower(F.col("content"))
    n = F.regexp_count(lt, F.lit(pattern)).cast("int")
    want = {
        r["doc_id"]: r["n_match"]
        for r in with_identity(load_corpus(spark, corpus))
        .select("doc_id", n.alias("n_match"))
        .where(F.col("n_match") > 0).collect()
    }
    assert got == want and got


def test_engine_regex_unprunable_falls_back(spark, tri_index):
    """No usable CNF → full verify scan, no sidecar required."""
    ix, corpus = tri_index
    eng = QueryEngine(spark, ix)
    rows = eng.regex(r"me.ge", corpus, k=5).collect()
    assert rows and all(r["n_match"] >= 1 for r in rows)


def test_engine_regex_no_sidecar_raises(spark, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("rgx_no") / "ix"
    corpus = str(fixture_dir / "corpus.parquet")
    build_index(spark, corpus, str(out))  # no trigram sidecar
    eng = QueryEngine(spark, str(out))
    with pytest.raises(ValueError, match="store_trigrams"):
        eng.regex("mergetable", corpus).collect()

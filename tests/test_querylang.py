"""Query-string parser: lexical mapping onto engine call plan, plus
engine-level MUST (require=) rank identity vs the in-memory oracle."""

from __future__ import annotations

from search_engine_spark.functions.querylang import parse_query


def test_parse_all_sigils():
    p = parse_query('merge +join -sort tree~2 pre* *fix "binary search"')
    assert p.terms == ["merge", "tree", "pre*", "*fix"]
    assert p.require == ["join"]
    assert p.exclude == ["sort"]
    assert p.phrases == ["binary search"]
    assert p.fuzzy == 2
    assert p.query_string() == "merge tree pre* *fix binary search"


def test_parse_plain_and_edges():
    p = parse_query("merge sort")
    assert (p.terms, p.require, p.exclude, p.phrases, p.fuzzy) == (
        ["merge", "sort"], [], [], [], 0
    )
    # bare sigils pass through; ~ without digit = ED-1; dedup of +/-
    p = parse_query("+ - a~ +x +x -y -y")
    assert p.terms == ["+", "-", "a"]
    assert p.fuzzy == 1
    assert p.require == ["x"] and p.exclude == ["y"]


def test_parse_boost_sigil():
    p = parse_query("merge^2.5 +join^3 sort tree~1^2")
    # boost strips before sigil handling: `+join^3` is a boosted MUST;
    # `tree~1^2` boosts the fuzzy seed `tree`
    assert p.terms == ["merge", "sort", "tree"]
    assert p.boosts == {"merge": 2.5, "join": 3.0, "tree": 2.0}
    assert p.require == ["join"]
    assert p.fuzzy == 1
    # repeated boosted term keeps the last weight; bare ^ passes through
    p2 = parse_query("a^2 a^4 b^ ^3")
    assert p2.boosts["a"] == 4.0
    assert "b^" in p2.terms and "^3" in p2.terms


def test_parse_field_filters():
    p = parse_query("lang:py merge path:src/pkg0/* -sort repo:Core")
    assert p.fields == {"lang": "py", "path": "src/pkg0/*", "repo": "core"}
    assert p.terms == ["merge"]
    assert p.exclude == ["sort"]
    # unknown field names stay ordinary terms (code tokens survive)
    p2 = parse_query("std::vector foo:bar lang:en")
    assert p2.terms == ["std::vector", "foo:bar"]
    assert p2.fields == {"lang": "en"}
    # repeated field keeps the last value
    p3 = parse_query("lang:en lang:py")
    assert p3.fields == {"lang": "py"}

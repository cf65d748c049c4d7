"""Regex search over the trigram index — the planner half of the
Google-Code-Search design.

``ops/trigram.py`` answers exact-substring queries with a trigram AND.
Real code search (reference: interactive `/search` over source files;
public design: Cox, "Regular Expression Matching with a Trigram
Index", swtch.com/~rsc/regexp/regexp4.html — Google Code Search, also
Zoekt) answers *regex* queries the same way: compile the pattern into
a boolean query over trigrams that is NECESSARY for a match (every
matching doc satisfies it), run that query against the trigram index
to get a small candidate set, then run the actual regex engine only on
the candidates.

This module implements Cox's match-set analysis (bounded, sound):

- The pattern is parsed with the stdlib ``re`` parser into its AST.
- Each node computes an ``_Info``: its complete finite match set when
  small (``exact``), else bounded prefix/suffix sets plus a required
  CNF. Concatenation multiplies exact sets while they fit, demotes
  them to required trigram clauses when they outgrow the caps, and —
  the part a naive literal-run scanner misses — emits JUNCTION
  clauses from suffix(a)·prefix(b), so trigrams spanning node
  boundaries (``ab(c|d)``, ``->(next|prev)``, ``x+y``) still prune.
- Small all-literal character classes are exact one-char sets
  (``ta[bs]`` → {tab, tas}); alternations union exact sets or
  cross-product their CNFs (bounded, collapse stays sound).
- Everything genuinely unconstrained (dot, negated/category classes,
  backrefs, min=0 repeats) contributes nothing — sound.
- OR-of-ANDs over a string set compresses to zip-CNF: clause k holds
  the k-th trigram of every member, so CNF size never explodes.

The result is a CNF ``[[tri, ...], ...]``: a doc can match only if,
for every clause, it contains at least one of the clause's trigrams.
``None`` means "no index pruning possible" (e.g. ``a.*b`` with runs
< 3 chars) and the search degrades to a full verify scan — documented,
same as Cox's ALL query.

Soundness argument (why candidates ⊇ matches): every emitted trigram
comes from a literal run that *must* appear contiguously in any match,
and every clause is either such a required trigram or an OR across
alternation branches of required trigrams, one pick per branch — a doc
matching branch i contains all of branch i's required trigrams, hence
at least one member of every cross-product clause. The DuckDB twin
skips the index entirely (brute-force regex scan), so gate equality
PROVES both the necessity of the CNF and the soundness of the verify.

Semantics: matching runs against ``lower(text)`` (the trigram index is
case-folded); patterns are matched case-sensitively against that
lowered text. Match count is the standard leftmost non-overlapping
count (Spark ``regexp_count`` == DuckDB ``len(regexp_extract_all)``
for the supported subset — no backrefs or lookarounds, which RE2
rejects anyway).
"""

from __future__ import annotations

import re
from re import _constants as _C  # stdlib sre opcodes (public re internals)
from re import _parser as _P

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.barrier import verify_after_join
from search_engine_spark.functions.inline import inline_table
from search_engine_spark.ops.trigram import trigram_postings

# Alternation across two vocabulary words, plus a small exact class in
# the tail — exercises exact-set products, junction clauses, AND the
# zip-CNF demotion in one pattern.
PATTERN_MAIN = r"(merge|join) ta[bs]"
# Every literal context window stays under 3 chars -> planner returns
# None -> full-scan fallback path (Cox's ALL query), still
# oracle-checked. (Matches "query" with dots standing in for u/r.)
PATTERN_SCAN = r"q.e.y"

_MAX_SET = 8    # max strings per exact/prefix/suffix set
_MAX_STR = 8    # max chars per set string before demotion/trimming
_MAX_CROSS = 64  # branch-CNF cross-product cap; beyond it, collapse
_JUNC = 2       # chars kept per side when a set must be weakened


def _trigrams_of(run: str) -> list[str]:
    return [run[i : i + 3] for i in range(len(run) - 2)]


def _set_cnf(strings) -> list[frozenset[str]]:
    """OR-of-ANDs over a string set, as zip-CNF: clause k = {k-th
    trigram of each string}. Sound (a doc matching any member contains
    all of that member's trigrams, hence its k-th ∈ clause k); size =
    the smallest member's trigram count, so a member with no trigram
    yields no constraint."""
    tri_lists = [_trigrams_of(s) for s in strings]
    if not tri_lists:
        return []
    n = min(len(ts) for ts in tri_lists)
    return [frozenset(ts[k] for ts in tri_lists) for k in range(n)]


def _cross(branch_cnfs: list[list[frozenset[str]]]) -> list[frozenset[str]]:
    """CNF of (OR over branches of (AND of branch clauses)): every pick
    of one clause per branch unions into a clause of the result. Bounded
    by _MAX_CROSS; on overflow collapse each branch to its first clause
    (a weaker but still necessary constraint)."""
    size = 1
    for c in branch_cnfs:
        size *= len(c)
    if size > _MAX_CROSS:
        branch_cnfs = [c[:1] for c in branch_cnfs]
    acc: list[frozenset[str]] = [frozenset()]
    for clauses in branch_cnfs:
        acc = [a | c for a in acc for c in clauses]
    return acc


class _Info:
    """Cox's per-node match analysis (regexp4.html §"Transformation"):

    - ``exact``: the COMPLETE finite set of strings the node can match
      (None when infinite or over the caps). No trimming inside exact.
    - otherwise: every match starts with some ``pre`` element, ends
      with some ``suf`` element (elements may be shorter than the
      bound), and satisfies every ``cnf`` clause.
    """

    __slots__ = ("exact", "pre", "suf", "cnf")

    def __init__(self, exact=None, pre=frozenset({""}), suf=frozenset({""}),
                 cnf=()):
        self.exact = frozenset(exact) if exact is not None else None
        self.pre = frozenset(pre)
        self.suf = frozenset(suf)
        self.cnf = list(cnf)

    # demoted views: what this node guarantees when treated non-exactly
    def d_pre(self):
        return self.exact if self.exact is not None else self.pre

    def d_suf(self):
        return self.exact if self.exact is not None else self.suf

    def d_cnf(self):
        return _set_cnf(self.exact) if self.exact is not None else self.cnf


_UNKNOWN = _Info()  # matches something, nothing known (., [^x], \w, backref)
_EMPTY = _Info(exact={""})  # matches the empty string (anchors, lookarounds)


def _weaken(strings, side: str) -> frozenset[str]:
    """Bound a pre/suf set: trim elements to _JUNC chars (a prefix of a
    prefix is a prefix; dito suffixes), and if still too many collapse
    to {""} — always-weaker, never unsound."""
    out = frozenset(
        (s[:_JUNC] if side == "pre" else s[-_JUNC:]) for s in strings
    )
    return out if len(out) <= _MAX_SET else frozenset({""})


def _cap(strings, side: str) -> frozenset[str]:
    """Keep set elements within _MAX_STR chars (trim toward the kept
    side); weaken wholesale if the set itself is too large."""
    out = frozenset(
        (s[:_MAX_STR] if side == "pre" else s[-_MAX_STR:]) for s in strings
    )
    return out if len(out) <= _MAX_SET else _weaken(out, side)


def _concat(a: _Info, b: _Info) -> _Info:
    if a.exact is not None and b.exact is not None:
        prod = {x + y for x in a.exact for y in b.exact}
        if len(prod) <= _MAX_SET and all(len(s) <= _MAX_STR for s in prod):
            return _Info(exact=prod)
        # demote the full product: its zip-CNF is required, and its
        # trimmed forms still bound the prefixes/suffixes
        return _Info(
            pre=_cap(prod, "pre"), suf=_cap(prod, "suf"), cnf=_set_cnf(prod)
        )
    cnf = a.d_cnf() + b.d_cnf()
    junction = {s + p for s in a.d_suf() for p in b.d_pre()}
    if len(junction) <= _MAX_CROSS:
        cnf = cnf + _set_cnf(junction)
    if a.exact is not None:
        pre = _cap({x + p for x in a.exact for p in b.d_pre()}, "pre")
    else:
        pre = a.pre
    if b.exact is not None:
        suf = _cap({s + y for s in a.d_suf() for y in b.exact}, "suf")
    else:
        suf = b.suf
    return _Info(pre=pre, suf=suf, cnf=cnf)


def _alternate(infos: list[_Info]) -> _Info:
    union = set()
    for i in infos:
        if i.exact is None:
            union = None
            break
        union |= i.exact
    if union is not None and len(union) <= _MAX_SET:
        return _Info(exact=union)
    branch_cnfs = [i.d_cnf() for i in infos]
    cnf = _cross(branch_cnfs) if all(branch_cnfs) else []
    pre = set().union(*(i.d_pre() for i in infos))
    suf = set().union(*(i.d_suf() for i in infos))
    return _Info(pre=_cap(pre, "pre"), suf=_cap(suf, "suf"), cnf=cnf)


def _repeat(lo: int, hi, body: _Info) -> _Info:
    if lo == 0:
        if hi == 1 and body.exact is not None:  # x? stays exact
            opt = body.exact | {""}
            if len(opt) <= _MAX_SET:
                return _Info(exact=opt)
        return _UNKNOWN  # x*, x{0,n}: may be absent — no constraint
    if lo == hi and body.exact is not None:
        acc = _Info(exact={""})
        for _ in range(lo):
            acc = _concat(acc, body)
        return acc
    # x+ / x{lo,}: at least one full copy — its requirements hold, and
    # a match starts/ends with a copy's prefix/suffix
    return _Info(pre=_cap(body.d_pre(), "pre"), suf=_cap(body.d_suf(), "suf"),
                 cnf=body.d_cnf())


def _class_info(av) -> _Info:
    """IN node: a small all-literal (or small-range) class is an exact
    one-char set; anything else (negation, categories, wide ranges) is
    unconstrained."""
    chars: set[str] = set()
    for op, v in av:
        if op is _C.LITERAL:
            chars.add(chr(v))
        elif op is _C.RANGE and v[1] - v[0] + 1 <= _MAX_SET:
            chars.update(chr(c) for c in range(v[0], v[1] + 1))
        else:
            return _UNKNOWN
        if len(chars) > _MAX_SET:
            return _UNKNOWN
    return _Info(exact=chars) if chars else _UNKNOWN


def _analyze(seq) -> _Info:
    acc = _Info(exact={""})
    for op, av in seq:
        if op is _C.LITERAL:
            node = _Info(exact={chr(av)})
        elif op is _C.SUBPATTERN:
            node = _analyze(av[3])
        elif op is _C.ATOMIC_GROUP:
            node = _analyze(av)
        elif op is _C.BRANCH:
            node = _alternate([_analyze(b) for b in av[1]])
        elif op in (_C.MAX_REPEAT, _C.MIN_REPEAT, _C.POSSESSIVE_REPEAT):
            lo, hi, body = av
            node = _repeat(lo, hi, _analyze(body))
        elif op is _C.IN:
            node = _class_info(av)
        elif op in (_C.AT, _C.ASSERT, _C.ASSERT_NOT):
            node = _EMPTY  # consumes nothing
        else:
            # ANY / NOT_LITERAL / CATEGORY / GROUPREF / ...
            node = _UNKNOWN
        acc = _concat(acc, node)
    return acc


def plan_trigram_query(pattern: str) -> list[list[str]] | None:
    """Compile ``pattern`` into a CNF trigram query (AND of OR-clauses,
    each clause a sorted trigram list), or None if the pattern admits
    no index pruning. Raises ``re.error`` on an invalid pattern."""
    info = _analyze(_P.parse(pattern))
    if info.exact is not None:
        clauses = _set_cnf(info.exact)
    else:
        # harvest what the final prefix/suffix sets still hold
        clauses = info.cnf + _set_cnf(info.pre) + _set_cnf(info.suf)
    uniq: list[frozenset[str]] = []
    seen: set[frozenset[str]] = set()
    for c in clauses:
        if c and c not in seen:
            seen.add(c)
            uniq.append(c)
    # subsumption: a clause that is a superset of another is implied by
    # it (satisfying the subset clause satisfies the superset) — drop it
    out = [
        sorted(c) for c in uniq
        if not any(o < c for o in uniq)
    ]
    return out or None


def _candidates(tp: DataFrame, cnf: list[list[str]], spark: SparkSession) -> DataFrame:
    """doc_ids satisfying the CNF against a (doc_id, tri) posting set:
    broadcast the (tri, clause_id) table, count distinct satisfied
    clauses per doc. One shuffle, input pre-pruned to the query's
    trigrams."""
    rows = [(t, i) for i, clause in enumerate(cnf) for t in clause]
    q = inline_table(spark, rows, "tri string, clause_id int")
    return (
        tp.join(F.broadcast(q), "tri")
        .select("doc_id", "clause_id")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("nc"))
        .where(F.col("nc") == len(cnf))
        .select("doc_id")
    )


def regex_search(
    spark: SparkSession, docs: DataFrame, pattern: str
) -> DataFrame:
    """Regex search via trigram-CNF prune + regex verify →
    (doc_id, n_match). The verify (``regexp_count`` over lower(text))
    touches content only for CNF survivors; with no usable CNF it
    degrades to the documented full verify scan."""
    re.compile(pattern)  # fail fast on invalid patterns
    lt = F.lower(F.col("text"))
    n_match = F.regexp_count(lt, F.lit(pattern)).cast("int")
    cnf = plan_trigram_query(pattern)
    if cnf is None:
        return (
            docs.select("doc_id", n_match.alias("n_match"))
            .where(F.col("n_match") > 0)
        )
    all_tris = sorted({t for clause in cnf for t in clause})
    cand = _candidates(trigram_postings(docs, only=all_tris), cnf, spark)
    return (
        docs.join(cand, "doc_id", "left_semi")
        .select("doc_id", n_match.alias("n_match"))
        # barrier: keep the regex verify ABOVE the semi-join (see
        # functions/barrier.py) so it runs on CNF survivors only
        .where(verify_after_join(F.col("n_match") > 0))
    )


# --------------------------------------------------------------- oracle SQL

def _regex_sql(pattern: str) -> str:
    """Independent algorithm: brute-force regex scan, no index —
    equality proves CNF necessity + verify soundness."""
    pat = pattern.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{pat}')) AS INTEGER)
           AS n_match
FROM documents
WHERE len(regexp_extract_all(lower(text), '{pat}')) > 0
"""


ORACLE_SQL = {
    "search_regex": _regex_sql(PATTERN_MAIN),
    "search_regex_scan": _regex_sql(PATTERN_SCAN),
}

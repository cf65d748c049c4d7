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

This module implements a sound, conservative subset of Cox's analysis:

- The pattern is parsed with the stdlib ``re`` parser into its AST.
- Required literal runs (concatenations of LITERAL nodes, including
  through purely-literal groups and exactly-counted repeats) emit
  their trigrams as required-AND clauses.
- Alternations combine branch requirements into CNF by bounded
  cross-product (OR of ANDs -> AND of ORs); a branch with no usable
  literals poisons the alternation (contributes nothing — sound).
- Everything else (classes, dot, anchors, lookarounds, min=0 repeats)
  conservatively breaks literal runs and contributes no constraint.

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

# Alternation across two vocabulary words, plus a character class in the
# tail — exercises branch CNF cross-product AND the conservative
# "class contributes nothing" path in one pattern.
PATTERN_MAIN = r"(merge|join) ta[bs]"
# No literal run reaches 3 chars -> planner returns None -> full-scan
# fallback path (Cox's ALL query), still oracle-checked.
PATTERN_SCAN = r"bi. (qu|st)"

_MAX_CLAUSES = 64  # CNF cross-product cap; beyond it, collapse (still sound)


def _trigrams_of(run: str) -> list[str]:
    return [run[i : i + 3] for i in range(len(run) - 2)]


def _pure_literal(seq) -> str | None:
    """The exact string a subsequence always matches, or None if it is
    anything but a plain literal concatenation."""
    out: list[str] = []
    for op, av in seq:
        if op is _C.LITERAL:
            out.append(chr(av))
        elif op is _C.SUBPATTERN:
            inner = _pure_literal(av[3])
            if inner is None:
                return None
            out.append(inner)
        else:
            return None
    return "".join(out)


def _cross(branch_cnfs: list[list[frozenset[str]]]) -> list[frozenset[str]]:
    """CNF of (OR over branches of (AND of branch clauses)): every pick
    of one clause per branch unions into a clause of the result. Bounded
    by _MAX_CLAUSES; on overflow collapse each branch to its first
    clause (a weaker but still necessary constraint)."""
    size = 1
    for c in branch_cnfs:
        size *= len(c)
    if size > _MAX_CLAUSES:
        branch_cnfs = [c[:1] for c in branch_cnfs]
    acc: list[frozenset[str]] = [frozenset()]
    for clauses in branch_cnfs:
        acc = [a | c for a in acc for c in clauses]
    return acc


class _Walk:
    """Linear walk over one alternation-free level: maintains the
    current required literal run; non-literal nodes flush it."""

    def __init__(self) -> None:
        self.run: list[str] = []
        self.clauses: list[frozenset[str]] = []

    def flush(self) -> None:
        run = "".join(self.run)
        self.run = []
        for t in _trigrams_of(run):
            self.clauses.append(frozenset([t]))

    def visit(self, seq) -> None:
        for op, av in seq:
            if op is _C.LITERAL:
                self.run.append(chr(av))
            elif op is _C.SUBPATTERN:
                lit = _pure_literal(av[3])
                if lit is not None:
                    self.run.append(lit)  # run continues through (abc)
                else:
                    self.flush()
                    self.clauses.extend(_analyze(av[3]))
            elif op is _C.ATOMIC_GROUP:
                self.flush()
                self.clauses.extend(_analyze(av))
            elif op is _C.BRANCH:
                self.flush()
                branch_cnfs = []
                for b in av[1]:
                    c = _analyze(b)
                    if not c:  # unconstrained branch poisons the OR
                        branch_cnfs = []
                        break
                    branch_cnfs.append(c)
                if branch_cnfs:
                    self.clauses.extend(_cross(branch_cnfs))
            elif op in (_C.MAX_REPEAT, _C.MIN_REPEAT, _C.POSSESSIVE_REPEAT):
                lo, hi, body = av
                lit = _pure_literal(body)
                if lit is not None and lo == hi:
                    self.run.append(lit * lo)  # a{3} keeps the run alive
                else:
                    self.flush()
                    if lo >= 1:
                        if lit is not None:
                            for t in _trigrams_of(lit * lo):
                                self.clauses.append(frozenset([t]))
                        else:
                            self.clauses.extend(_analyze(body))
            else:
                # IN / ANY / NOT_LITERAL / AT / CATEGORY / GROUPREF /
                # ASSERT / ASSERT_NOT: no constraint, breaks the run
                self.flush()
        self.flush()


def _analyze(seq) -> list[frozenset[str]]:
    w = _Walk()
    w.visit(seq)
    # dedupe, keep deterministic order
    seen: set[frozenset[str]] = set()
    out = []
    for c in w.clauses:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def plan_trigram_query(pattern: str) -> list[list[str]] | None:
    """Compile ``pattern`` into a CNF trigram query (AND of OR-clauses,
    each clause a sorted trigram list), or None if the pattern admits
    no index pruning. Raises ``re.error`` on an invalid pattern."""
    clauses = _analyze(_P.parse(pattern))
    if not clauses:
        return None
    return [sorted(c) for c in clauses]


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
    cand = _candidates(trigram_postings(docs), cnf, spark)
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

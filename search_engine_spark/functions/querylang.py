"""Lucene-QueryParser-style query-string syntax → engine call plan.

The reference exposes a single search box (`services/engine/internal/
handlers/search.handler.go` takes the raw string); power syntax is the
Lucene convention every search UI inherits. Supported subset, mapped
onto capabilities the engine already has:

=============  =====================================================
``term``       SHOULD (plain disjunctive BM25 term)
``+term``      MUST → ``require=`` (doc must contain it; still scores)
``-term``      MUST_NOT → ``exclude=``
``term*``      trailing-wildcard prefix expansion (stays in the query;
               ``QueryEngine.bm25`` expands it)
``*term``      leading-wildcard suffix expansion (same)
``term~``      fuzzy, ED-1; ``term~2`` → ED-2 → ``spell/fuzzy=``
``term^2.5``   per-term boost → ``boost=`` (scales the term's BM25
               contribution; composes with ``+``/``-`` sigils)
``lang:py``    field filter → ``field=`` (Lucene filter clause:
               restricts hits by metadata, scoring unchanged; known
               fields only so code tokens like ``std::vector`` stay
               terms; trailing ``*`` = prefix match)
``"a b"``      quoted phrase → ``phrases=`` (pre-top-k adjacency
               FILTER over the positional sidecar, Lucene quoted-
               phrase semantics; words still score disjunctively)
=============  =====================================================

Parsing is purely lexical (whitespace tokens, one quoted span at a
time) — no grouping, no field prefixes, no OR/AND keywords; those
compose through the engine's explicit API instead. Unknown sigils
pass through untouched (the tokenizer drops punctuation anyway, so a
stray ``(`` can't corrupt the term stream)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)    # SHOULD (may carry * wildcards)
    require: list[str] = field(default_factory=list)  # MUST
    exclude: list[str] = field(default_factory=list)  # MUST_NOT
    phrases: list[str] = field(default_factory=list)  # quoted spans
    fuzzy: int = 0                                    # max ~N seen (0 = none)
    boosts: dict[str, float] = field(default_factory=dict)  # term -> ^weight
    fields: dict[str, str] = field(default_factory=dict)    # field -> value

    def query_string(self) -> str:
        """The SHOULD part (incl. wildcards and phrase words — phrase
        words still retrieve; the phrase itself filters via
        ``bm25(phrases=)`` over the positional sidecar)."""
        return " ".join([*self.terms, *self.phrases])


_FUZZY = re.compile(r"^(?P<t>[^~\s]+)~(?P<d>[12])?$")
_BOOST = re.compile(r"^(?P<t>.+)\^(?P<w>\d+(?:\.\d+)?)$")
# closed field-name set: a generic name:value rule would eat code
# tokens (`std::vector`, `http://…`); these are the engine's metadata
# surface (QueryEngine meta_cols + path)
_FIELD = re.compile(
    r"^(?P<f>lang|repo|path|commit|title|keywords):(?P<v>\S+)$"
)


def parse_query(raw: str) -> ParsedQuery:
    out = ParsedQuery()
    rest = raw
    for m in re.finditer(r'"([^"]*)"', raw):
        span = m.group(1).strip().lower()
        if span:
            out.phrases.append(span)
    rest = re.sub(r'"[^"]*"', " ", rest)
    for w in rest.split():
        wl = w.lower()
        # field filters route out of term handling entirely (a repeated
        # field keeps the last value, like Lucene QueryParser)
        fm = _FIELD.match(wl)
        if fm:
            out.fields[fm.group("f")] = fm.group("v")
            continue
        # boost suffix strips first (Lucene precedence: `+term^2` is a
        # boosted MUST); a repeated boosted term keeps the LAST weight
        bm = _BOOST.match(wl)
        if bm and len(bm.group("t")) > 0:
            wl = bm.group("t")
            # boost keys are bare terms: strip MUST/NOT sigils and a
            # fuzzy marker (`tree~1^2` boosts the expansion seed `tree`)
            key = re.sub(r"~[12]?$", "", wl.lstrip("+-"))
            if key:
                out.boosts[key] = float(bm.group("w"))
        if wl.startswith("+") and len(wl) > 1:
            out.require.append(wl[1:])
        elif wl.startswith("-") and len(wl) > 1:
            out.exclude.append(wl[1:])
        else:
            fm = _FUZZY.match(wl)
            if fm:
                out.terms.append(fm.group("t"))
                out.fuzzy = max(out.fuzzy, int(fm.group("d") or 1))
            else:
                out.terms.append(wl)
    out.require = sorted(set(out.require))
    out.exclude = sorted(set(out.exclude))
    return out

"""Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980 — the published algorithm, re-implemented from the
paper's rule lists; no code copied).

Three property-identical forms (the same contract as the s-stemmer in
functions/tokenize.py, one tier up):

- :func:`porter_stem`        — scalar Python (the reference; query side)
- :func:`porter_series`      — pandas form for the vectorized tokenizer
  kernel (dictionary-cached over the batch vocabulary: stemming is a
  pure per-TYPE function, so each distinct token stems once per batch)
- :func:`porter_stages_sql` (+ :func:`porter_duck_ctes` /
  :func:`porter_spark_stem`) — the SAME algorithm generated as portable
  SQL (Spark SQL and DuckDB dialects differ only in regexp_replace's
  global flag), for the JVM tokenizer kernel and the DuckDB oracle
  twins. Conditions (m, *v*, *d, *o) evaluate on a per-step CV-class
  string built by a fixed regex chain — no lookbehind (RE2-safe), no
  loops: the context-dependent 'y' resolves through an unrolled
  alternation cascade (a y-run's classes alternate from its start, so
  ⌈25/2⌉ passes of the Cy/Vy pair settle any token under the 25-char
  term cap).

Tokens shorter than 3 characters are returned unchanged (the classic
porter.c / Lucene PorterStemmer guard).
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _cv(word: str) -> str:
    """Per-char consonant/vowel classes ('C'/'V'). 'y' is a vowel iff
    preceded by a consonant (per the paper's cons() definition; a 'y'
    chain alternates from its start)."""
    out = []
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            out.append("V")
        elif ch == "y" and i > 0 and out[i - 1] == "C":
            out.append("V")
        else:
            out.append("C")
    return "".join(out)


def _measure(cv: str) -> int:
    """m in [C](VC)^m[V]: the number of V-run → C-run transitions."""
    m = 0
    for i in range(len(cv) - 1):
        if cv[i] == "V" and cv[i + 1] == "C":
            m += 1
    return m


def _has_vowel(cv: str) -> bool:
    return "V" in cv


def _ends_double_consonant(word: str, cv: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and cv[-1] == "C"
        and cv[-2] == "C"
    )


def _ends_cvc(word: str, cv: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, last not w/x/y."""
    return (
        len(word) >= 3
        and cv[-3:] == "CVC"
        and word[-1] not in "wxy"
    )


# Step rule tables: (suffix, replacement, min_m). min_m is the paper's
# (m > N) condition on the stem; None = unconditional. Longest match
# wins WITHIN a step; if the longest match's condition fails, the step
# makes no change (the paper's semantics).
STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
STEP4 = [
    ("al", ""), ("ance", ""), ("ence", ""), ("er", ""), ("ic", ""),
    ("able", ""), ("ible", ""), ("ant", ""), ("ement", ""),
    ("ment", ""), ("ent", ""), ("ion", ""), ("ou", ""), ("ism", ""),
    ("ate", ""), ("iti", ""), ("ous", ""), ("ive", ""), ("ize", ""),
]


def _longest(word: str, table: list[tuple[str, str]]):
    best = None
    for suf, rep in table:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    """The scalar reference implementation (paper steps 1a–5b)."""
    if len(word) < 3:
        return word
    w = word

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    fired_1b = False
    if w.endswith("eed"):
        stem = w[:-3]
        if _measure(_cv(stem)) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        stem = w[:-2]
        if _has_vowel(_cv(stem)):
            w = stem
            fired_1b = True
    elif w.endswith("ing"):
        stem = w[:-3]
        if _has_vowel(_cv(stem)):
            w = stem
            fired_1b = True
    if fired_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        else:
            cv = _cv(w)
            if _ends_double_consonant(w, cv) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(cv) == 1 and _ends_cvc(w, cv):
                w = w + "e"

    # ---- step 1c
    if w.endswith("y") and _has_vowel(_cv(w[:-1])):
        w = w[:-1] + "i"

    # ---- step 2 (m > 0 on the stem)
    hit = _longest(w, STEP2)
    if hit is not None:
        suf, rep = hit
        stem = w[: len(w) - len(suf)]
        if _measure(_cv(stem)) > 0:
            w = stem + rep

    # ---- step 3 (m > 0)
    hit = _longest(w, STEP3)
    if hit is not None:
        suf, rep = hit
        stem = w[: len(w) - len(suf)]
        if _measure(_cv(stem)) > 0:
            w = stem + rep

    # ---- step 4 (m > 1; 'ion' additionally needs stem ending s/t)
    hit = _longest(w, STEP4)
    if hit is not None:
        suf, rep = hit
        stem = w[: len(w) - len(suf)]
        ok = _measure(_cv(stem)) > 1
        if suf == "ion":
            ok = ok and stem.endswith(("s", "t"))
        if ok:
            w = stem + rep

    # ---- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        cv = _cv(stem)
        m = _measure(cv)
        if m > 1 or (m == 1 and not _ends_cvc(stem, cv)):
            w = stem

    # ---- step 5b
    cv = _cv(w)
    if _measure(cv) > 1 and _ends_double_consonant(w, cv) and w.endswith("l"):
        w = w[:-1]

    return w


def porter_series(t):
    """Pandas form: dictionary-cached over the batch's distinct tokens
    (stemming is per-type, so each distinct token stems once)."""
    import pandas as pd

    uniq = pd.unique(t)
    return t.map({u: porter_stem(u) for u in uniq})


# ---------------------------------------------------------------------------
# SQL generation (portable: Spark SQL + DuckDB). One "stage" = one
# SELECT layer (DuckDB CTE / Spark select) producing columns over the
# fixed names orig / w / cv / f1b. regexp_replace is global by default
# in Spark and needs the 'g' flag in DuckDB — the only dialect split.
# ---------------------------------------------------------------------------

# ⌈(MAX_TERM_LEN-1)/2⌉ alternating passes settle any y-run the term cap
# admits; derived (not hardcoded) so raising the cap can never silently
# leave unresolved 'y' chars corrupting the CV string in the SQL twins.
from search_engine_spark.config import MAX_TERM_LEN

_Y_PASSES = -(-(MAX_TERM_LEN - 1) // 2)  # ⌈(25-1)/2⌉ = 12


def _rr(dialect: str, x: str, pat: str, rep: str) -> str:
    if dialect == "duck":
        return f"regexp_replace({x}, '{pat}', '{rep}', 'g')"
    return f"regexp_replace({x}, '{pat}', '{rep}')"


def cv_sql(dialect: str, w: str = "w") -> str:
    """CV-class string of ``w``: vowels→V, others→C, then the y
    alternation cascade (y after C-class is a vowel, after V-class a
    consonant, at word start a consonant)."""
    x = _rr(dialect, w, "[aeiou]", "V")
    x = _rr(dialect, x, "[^Vy]", "C")
    x = _rr(dialect, x, "^y", "C")
    for _ in range(_Y_PASSES):
        x = _rr(dialect, x, "Cy", "CV")
        x = _rr(dialect, x, "Vy", "VC")
    return x


def _cv_stages(dialect: str, carry: tuple[str, ...]) -> list[dict[str, str]]:
    """cv computation split across several stages (≤6 regex ops per
    stage) so each stage's generated JVM method stays under janino's
    per-method bytecode limit — one giant nested expression makes
    whole-stage codegen fall back to interpreted eval."""
    base = {c: c for c in carry}
    stages = []
    x = _rr(dialect, "w", "[aeiou]", "V")
    x = _rr(dialect, x, "[^Vy]", "C")
    x = _rr(dialect, x, "^y", "C")
    stages.append({**base, "cv": x})
    for chunk in range(0, _Y_PASSES, 3):
        x = "cv"
        for _ in range(min(3, _Y_PASSES - chunk)):
            x = _rr(dialect, x, "Cy", "CV")
            x = _rr(dialect, x, "Vy", "VC")
        stages.append({**base, "cv": x})
    return stages


def _stem_cv(k: int) -> str:
    """cv of the stem after dropping a k-char suffix — a PREFIX of the
    word's cv (y classes depend only on preceding chars)."""
    return f"substring(cv, 1, length(w) - {k})"


def _m_ge_1(cvx: str) -> str:
    return f"{cvx} LIKE '%VC%'"


def _m_ge_2(cvx: str) -> str:
    return f"(length({cvx}) - length(replace({cvx}, 'VC', ''))) >= 4"


def _m_eq_1(cvx: str) -> str:
    return f"(length({cvx}) - length(replace({cvx}, 'VC', ''))) = 2"


def _has_v(cvx: str) -> str:
    return f"{cvx} LIKE '%V%'"


def _drop(k: int) -> str:
    return f"substring(w, 1, length(w) - {k})"


def _suffix_case(table: list[tuple[str, str]], cond: str) -> str:
    """Longest-match CASE over a (suffix, replacement) table with a
    per-rule m-condition template (cond formats with the stem cv)."""
    arms = []
    for suf, rep in sorted(table, key=lambda x: -len(x[0])):
        k = len(suf)
        stem = _drop(k)
        new = f"{stem} || '{rep}'" if rep else stem
        c = cond.format(cv=_stem_cv(k), k=k, stem=stem)
        arms.append(
            f"WHEN right(w, {k}) = '{suf}' THEN "
            f"CASE WHEN {c} THEN {new} ELSE w END"
        )
    return "CASE " + " ".join(arms) + " ELSE w END"


def porter_stages_sql(dialect: str) -> list[dict[str, str]]:
    """The full algorithm as a list of SELECT stages. Input relation
    must provide ``w`` (the lowercase token); stage columns are w / cv
    / f1b / orig; after the last stage ``w`` is the stem."""
    dd = (  # *d on (w, cv): last two letters equal, both consonants
        "(length(w) >= 2 AND right(w, 1) = substring(w, length(w)-1, 1)"
        " AND right(cv, 2) = 'CC')"
    )
    oo = (  # *o on (w, cv)
        "(right(cv, 3) = 'CVC' AND right(w, 1) NOT IN ('w', 'x', 'y'))"
    )
    stages: list[dict[str, str]] = []
    stages.append({"orig": "w", "w": "w"})
    # step 1a (unconditional longest-match)
    stages.append({"orig": "orig", "w": (
        "CASE WHEN right(w, 4) = 'sses' THEN " + _drop(2) +
        " WHEN right(w, 3) = 'ies' THEN " + _drop(2) +
        " WHEN right(w, 2) = 'ss' THEN w"
        " WHEN right(w, 1) = 's' THEN " + _drop(1) +
        " ELSE w END"
    )})
    stages.extend(_cv_stages(dialect, ("orig", "w")))
    # step 1b: eed (m>0 → drop d) | ed (*v* → drop, fire) | ing (same)
    stages.append({"orig": "orig", "w": (
        "CASE WHEN right(w, 3) = 'eed' THEN "
        f"CASE WHEN {_m_ge_1(_stem_cv(3))} THEN {_drop(1)} ELSE w END"
        " WHEN right(w, 2) = 'ed' THEN "
        f"CASE WHEN {_has_v(_stem_cv(2))} THEN {_drop(2)} ELSE w END"
        " WHEN right(w, 3) = 'ing' THEN "
        f"CASE WHEN {_has_v(_stem_cv(3))} THEN {_drop(3)} ELSE w END"
        " ELSE w END"
    ), "f1b": (
        "(right(w, 3) <> 'eed' AND ("
        f"(right(w, 2) = 'ed' AND {_has_v(_stem_cv(2))})"
        f" OR (right(w, 3) = 'ing' AND {_has_v(_stem_cv(3))})))"
    )})
    stages.extend(_cv_stages(dialect, ("orig", "w", "f1b")))
    # step 1b fixes (only when 1b fired)
    stages.append({"orig": "orig", "w": (
        "CASE WHEN NOT f1b THEN w"
        " WHEN right(w, 2) IN ('at', 'bl', 'iz') THEN w || 'e'"
        f" WHEN {dd} AND right(w, 1) NOT IN ('l', 's', 'z') THEN {_drop(1)}"
        f" WHEN {_m_eq_1('cv')} AND {oo} THEN w || 'e'"
        " ELSE w END"
    )})
    stages.extend(_cv_stages(dialect, ("orig", "w")))
    # step 1c: (*v*) y → i
    stages.append({"orig": "orig", "w": (
        f"CASE WHEN right(w, 1) = 'y' AND {_has_v(_stem_cv(1))} "
        f"THEN {_drop(1)} || 'i' ELSE w END"
    )})
    stages.extend(_cv_stages(dialect, ("orig", "w")))
    stages.append({"orig": "orig",
                   "w": _suffix_case(STEP2, "{cv} LIKE '%VC%'")})
    stages.extend(_cv_stages(dialect, ("orig", "w")))
    stages.append({"orig": "orig",
                   "w": _suffix_case(STEP3, "{cv} LIKE '%VC%'")})
    stages.extend(_cv_stages(dialect, ("orig", "w")))
    # step 4: m>1; 'ion' additionally needs stem ending s/t
    step4_cond = {
        suf: _m_ge_2("{cv}") if suf != "ion"
        else _m_ge_2("{cv}") + " AND right({stem}, 1) IN ('s', 't')"
        for suf, _ in STEP4
    }
    arms = []
    for suf, rep in sorted(STEP4, key=lambda x: -len(x[0])):
        k = len(suf)
        stem = _drop(k)
        c = step4_cond[suf].format(cv=_stem_cv(k), stem=stem)
        arms.append(
            f"WHEN right(w, {k}) = '{suf}' THEN "
            f"CASE WHEN {c} THEN {stem} ELSE w END"
        )
    stages.append({"orig": "orig",
                   "w": "CASE " + " ".join(arms) + " ELSE w END"})
    stages.extend(_cv_stages(dialect, ("orig", "w")))
    # step 5a: drop final e when m>1, or m=1 and not *o (on the stem)
    s_cv = _stem_cv(1)
    s_w = _drop(1)
    s_oo = (
        f"(right({s_cv}, 3) = 'CVC'"
        f" AND right({s_w}, 1) NOT IN ('w', 'x', 'y'))"
    )
    stages.append({"orig": "orig", "w": (
        "CASE WHEN right(w, 1) = 'e' AND ("
        f"{_m_ge_2(s_cv)} OR ({_m_eq_1(s_cv)} AND NOT {s_oo})"
        f") THEN {s_w} ELSE w END"
    )})
    stages.extend(_cv_stages(dialect, ("orig", "w")))
    # step 5b: (m>1, *d, ends l) drop one l
    stages.append({"orig": "orig", "w": (
        f"CASE WHEN {_m_ge_2('cv')} AND {dd} AND right(w, 1) = 'l' "
        f"THEN {_drop(1)} ELSE w END"
    )})
    # the classic short-token guard
    stages.append({"w": "CASE WHEN length(orig) < 3 THEN orig ELSE w END"})
    return stages


def porter_duck_ctes(tok_relation: str, cols: str = "doc_id") -> str:
    """DuckDB CTE chain: ``tok_relation`` must yield (``cols``…, w);
    returns CTE text ending in relation ``pstem`` with (cols…, w=stem).
    Embed as ``WITH {this}, …``."""
    stages = porter_stages_sql("duck")
    parts = [f"ptok AS ({tok_relation})"]
    prev = "ptok"
    for i, st in enumerate(stages):
        sel = ", ".join(f"{expr} AS {col}" for col, expr in st.items())
        name = "pstem" if i == len(stages) - 1 else f"ps{i}"
        parts.append(f"{name} AS (SELECT {cols}, {sel} FROM {prev})")
        prev = name
    return ",\n".join(parts)


def porter_spark_stem(df, word_col: str = "w"):
    """Apply the generated Spark SQL stages to ``df`` (must carry
    ``word_col``); returns df with ``word_col`` replaced by the stem
    (helper cols dropped). Pure JVM expressions — no Python workers."""
    from pyspark.sql import functions as F

    stages = porter_stages_sql("spark")
    cur = df.withColumnRenamed(word_col, "w") if word_col != "w" else df
    passthrough = [c for c in cur.columns if c not in ("w", "cv", "f1b", "orig")]
    for st in stages:
        cur = cur.select(
            *[F.col(c) for c in passthrough],
            *[F.expr(expr).alias(col) for col, expr in st.items()],
        )
    out = cur.select(*passthrough, F.col("w"))
    return out.withColumnRenamed("w", word_col) if word_col != "w" else out

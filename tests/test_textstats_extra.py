"""Repetition + PII-scrub ops: engine↔oracle parity on fixtures that
actually CONTAIN PII and duplicated lines (the driver's synthetic
documents table mostly doesn't), plus closed-form expectations.

The gate-table parity at sf0.001 is covered by test_ops_parity; this
file pins behavior where the signals are non-trivial.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from search_engine_spark.ops import textstats

SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"

ROWS = [
    (1, "contact me at bob.smith+x@example.co.uk or call +1 (555) 123-4567 now",
     "en", "s", 70),
    (2, "dup line\ndup line\nunique\nthe cat the cat the cat", "en", "s", 50),
    (3, "", "en", "s", 0),
    (4, "x", "en", "s", 1),
    (5, "a@b.io c@d.io e@f.io and digits 123 456 7890 here", "en", "s", 49),
    (6, "same\nsame\nsame\nsame", "en", "s", 19),
]


@pytest.fixture(scope="module")
def duck_inline():
    con = duckdb.connect()
    pdf = pd.DataFrame(ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"])
    con.register("documents", pdf)
    yield con
    con.close()


def _parity(spark, duck, op, oracle_key):
    sdf = op(spark.createDataFrame(ROWS, SCHEMA))
    got = {tuple(sorted(r.asDict().items())) for r in sdf.collect()}
    want = set()
    rel = duck.sql(textstats.ORACLE_SQL[oracle_key])
    cols = list(rel.columns)
    for row in rel.fetchall():
        want.add(tuple(sorted(zip(cols, row))))
    assert got == want


def test_pii_scrub_parity_on_pii_fixture(spark, duck_inline):
    _parity(spark, duck_inline, textstats.pii_scrub, "text_pii_scrub")


def test_repetition_parity_on_dup_fixture(spark, duck_inline):
    _parity(spark, duck_inline, textstats.repetition_stats, "text_repetition")


def test_pii_scrub_counts(spark):
    got = {r["doc_id"]: r.asDict()
           for r in textstats.pii_scrub(spark.createDataFrame(ROWS, SCHEMA)).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert got[5]["n_emails"] == 3 and got[5]["n_phones"] == 1
    assert got[3]["n_emails"] == 0 and got[3]["scrubbed_len"] == 0
    # redaction actually removed the address: scrubbed md5 differs from raw
    import hashlib
    assert got[1]["scrubbed_md5"] != hashlib.md5(ROWS[0][1].encode()).hexdigest()


def test_cooccur_pmi_exact_counts(spark):
    """PMI pairs vs a brute-force Python count on a fixture with known
    co-occurrence structure (including a doc that repeats a term — PMI
    is document-level, so repeats must not inflate c_ab)."""
    import itertools
    import math

    from search_engine_spark.functions.tokenize import tokenize

    rows = [
        (1, "alpha beta gamma", "en", "s", 16),
        (2, "alpha beta", "en", "s", 10),
        (3, "alpha alpha alpha gamma", "en", "s", 23),
        (4, "beta delta", "en", "s", 10),
        (5, "solo", "en", "s", 4),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = textstats.cooccur_pmi(df, top_v=4, k=50).collect()

    docsets = [set(tokenize(t)) for _, t, *_ in rows]
    dfc: dict[str, int] = {}
    for s in docsets:
        for t in s:
            dfc[t] = dfc.get(t, 0) + 1
    vocab = sorted(dfc, key=lambda t: (-dfc[t], t))[:4]
    cab: dict[tuple[str, str], int] = {}
    for s in docsets:
        for a, b in itertools.combinations(sorted(s & set(vocab)), 2):
            cab[(a, b)] = cab.get((a, b), 0) + 1
    n = len(rows)
    want = {
        pair: (c, dfc[pair[0]], dfc[pair[1]],
               round(math.log(n * c / (dfc[pair[0]] * dfc[pair[1]])), 4))
        for pair, c in cab.items()
    }
    got_map = {
        (r["term_a"], r["term_b"]): (r["c_ab"], r["df_a"], r["df_b"], r["pmi"])
        for r in got
    }
    assert got_map == want
    # alpha+beta co-occur twice but each is common → lower PMI than the
    # rarer exclusive pair; ordering column is the rounded pmi desc
    pmis = [r["pmi"] for r in got]
    assert pmis == sorted(pmis, reverse=True)


def test_repetition_signals(spark):
    got = {r["doc_id"]: r.asDict()
           for r in textstats.repetition_stats(
               spark.createDataFrame(ROWS, SCHEMA)).collect()}
    # doc 2: 4 non-empty lines, 1 dup -> 250000; top bigram 'the cat' 3/10
    assert got[2]["n_lines"] == 4
    assert got[2]["dup_line_frac_e6"] == 250_000
    assert got[2]["top_bigram_share_e6"] == 300_000
    # doc 6: 4 identical lines -> 750000 dup fraction; 'same same' 3/3 bigrams
    assert got[6]["dup_line_frac_e6"] == 750_000
    assert got[6]["top_bigram_share_e6"] == 1_000_000
    # degenerate docs never NULL out
    assert got[3]["top_bigram_share_e6"] == 0 and got[4]["top_bigram_share_e6"] == 0


def test_keywords_tfidf_prefers_rare_terms(spark):
    rows = [
        (1, "common common common rareword common filler tokens here", "en", "s", 0),
        (2, "common filler tokens here and more common text", "en", "s", 0),
        (3, "common filler tokens here too with common text", "en", "s", 0),
    ]
    got = textstats.keywords_tfidf(
        spark.createDataFrame(rows, SCHEMA), k=3
    ).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # top-k, ranks contiguous from 1, scores non-increasing
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
    # the doc-1-exclusive term outranks corpus-wide terms despite tf=1;
    # 'common' (df=N, smoothed idf=0) may pad the top-k when a doc has
    # fewer than k positive-weight terms, but only ever at score 0
    assert by_doc[1][0]["term"] == "rareword"
    assert all(
        r["score"] == 0.0
        for rs in by_doc.values() for r in rs if r["term"] == "common"
    )


def test_bigram_loglik_matches_reference(spark):
    """Laplace-smoothed bigram LM vs a pure-Python reference on a tiny
    corpus where the smoothing actually bites (unseen-context mass) and
    a repeated bigram dominates one doc."""
    import math

    from search_engine_spark.functions.tokenize import tokenize

    rows = [
        (1, "the cat sat on the mat", "en", "s", 22),
        (2, "the cat sat on the mat again", "en", "s", 28),
        (3, "sat the on cat mat the", "en", "s", 22),  # shuffled doc 1:
        # none of its bigrams occur anywhere else in the corpus
        (4, "solo", "en", "s", 4),                     # < 2 tokens: omitted
        (5, "", "en", "s", 0),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)

    toks = {d: tokenize(t) for d, t, *_ in rows}
    vocab = {w for ts in toks.values() for w in ts}
    c2: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), n in c2.items():
        c1[a] = c1.get(a, 0) + n

    got = {r["doc_id"]: r for r in textstats.bigram_loglik(docs).collect()}
    assert set(got) == {1, 2, 3}
    for d in (1, 2, 3):
        bgs = list(zip(toks[d], toks[d][1:]))
        ll = sum(
            math.log((c2[bg] + 1.0) / (c1[bg[0]] + len(vocab))) for bg in bgs
        ) / len(bgs)
        assert got[d]["n_bigrams"] == len(bgs)
        assert got[d]["avg_ll"] == pytest.approx(round(ll, 4), abs=1e-9)
        assert got[d]["ppl"] == pytest.approx(round(math.exp(-ll), 4), abs=1e-9)
    # the shuffled doc must score strictly worse than the original —
    # the order sensitivity unigram_loglik cannot see
    assert got[3]["avg_ll"] < got[1]["avg_ll"]

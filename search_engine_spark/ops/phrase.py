"""Phrase (positional) search over ``documents`` — beyond the
reference's disjunctive-only surface.

The reference engine retrieves on bag-of-words; this module adds the
Lucene-PhraseQuery capability the same inverted-index family normally
carries: a positional posting list (term, doc, position) and exact
phrase retrieval with BM25 scoring of the phrase as a virtual term
(idf from phrase document-frequency, tf = phrase occurrence count —
the classic "phrase freq" of Lucene's PhraseScorer).

Scale shape:
- ``positional_postings`` is one narrow posexplode — no shuffle; at
  10^12 files it lands bucket-partitioned next to the tf postings.
- phrase matching never materializes candidate windows per document:
  each query term i contributes (doc_id, pos - i) "leg" rows, and a
  phrase occurrence is a (doc_id, start) group containing ALL L legs —
  ONE groupBy shuffle keyed on (doc_id, start), partial-agg friendly,
  instead of L-1 chained self-joins. Posting rows for non-query terms
  are filtered at the scan (isin on a literal list → parquet pushdown).
- scoring joins are broadcast (per-phrase stats are single rows).

The DuckDB twin computes occurrences in closed form per document
(list_filter over window starts), deliberately NOT mirroring the
distributed plan — matching outputs from two independent algorithms is
the stronger correctness check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.ops.sqltwin import duck_tokens, tokens_col

PHRASE_MAIN = ["table", "hash"]
PHRASE_TRI = ["big", "order", "scan"]
TOPK = 10
NEAR_WINDOW = 8
NEAR_PAIR = ("join", "window")


def positional_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, term): the positional index table (0-based token
    position from the frozen tokenizer)."""
    toks = tokens_col("text")
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "term")


def occurrences_from_positions(pp: DataFrame, phrase: list[str]) -> DataFrame:
    """(doc_id, pos, term) relation → (doc_id, start) per exact phrase
    occurrence — the shared leg-offset core: query term i contributes
    (doc_id, pos - i) rows, and an occurrence is a (doc_id, start)
    group containing all L legs. One groupBy shuffle; repeated phrase
    terms are handled (each leg counts independently, so "a a" finds
    both occurrences inside "a a a"). Used by both the SQL-checkable
    flavor here and the persisted-index path
    (plans/query.py::QueryEngine.phrase)."""
    if not phrase:
        raise ValueError("empty phrase")
    pp = pp.where(F.col("term").isin(list(set(phrase))))
    legs = None
    for i, t in enumerate(phrase):
        leg = pp.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("start"), F.lit(i).alias("leg")
        )
        legs = leg if legs is None else legs.unionByName(leg)
    return (
        legs.where(F.col("start") >= 0)
        .groupBy("doc_id", "start")
        .agg(F.countDistinct("leg").alias("nlegs"))
        .where(F.col("nlegs") == len(phrase))
        .select("doc_id", "start")
    )


def phrase_occurrences(docs: DataFrame, phrase: list[str]) -> DataFrame:
    """(doc_id, start) per exact phrase occurrence over raw documents."""
    return occurrences_from_positions(positional_postings(docs), phrase)


def _virtual_term_topk(docs: DataFrame, pf: DataFrame, k: int = TOPK) -> DataFrame:
    """BM25 top-k for any (doc_id, pf) virtual-term relation: tf = pf,
    df = #docs with pf > 0, standard dl/avgdl — so a phrase or
    proximity hit ranks exactly like an equally-frequent single term
    would. Shared by :func:`phrase_topk` and :func:`near_topk`."""
    toks = tokens_col("text")
    dl = docs.select("doc_id", F.size(toks).cast("long").alias("dl"))
    stats = docs.agg(
        F.count("*").alias("n"),
        F.avg(F.size(toks)).alias("avgdl"),
    )
    dfp = pf.agg(F.count("*").cast("long").alias("dfp"))
    m = (
        pf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfp))
    )
    idf = F.log((F.col("n") - F.col("dfp") + 0.5) / (F.col("dfp") + 0.5) + 1.0)
    tfn = (F.col("pf") * (BM25_K1 + 1)) / (
        F.col("pf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        m.select("doc_id", "pf", F.round(idf * tfn, 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_topk(
    spark: SparkSession, docs: DataFrame, phrase: list[str], k: int = TOPK
) -> DataFrame:
    """Exact-phrase BM25 top-k (phrase = one virtual term)."""
    pf = (
        phrase_occurrences(docs, phrase)
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("pf"))
    )
    return _virtual_term_topk(docs, pf, k)


def near_pair_counts(
    docs: DataFrame, a: str, b: str, window: int = NEAR_WINDOW,
    ordered: bool = False,
) -> DataFrame:
    """Proximity pair counts: per doc, the number of position pairs
    (pa, pb) of two DISTINCT terms with |pa − pb| ≤ window — the
    Lucene SpanNearQuery counting shape. ``ordered=True`` keeps only
    pairs with a strictly BEFORE b (0 < pb − pa ≤ window, Lucene
    inOrder); the banded join is unchanged — the 3-bucket replication
    already covers the one-sided window, only the pair filter narrows.

    Scale shape — banded range join, never a per-doc cross join: band
    positions into width-`window` buckets; a's rows replicate into
    {bucket−1, bucket, bucket+1} (adding ±window moves floor(p/w) by
    exactly ∓1, so the 3-bucket neighborhood covers every candidate,
    and each true pair matches exactly once since b keeps its single
    bucket). The join is then a pure equi-join on (doc_id, bucket) —
    shuffle-friendly, skew bounded by positions-per-bucket."""
    if a == b:
        raise ValueError("near_pair_counts requires two distinct terms")
    pp = positional_postings(docs).where(F.col("term").isin([a, b]))
    return pair_counts_from_positions(pp, a, b, window, ordered)


def pair_counts_from_positions(
    pp: DataFrame, a: str, b: str, window: int = NEAR_WINDOW,
    ordered: bool = False,
) -> DataFrame:
    """Banded-range-join pair count over a (doc_id, pos, term) relation
    — the shared core of the SQL-checkable flavor above and the
    persisted-positional-index path (plans/query.py::QueryEngine.near),
    mirroring how occurrences_from_positions is shared for phrases."""
    pa = pp.where(F.col("term") == a).select(
        "doc_id",
        F.col("pos").alias("pa"),
        F.explode(
            F.array(
                F.floor(F.col("pos") / window) - 1,
                F.floor(F.col("pos") / window),
                F.floor(F.col("pos") / window) + 1,
            )
        ).alias("bucket"),
    )
    pb = pp.where(F.col("term") == b).select(
        "doc_id",
        F.col("pos").alias("pb"),
        F.floor(F.col("pos") / window).alias("bucket"),
    )
    prox = (
        ((F.col("pb") - F.col("pa")) > 0) & ((F.col("pb") - F.col("pa")) <= window)
        if ordered
        else F.abs(F.col("pa") - F.col("pb")) <= window
    )
    return (
        pa.join(pb, ["doc_id", "bucket"])
        .where(prox)
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("pf"))
    )


def near_topk(
    spark: SparkSession, docs: DataFrame, a: str, b: str,
    window: int = NEAR_WINDOW, k: int = TOPK, ordered: bool = False,
) -> DataFrame:
    """Proximity BM25 top-k: NEAR(a, b, window) scores as one virtual
    term with tf = pair count; ``ordered`` = a-before-b only."""
    return _virtual_term_topk(docs, near_pair_counts(docs, a, b, window, ordered), k)


RESCORE_WINDOW = 30   # top-R BM25 candidates eligible for phase 2
RESCORE_WEIGHT = 2.0  # phrase-bonus weight in the blended score


def phrase_rescore_topk(
    spark: SparkSession, docs: DataFrame, phrase: list[str], k: int = TOPK,
    window_size: int = RESCORE_WINDOW,
) -> DataFrame:
    """Two-phase ranking (the ES ``rescore`` API / Lucene
    QueryRescorer shape): phase 1 retrieves the top-``window_size``
    docs by cheap disjunctive BM25 over the phrase's words; phase 2
    re-orders ONLY that window with an exact-phrase adjacency bonus —
    ``final = round(bm25 + RESCORE_WEIGHT · ln(1 + phrase_freq), 4)``.
    Docs where the words appear adjacent in order outrank equal-BM25
    docs where they are scattered, without paying positional evaluation
    on the full matching set.

    Scale shape: the expensive positional pass is gated behind a
    broadcast semi-join on the ≤``window_size`` candidate ids, so
    phase-2 cost is O(window), independent of corpus size — the whole
    point of rescore windows. (The persisted-index analogue would prune
    the positional sidecar by term and generation the same way
    ``QueryEngine.phrase`` does.)
    """
    from search_engine_spark.ops.search_sql import bm25_scores

    cand = (
        bm25_scores(spark, docs, sorted(set(phrase)))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(window_size)
        .select("doc_id", "score")
    )
    pp = positional_postings(docs).join(
        F.broadcast(cand.select("doc_id")), "doc_id", "left_semi"
    )
    pf = (
        occurrences_from_positions(pp, phrase)
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("pf"))
    )
    return (
        cand.join(pf, "doc_id", "left")
        .withColumn("pf", F.coalesce(F.col("pf"), F.lit(0)).cast("int"))
        .withColumn(
            "final",
            F.round(
                F.col("score")
                + RESCORE_WEIGHT * F.log(F.lit(1.0) + F.col("pf")),
                4,
            ),
        )
        .orderBy(F.desc("final"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "pf", "final")
    )


# --------------------------------------------------------------- oracle SQL

_T = duck_tokens("text")


def _pf_expr(phrase: list[str]) -> str:
    """Closed-form per-doc phrase count: scan every window start p
    (1-based lists) and check all L terms."""
    L = len(phrase)
    conds = " AND ".join(
        f"toks[p + {i}] = '{t}'" for i, t in enumerate(phrase)
    )
    return (
        f"len(list_filter(range(1, len(toks) - {L} + 2), p -> {conds}))"
    )


def _phrase_topk_sql(phrase: list[str], k: int = TOPK) -> str:
    return f"""
WITH d AS (SELECT doc_id, {_T} AS toks FROM documents),
pf AS (
  SELECT doc_id, len(toks) AS dl,
         CAST({_pf_expr(phrase)} AS INTEGER) AS pf
  FROM d
),
m AS (SELECT * FROM pf WHERE pf > 0),
stats AS (
  SELECT (SELECT count(*) FROM d) AS n,
         (SELECT avg(len(toks)) FROM d) AS avgdl,
         (SELECT CAST(count(*) AS BIGINT) FROM m) AS dfp
)
SELECT doc_id, pf,
       round(ln((stats.n - stats.dfp + 0.5) / (stats.dfp + 0.5) + 1.0)
             * (pf * ({BM25_K1} + 1)) /
               (pf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / stats.avgdl)), 4) AS score
FROM m CROSS JOIN stats
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def _near_topk_sql(a: str, b: str, w: int = NEAR_WINDOW, k: int = TOPK,
                   ordered: bool = False) -> str:
    """Closed-form per-doc pair count (every a-position × b-positions
    inside the window; ordered keeps only q > p) — independent of the
    banded-join plan."""
    lo = "p + 1" if ordered else f"greatest(1, p - {w})"
    pf = (
        f"list_sum(list_transform(range(1, len(toks) + 1), p -> "
        f"CASE WHEN toks[p] = '{a}' THEN "
        f"len(list_filter(range({lo}, "
        f"least(len(toks), p + {w}) + 1), q -> toks[q] = '{b}')) "
        f"ELSE 0 END))"
    )
    return f"""
WITH d AS (SELECT doc_id, {_T} AS toks FROM documents),
pf AS (
  SELECT doc_id, len(toks) AS dl,
         CAST(coalesce({pf}, 0) AS INTEGER) AS pf
  FROM d
),
m AS (SELECT * FROM pf WHERE pf > 0),
stats AS (
  SELECT (SELECT count(*) FROM d) AS n,
         (SELECT avg(len(toks)) FROM d) AS avgdl,
         (SELECT CAST(count(*) AS BIGINT) FROM m) AS dfp
)
SELECT doc_id, pf,
       round(ln((stats.n - stats.dfp + 0.5) / (stats.dfp + 0.5) + 1.0)
             * (pf * ({BM25_K1} + 1)) /
               (pf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / stats.avgdl)), 4) AS score
FROM m CROSS JOIN stats
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


ORACLE_SQL = {
    "search_near_topk": _near_topk_sql(*NEAR_PAIR),
    "search_near_ordered_topk": _near_topk_sql(*NEAR_PAIR, ordered=True),
    "search_phrase_positions": f"""
WITH d AS (SELECT doc_id, {_T} AS toks FROM documents)
SELECT doc_id,
       CAST(unnest(range(0, len(toks))) AS INTEGER) AS pos,
       unnest(toks) AS term
FROM d
""",
    "search_phrase_topk": _phrase_topk_sql(PHRASE_MAIN),
    "search_phrase_topk_tri": _phrase_topk_sql(PHRASE_TRI),
}


def _phrase_rescore_sql(phrase: list[str], k: int = TOPK,
                        window_size: int = RESCORE_WINDOW) -> str:
    """Twin of :func:`phrase_rescore_topk`: phase 1 reuses the shared
    BM25 scores CTE; phase 2's phrase count is the independent
    closed-form window scan (NOT the leg-offset algorithm)."""
    from search_engine_spark.ops.search_sql import _scores_cte

    return _scores_cte(sorted(set(phrase))) + f""",
cand AS (
  SELECT doc_id, score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {window_size}
),
d AS (SELECT doc_id, {_T} AS toks FROM documents),
pfq AS (
  SELECT c.doc_id, c.score,
         CAST({_pf_expr(phrase)} AS INTEGER) AS pf
  FROM cand c JOIN d USING (doc_id)
)
SELECT doc_id, score, pf,
       round(score + {RESCORE_WEIGHT} * ln(1.0 + pf), 4) AS final
FROM pfq
ORDER BY final DESC, doc_id ASC
LIMIT {k}
"""


ORACLE_SQL["search_phrase_rescore"] = _phrase_rescore_sql(PHRASE_MAIN)


# -------------------------------------------------------------------------
# Multi-word synonyms (r4): Lucene SynonymGraphFilter's query-time shape
# ("ml" ≡ "machine learning") reduced to the virtual-term protocol this
# module already speaks — each synonym GROUP scores as one pseudo-term
# whose per-doc tf is the sum of its variants' occurrence counts
# (single-word variant → term frequency; multi-word variant → exact
# phrase frequency via the shared leg-offset core) and whose df is the
# number of docs with any variant. Variants are counted independently —
# overlapping variants both count (documented simplification of the
# graph-token positions Lucene tracks; deterministic and
# SQL-twinnable).
# -------------------------------------------------------------------------

SYN_PHRASE_GROUPS: list[list[list[str]]] = [
    [["merge"], ["sort", "merge"]],   # word ≡ word + phrase variant
    [["hash", "scan"], ["window"]],   # phrase variant first
]


def synonym_phrase_topk(
    spark: SparkSession, docs: DataFrame,
    groups: list[list[list[str]]] | None = None, k: int = TOPK,
) -> DataFrame:
    """BM25 top-k where each synonym group (mix of single- and
    multi-word variants) is ONE scored pseudo-term. Output:
    (doc_id, score, matched) — matched = #groups present in the doc.

    Scale shape: ONE positional-postings pass filtered to the union of
    all variant terms (isin pushdown); each multi-word variant adds a
    (doc_id, start)-keyed groupBy over its legs only (the phrase
    machinery above); per-group stats are single broadcast rows. No
    per-doc token arrays ever materialize on the Spark side — the
    closed-form DuckDB twin is the independent algorithm."""
    groups = SYN_PHRASE_GROUPS if groups is None else groups
    all_terms = sorted({t for g in groups for v in g for t in v})
    pp = positional_postings(docs).where(F.col("term").isin(all_terms))
    pp = pp.localCheckpoint(eager=True)  # feeds one job per variant

    counts = None
    for gid, variants in enumerate(groups):
        for v in variants:
            if len(v) == 1:
                c = (
                    pp.where(F.col("term") == v[0])
                    .groupBy("doc_id")
                    .agg(F.count("*").cast("long").alias("c"))
                )
            else:
                c = (
                    occurrences_from_positions(pp, v)
                    .groupBy("doc_id")
                    .agg(F.count("*").cast("long").alias("c"))
                )
            c = c.select("doc_id", F.lit(gid).alias("gid"), "c")
            counts = c if counts is None else counts.unionByName(c)
    gtf = counts.groupBy("doc_id", "gid").agg(
        F.sum("c").cast("long").alias("gtf")
    )

    toks = tokens_col("text")
    dl = docs.select("doc_id", F.size(toks).cast("long").alias("dl"))
    stats = docs.agg(
        F.count("*").alias("n"), F.avg(F.size(toks)).alias("avgdl")
    )
    dfg = gtf.groupBy("gid").agg(F.count("*").cast("long").alias("dfg"))
    m = (
        gtf.join(dl, "doc_id")
        .join(F.broadcast(dfg), "gid")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("dfg") + 0.5) / (F.col("dfg") + 0.5) + 1.0)
    tfn = (F.col("gtf") * (BM25_K1 + 1)) / (
        F.col("gtf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        m.withColumn("partial", idf * tfn)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("partial"), 4).alias("score"),
            F.count("*").cast("int").alias("matched"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _variant_count_expr(v: list[str]) -> str:
    if len(v) == 1:
        return f"len(list_filter(toks, t -> t = '{v[0]}'))"
    return _pf_expr(v)


def _syn_phrase_sql(groups: list[list[list[str]]], k: int = TOPK) -> str:
    """Closed-form DuckDB twin of :func:`synonym_phrase_topk`: per-doc
    per-group counts from the token array, group dfs as scalar
    subqueries, BM25 summed over present groups."""
    gcols = ", ".join(
        "CAST("
        + " + ".join(_variant_count_expr(v) for v in g)
        + f" AS BIGINT) AS g{i}"
        for i, g in enumerate(groups)
    )
    dfs = ", ".join(
        f"(SELECT CAST(count(*) AS BIGINT) FROM pf WHERE g{i} > 0) AS df{i}"
        for i in range(len(groups))
    )

    def part(i: int) -> str:
        tfn = (
            f"(g{i} * ({BM25_K1} + 1)) / "
            f"(g{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / stats.avgdl))"
        )
        return (
            f"CASE WHEN g{i} > 0 THEN "
            f"ln((stats.n - stats.df{i} + 0.5) / (stats.df{i} + 0.5) + 1.0)"
            f" * {tfn} ELSE 0 END"
        )

    score = " + ".join(part(i) for i in range(len(groups)))
    matched = " + ".join(
        f"CASE WHEN g{i} > 0 THEN 1 ELSE 0 END" for i in range(len(groups))
    )
    return f"""
WITH d AS (SELECT doc_id, {_T} AS toks FROM documents),
pf AS (SELECT doc_id, len(toks) AS dl, {gcols} FROM d),
stats AS (
  SELECT (SELECT count(*) FROM d) AS n,
         (SELECT avg(len(toks)) FROM d) AS avgdl,
         {dfs}
)
SELECT doc_id, round({score}, 4) AS score,
       CAST({matched} AS INTEGER) AS matched
FROM pf CROSS JOIN stats
WHERE {" OR ".join(f"g{i} > 0" for i in range(len(groups)))}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


ORACLE_SQL["search_syn_phrase"] = _syn_phrase_sql(SYN_PHRASE_GROUPS)


# -------------------------------------------------------------------------
# match_phrase_prefix (r4): Lucene MatchPhrasePrefixQuery / ES
# match_phrase_prefix — the "search-as-you-type" phrase: all terms but
# the last match exactly IN ORDER, the last term matches as a PREFIX.
# pf = number of window starts whose first L-1 tokens equal the exact
# terms and whose L-th token starts with the prefix; scored as one
# virtual term like every phrase here.
# -------------------------------------------------------------------------

PHRASE_PREFIX = (["sort"], "mer")  # "sort mer*" — matches "sort merge"


def phrase_prefix_topk(
    spark: SparkSession, docs: DataFrame,
    exact: list[str] | None = None, prefix: str | None = None,
    k: int = TOPK,
) -> DataFrame:
    """BM25 top-k for an exact-terms + trailing-prefix phrase.

    Scale shape: the exact legs ride the shared leg-offset core
    (scan-pushdown isin on the exact terms); the prefix leg filters
    positional postings by ``startswith`` — on the persisted index
    that's the same contiguous dictionary range a trailing-* term
    query uses (Lucene's rewrite), here a scan predicate. One
    (doc_id, start)-keyed groupBy, like plain phrases."""
    if exact is None or prefix is None:
        exact, prefix = PHRASE_PREFIX
    L = len(exact) + 1
    pp = positional_postings(docs)
    legs = None
    for i, t in enumerate(exact):
        leg = pp.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("start")
        )
        legs = leg if legs is None else legs.unionByName(leg)
    pleg = pp.where(F.col("term").startswith(prefix)).select(
        "doc_id", (F.col("pos") - (L - 1)).alias("start")
    )
    legs = pleg if legs is None else legs.unionByName(pleg)
    occ = (
        legs.groupBy("doc_id", "start")
        .agg(F.count("*").alias("n_legs"))
        .where((F.col("n_legs") == L) & (F.col("start") >= 0))
    )
    pf = occ.groupBy("doc_id").agg(F.count("*").cast("int").alias("pf"))
    return _virtual_term_topk(docs, pf, k)


def _phrase_prefix_sql(exact: list[str], prefix: str, k: int = TOPK) -> str:
    """Closed-form DuckDB twin: scan window starts, check L-1 exact
    tokens + prefix on the last."""
    L = len(exact) + 1
    conds = " AND ".join(
        [f"toks[p + {i}] = '{t}'" for i, t in enumerate(exact)]
        + [f"starts_with(toks[p + {L - 1}], '{prefix}')"]
    )
    pf = f"len(list_filter(range(1, len(toks) - {L} + 2), p -> {conds}))"
    return f"""
WITH d AS (SELECT doc_id, {_T} AS toks FROM documents),
pf AS (
  SELECT doc_id, len(toks) AS dl, CAST({pf} AS INTEGER) AS pf FROM d
),
m AS (SELECT * FROM pf WHERE pf > 0),
stats AS (
  SELECT (SELECT count(*) FROM d) AS n,
         (SELECT avg(len(toks)) FROM d) AS avgdl,
         (SELECT CAST(count(*) AS BIGINT) FROM m) AS dfp
)
SELECT doc_id, pf,
       round(ln((stats.n - stats.dfp + 0.5) / (stats.dfp + 0.5) + 1.0)
             * (pf * ({BM25_K1} + 1)) /
               (pf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / stats.avgdl)), 4) AS score
FROM m CROSS JOIN stats
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


ORACLE_SQL["search_phrase_prefix"] = _phrase_prefix_sql(*PHRASE_PREFIX)

"""SQL-checkable flavors of the search-engine core over ``documents``.

The production index path (plans/build.py) uses the vectorized pandas
tokenizer, xxhash64 ids and compressed posting blocks — not expressible
in ANSI SQL. These ops re-express the *semantics* (frozen spec
SURVEY §8) as pure DataFrame algebra over the driver's ``documents``
table so every stage has a DuckDB oracle twin:

  postings → term stats (df, BM25 idf + reference-compat log10 idf)
  → disjunctive BM25 scoring → deterministic top-k
  → reference candidate-page ordering (T1)
  → posting-block layout numbering (the window-function view of what
    the compressed index's encode_blocks does inside applyInPandas).

Plan shape notes (what survives 100× scale-up): the explode+groupBy is
the one wide shuffle (same as the engine's build stage 1+2 fused);
query terms and corpus stats are broadcast; top-k is
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.functions.inline import inline_table
from search_engine_spark.ops.sqltwin import (
    MAX_TERM_LEN,
    duck_term_hash31,
    duck_tokens,
    term_hash31,
    tokens_col,
)

QUERY_MAIN = ["spark", "join", "window"]  # in-vocabulary multi-term query
QUERY_MIXED = ["filter", "stream", "zzzunknownzzz"]  # includes an OOV term
QUERY_TYPO = ["spark", "joinx", "windov"]  # two misspellings, ED-1 from vocab
QUERY_TYPO2 = ["spark", "wimdov"]  # a TWO-edit misspelling of "window"
# batch-retrieval workload (offline eval / training-data retrieval):
# many queries scored in ONE job — shared index scan, one shuffle total
BATCH_QUERIES = {
    "q_main": QUERY_MAIN,
    "q_mixed": QUERY_MIXED,
    "q_pair": ["filter", "join"],
    "q_single": ["window"],
}
N_BUCKETS = 8
BLOCK_SIZE = 128
TOPK = 10
CANDIDATE_K = 20
MAX_SUGGESTIONS = 3  # reference keeps ≤3 speller suggestions per word
MAX_EXPANSIONS = 4  # prefix-query expansion cap (Lucene maxExpansions)
QUERY_PREFIX = ["window", "s*"]  # one literal + one wildcard prefix
QUERY_SUFFIX = ["spark", "*er"]  # one literal + one leading wildcard
SUGGEST_PREFIX = "s"  # typeahead probe
SUGGEST_K = 5


def postings(docs: DataFrame) -> DataFrame:
    toks = tokens_col("text")
    return (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def term_stats(docs: DataFrame) -> DataFrame:
    """(term, df, idf_bm25, idf_ref): BM25 Lucene-positive idf plus the
    reference's quirky log10(integer-division) idf (SURVEY §2.4 A3),
    guarded where the reference would error on log(0)."""
    post = postings(docs)
    n = docs.select(F.count("*").alias("n"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    j = df_tbl.crossJoin(F.broadcast(n))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    ref_div = F.floor(F.col("n") / (F.col("df") + 1))
    idf_ref = F.when(ref_div >= 1, F.round(F.log10(ref_div.cast("double")), 4)).otherwise(
        F.lit(0.0)
    )
    return j.select(
        "term", "df", F.round(idf, 4).alias("idf_bm25"), idf_ref.alias("idf_ref")
    )


def _corpus_stats(docs: DataFrame) -> DataFrame:
    post = postings(docs)
    n = docs.select(F.count("*").alias("n"))
    tot = post.agg(F.sum("tf").cast("double").alias("total_tf"))
    return n.crossJoin(tot).select(
        "n", (F.col("total_tf") / F.col("n")).alias("avgdl")
    )


def expand_terms(
    spark: SparkSession, docs: DataFrame, raw_terms: list[str],
    max_sugg: int = MAX_SUGGESTIONS,
) -> DataFrame:
    """Dictionary-free spell correction (single ``term`` column).

    Public analogue of the reference's aspell pass
    (`services/engine/internal/service/spellchecker/spell-checker.go:27-57`):
    a word found in the *index vocabulary* passes through; an OOV word
    is replaced by its edit-distance-1 vocabulary neighbors, keeping the
    ≤``max_sugg`` strongest — ranked by document frequency (the public
    stand-in for aspell's suggestion score), term-asc tie-break. Output
    is the deduped union, like the reference's suggestion set.

    Plan: one vocab aggregation (reused from scoring), then a
    broadcast-query × vocab filter on ``levenshtein == 1``. The engine
    path (plans/query.py) uses a SymSpell-style deletion index instead
    of a scan; this flavor stays expression-only so DuckDB
    (``levenshtein``, same Wagner-Fischer semantics) can twin it.
    """
    vocab = (
        postings(docs).groupBy("term").agg(F.count("*").cast("long").alias("df"))
    )
    q = inline_table(
        spark, [(t,) for t in sorted(set(raw_terms))], "qterm string"
    )
    kept = q.join(
        vocab, q.qterm == vocab.term, "left_semi"
    ).select(F.col("qterm").alias("term"))
    oov = q.join(vocab, q.qterm == vocab.term, "left_anti")
    cand = oov.crossJoin(vocab).where(F.levenshtein("qterm", "term") == 1)
    w = Window.partitionBy("qterm").orderBy(F.desc("df"), F.asc("term"))
    sugg = (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= max_sugg)
        .select("term")
    )
    return kept.union(sugg).distinct()


def bm25_scores(
    spark: SparkSession, docs: DataFrame, terms: list[str] | DataFrame
) -> DataFrame:
    """All matched docs with BM25 score (disjunctive, J1 semantics).
    ``terms`` is a list or a single-column (term) DataFrame (e.g. the
    output of :func:`expand_terms`)."""
    post = postings(docs)
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if isinstance(terms, DataFrame):
        q = terms
    else:
        q = inline_table(spark, [(t,) for t in sorted(set(terms))], "term string")
    stats = _corpus_stats(docs)
    m = (
        post.join(F.broadcast(q), "term")
        .join(df_tbl, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        m.withColumn("partial", idf * tfn)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("partial"), 4).alias("score"),
            F.count("*").cast("int").alias("matched"),
        )
    )


def bm25_topk(
    spark: SparkSession, docs: DataFrame, terms: list[str] | DataFrame,
    k: int = TOPK,
) -> DataFrame:
    scored = bm25_scores(spark, docs, terms)
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


SNIPPET_RADIUS = 40   # chars of left context before the anchor
SNIPPET_LEN = 120     # rendered snippet length
_NO_SUBSTR = 1_000_000_000  # sentinel: term absent as substring


def bm25_topk_snippets(
    spark: SparkSession, docs: DataFrame, terms: list[str], k: int = TOPK,
) -> DataFrame:
    """Top-k + result rendering: a deterministic keyword-in-context
    snippet per hit. The reference renders a fixed 300-char description
    per result (`services/spider/internal/parser/helpers.go:11-37`,
    truncate at P8); this op upgrades that surface to query-anchored
    snippets computed engine-side.

    Anchor = earliest 1-based occurrence of any query term in
    ``lower(text)`` (a matched doc always contains some query term as a
    substring, since index tokens are substrings of the lowered text;
    the sentinel fallback renders a document-prefix snippet). Snippet =
    ``SNIPPET_LEN`` chars starting ``SNIPPET_RADIUS`` before the
    anchor. Scale shape: content is touched only AFTER the top-k —
    the join back to ``docs`` is k rows against the corpus, so the
    text read is k row-group point lookups, not a scan.
    """
    top = bm25_topk(spark, docs, terms, k)
    lowered = F.lower(F.col("text"))
    pos_cols = [
        F.when(F.locate(t, lowered) > 0, F.locate(t, lowered))
        .otherwise(F.lit(_NO_SUBSTR))
        for t in sorted(set(terms))
    ]
    anchor = pos_cols[0] if len(pos_cols) == 1 else F.least(*pos_cols)
    return (
        top.join(docs.select("doc_id", "text"), "doc_id")
        .withColumn(
            "anchor",
            F.when(anchor == _NO_SUBSTR, F.lit(0)).otherwise(anchor).cast("int"),
        )
        .withColumn(
            "snippet",
            F.expr(
                f"substring(text, greatest(1, anchor - {SNIPPET_RADIUS}), "
                f"{SNIPPET_LEN})"
            ),
        )
        .select("doc_id", "score", "matched", "anchor", "snippet")
    )


FRAG_LEN = 60      # rendered fragment length (chars)
FRAG_LEFT = 20     # left context before each anchor
MAX_FRAGS = 3


def bm25_topk_highlight(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    k: int = TOPK, frag_len: int = FRAG_LEN,
) -> DataFrame:
    """Multi-fragment highlighting (ES ``highlight`` with
    ``number_of_fragments``): per top-k hit, up to ``MAX_FRAGS``
    NON-OVERLAPPING fragments, each anchored at the earliest occurrence
    of a distinct query term — the upgrade over
    :func:`bm25_topk_snippets`' single anchor. Greedy suppression:
    anchors sort ascending and an anchor is kept only if its RENDERED
    fragment start (``greatest(1, p - FRAG_LEFT)``) is at least
    ``frag_len`` past the previous KEPT anchor's rendered start (the
    standard highlighter passage rule). Comparing rendered starts, not
    raw anchors, keeps the non-overlap guarantee even when the first
    anchor sits within ``FRAG_LEFT`` chars of text start and its
    fragment clamps to position 1 (ADVICE r3); fragments renumber
    densely by position.

    Scale shape: content is read only for the k hits (point lookups
    after TakeOrderedAndProject); the anchor algebra is per-row array
    expressions over ≤|q| positions — no extra shuffle beyond the k-row
    window that renumbers fragments."""
    terms = QUERY_MAIN if terms is None else terms
    tset = sorted(set(terms))
    assert len(tset) <= MAX_FRAGS, "highlighter supports ≤3 distinct terms"
    top = bm25_topk(spark, docs, terms, k)
    lowered = F.lower(F.col("text"))
    arr = F.array_sort(
        F.array_distinct(
            F.filter(
                F.array(*[F.locate(t, lowered) for t in tset]),
                lambda p: p > 0,
            )
        )
    )
    j = top.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", "score", "text", arr.alias("ps")
    )
    p1, p2, p3 = (F.get("ps", i) for i in range(3))  # NULL out-of-bounds

    def _rend(p):  # rendered fragment start for anchor p
        return F.greatest(F.lit(1), p - F.lit(FRAG_LEFT))

    k1 = p1
    k2 = F.when(_rend(p2) >= _rend(p1) + frag_len, p2)
    k3 = F.when(_rend(p3) >= _rend(F.coalesce(k2, p1)) + frag_len, p3)
    kept = F.filter(F.array(k1, k2, k3), lambda x: x.isNotNull())
    frags = j.select(
        "doc_id", "score", "text", F.explode(kept).alias("frag_start")
    )
    w = Window.partitionBy("doc_id").orderBy("frag_start")
    return frags.select(
        "doc_id", "score",
        F.row_number().over(w).cast("int").alias("frag_no"),
        F.col("frag_start").cast("int").alias("frag_start"),
        F.expr(
            f"substring(text, greatest(1, frag_start - {FRAG_LEFT}), {frag_len})"
        ).alias("fragment"),
    )


def bm25_topk_collapse(
    spark: SparkSession, docs: DataFrame, terms: list[str], k: int = TOPK,
    group_col: str = "source",
) -> DataFrame:
    """Field-collapsed top-k (ES ``collapse`` / Lucene grouping): at
    most ONE result per ``group_col`` value — the result-diversity
    surface a code-search user expects ("best hit per repo", not ten
    files from the same repo). Best-in-group = max score, ties broken
    by min doc_id — the same key order as :func:`bm25_topk`.

    Scale shape: the per-group best is an AGGREGATION of an orderable
    struct (``max(struct(score, -doc_id, ...))``), not a window — so it
    partial-aggregates map-side and never sorts the full match set; a
    hot repo costs one combiner cell, not a single-task window
    partition. The global k is the usual TakeOrderedAndProject. The
    docs join reads only (doc_id, group_col): column-pruned scan.
    """
    scored = bm25_scores(spark, docs, terms)
    best = (
        scored.join(docs.select("doc_id", F.col(group_col).alias("grp")), "doc_id")
        .groupBy("grp")
        .agg(
            F.max(
                F.struct(
                    F.col("score"),
                    (-F.col("doc_id")).alias("neg_doc_id"),
                    F.col("doc_id"),
                    F.col("matched"),
                )
            ).alias("b")
        )
    )
    return (
        best.select(
            F.col("grp").alias(group_col),
            F.col("b.doc_id").alias("doc_id"),
            F.col("b.score").alias("score"),
            F.col("b.matched").alias("matched"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_batch(
    spark: SparkSession, docs: DataFrame,
    queries: dict[str, list[str]] | None = None, k: int = TOPK,
) -> DataFrame:
    """Top-k for a whole BATCH of queries in one job — the offline-
    retrieval shape (LLM training-data selection, relevance eval) where
    thousands of queries amortize one index pass.

    Plan: the (query_id, term) table is broadcast against postings once,
    so every query shares the same scan+shuffle; per-query top-k is a
    window row_number (k rows per query survive the exchange). At
    10^12 docs this replaces Q dispatches of the single-query plan with
    exactly one — the scan side is identical, and the agg key grows to
    (query_id, doc_id), which partial (map-side) aggregation absorbs.
    """
    queries = BATCH_QUERIES if queries is None else queries
    scored = _batch_scored(spark, docs, queries)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("query_id", "doc_id", "score", "matched", "rk")
    )


def _batch_scored(
    spark: SparkSession, docs: DataFrame, queries: dict[str, list[str]]
) -> DataFrame:
    """All (query_id, doc_id, score, matched) rows for a query batch —
    the shared scan+shuffle of :func:`bm25_topk_batch` and
    :func:`rank_eval`."""
    post = postings(docs)
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    qrows = [
        (qid, t) for qid, ts in sorted(queries.items()) for t in sorted(set(ts))
    ]
    q = inline_table(spark, qrows, "query_id string, term string")
    stats = _corpus_stats(docs)
    m = (
        post.join(F.broadcast(q), "term")
        .join(df_tbl, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        m.withColumn("partial", idf * tfn)
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("partial"), 4).alias("score"),
            F.count("*").cast("int").alias("matched"),
        )
    )


def rank_eval(
    spark: SparkSession, docs: DataFrame,
    queries: dict[str, list[str]] | None = None, k: int = TOPK,
) -> DataFrame:
    """Ranking-quality ledger for a query batch: nDCG@k and MRR@k of
    the BM25 ranking against a deterministic graded-relevance oracle —
    grade(doc) = number of distinct query terms it contains, full
    relevance = all of them. The retrieval-quality twin of the ANN
    recall ledgers (`sim_ann_recall`): run it per index build to catch
    ranking regressions the same way recall@k catches ANN ones.

    Per query: ``DCG@k = Σ_{rank≤k} (2^grade − 1)/log2(rank+1)`` over
    the BM25 order (score DESC, doc_id ASC); IDCG@k is the same sum
    over the ideal order (grade DESC, doc_id ASC); ``ndcg = DCG/IDCG``.
    ``mrr_e6 = ⌊10^6/rank⌋`` of the first fully-matching hit in the
    top-k (0 if none — e.g. a query with an OOV term can never fully
    match). ``n_full`` counts fully-matching docs corpus-wide. Each
    DCG term is floored at e9 fixed-point so the sum is an exact
    integer on both engines (no float-association drift).

    Scale shape: same single scan+shuffle as the batch retrieval (the
    eval IS a batch retrieval); the two row_number windows share one
    (query_id)-partitioned exchange; everything after is a per-query
    aggregate of ≤matched-docs rows.
    """
    queries = BATCH_QUERIES if queries is None else queries
    scored = _batch_scored(spark, docs, queries)
    nt = inline_table(
        spark,
        [(qid, len(set(ts))) for qid, ts in sorted(queries.items())],
        "query_id string, n_terms int",
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.desc("matched"), F.asc("doc_id")
    )
    r = (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .withColumn("irk", F.row_number().over(w_ideal))
        .join(F.broadcast(nt), "query_id")
    )
    gain = F.pow(F.lit(2.0), F.col("matched")) - F.lit(1.0)
    dcg_term = F.floor(
        F.lit(1e9) * gain / F.log2(F.col("rk") + F.lit(1))
    ).cast("long")
    idcg_term = F.floor(
        F.lit(1e9) * gain / F.log2(F.col("irk") + F.lit(1))
    ).cast("long")
    full = F.col("matched") == F.col("n_terms")
    agg = r.groupBy("query_id").agg(
        F.sum(F.when(F.col("rk") <= k, dcg_term).otherwise(0)).alias("dcg_e9"),
        F.sum(F.when(F.col("irk") <= k, idcg_term).otherwise(0)).alias("idcg_e9"),
        F.min(F.when((F.col("rk") <= k) & full, F.col("rk"))).alias("ff"),
        F.sum(full.cast("long")).alias("n_full"),
    )
    return agg.select(
        "query_id",
        F.round(F.col("dcg_e9") / F.col("idcg_e9"), 4).alias("ndcg"),
        F.coalesce(
            F.floor(F.lit(1_000_000) / F.col("ff")).cast("long"), F.lit(0)
        ).alias("mrr_e6"),
        F.col("n_full").cast("long").alias("n_full"),
    )


def bm25_topk_typo(
    spark: SparkSession, docs: DataFrame, terms: list[str], k: int = TOPK
) -> DataFrame:
    """BM25 top-k with query-side spell correction (VERDICT r01 item 4):
    misspelled terms retrieve via their ED-1 vocabulary expansion."""
    return bm25_topk(spark, docs, expand_terms(spark, docs, terms), k)


QUERY_MUST = (["filter", "stream"], ["join"])  # (SHOULD terms, MUST terms)


def bm25_topk_must(
    spark: SparkSession, docs: DataFrame, terms: list[str],
    require: list[str], k: int = TOPK,
) -> DataFrame:
    """BM25 top-k with per-term MUST clauses (Lucene BooleanQuery
    MUST + SHOULD): only docs containing EVERY required term qualify;
    required terms also contribute to the score. The engine twin is
    ``QueryEngine.bm25(require=)`` — a bucket+term pruned posting
    decode into a doc_id semi-join, never a content read."""
    allt = sorted({*terms, *require})
    scored = bm25_scores(spark, docs, allt)
    post = postings(docs)
    req_ids = (
        post.where(F.col("term").isin(list(require)))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("_nr"))
        .where(F.col("_nr") == len(set(require)))
        .select("doc_id")
    )
    return (
        scored.join(req_ids, "doc_id", "left_semi")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


QUERY_BOOST = [("window", 3.0), ("join", 1.0), ("filter", 0.5)]


def bm25_topk_boost(
    spark: SparkSession, docs: DataFrame,
    weighted: list[tuple[str, float]] | None = None, k: int = TOPK,
) -> DataFrame:
    """BM25 top-k with per-term query-time boosts (Lucene
    ``term^boost``, SURVEY §2.4 scoring family): each term's BM25
    partial is multiplied by its weight before the per-doc sum —
    algebraically a per-term idf scale, which is exactly how the engine
    twin applies it (``QueryEngine.bm25(boost=)`` scales idf_map, so
    block-max WAND upper bounds stay exact). ``matched`` counts terms,
    not weight.

    Scale shape: identical to :func:`bm25_scores` — the (term, weight)
    side is a broadcast inline table; the one wide exchange is the
    explode+groupBy the postings need anyway; top-k is
    TakeOrderedAndProject."""
    weighted = QUERY_BOOST if weighted is None else weighted
    post = postings(docs)
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    q = inline_table(
        spark,
        sorted({(t, float(w)) for t, w in weighted}),
        "term string, w double",
    )
    stats = _corpus_stats(docs)
    m = (
        post.join(F.broadcast(q), "term")
        .join(df_tbl, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        m.withColumn("partial", F.col("w") * idf * tfn)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("partial"), 4).alias("score"),
            F.count("*").cast("int").alias("matched"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


FIELD_FILTER = ("lang", "en")


def bm25_topk_field(
    spark: SparkSession, docs: DataFrame,
    terms: list[str] | None = None,
    flt: tuple[str, str] = FIELD_FILTER, k: int = TOPK,
) -> DataFrame:
    """BM25 top-k restricted by a metadata field (Lucene FILTER clause,
    ``lang:en``): scores and df/avgdl stay CORPUS-WIDE — the filter
    only restricts which docs may rank. The deliberate contrast is
    ``search_bm25_lang`` (corpus-filtered rebuild: stats recomputed
    over the filtered corpus); both semantics exist in Lucene and they
    rank differently. Engine twin: ``QueryEngine.bm25(field=)``.

    Scale shape: the scored set is candidate-sized (≤ Σdf); the filter
    column joins on doc_id (AQE picks the join strategy) and the top-k
    is TakeOrderedAndProject — the filter never touches content."""
    terms = QUERY_MAIN if terms is None else terms
    col, val = flt
    scored = bm25_scores(spark, docs, terms)
    return (
        scored.join(docs.select("doc_id", col), "doc_id")
        .where(F.col(col) == val)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


def expand_terms_fuzzy2(
    spark: SparkSession, docs: DataFrame, raw_terms: list[str],
    max_sugg: int = MAX_SUGGESTIONS,
) -> DataFrame:
    """ED-2 spell correction (Lucene FuzzyQuery's default
    ``maxEdits=2``): OOV words take their ≤``max_sugg`` strongest
    vocabulary neighbors within edit distance 2, ranked distance-first
    (lev ASC, df DESC, term ASC — Lucene boosts nearer corrections
    above more frequent farther ones). Expression-only levenshtein
    scan so DuckDB can twin it; the engine path
    (plans/query.py::expand_query_terms(max_edit=2)) serves the same
    set from a SymSpell depth-2 deletion index instead of a scan."""
    vocab = (
        postings(docs).groupBy("term").agg(F.count("*").cast("long").alias("df"))
    )
    q = inline_table(
        spark, [(t,) for t in sorted(set(raw_terms))], "qterm string"
    )
    kept = q.join(
        vocab, q.qterm == vocab.term, "left_semi"
    ).select(F.col("qterm").alias("term"))
    oov = q.join(vocab, q.qterm == vocab.term, "left_anti")
    cand = (
        oov.crossJoin(vocab)
        .withColumn("lev", F.levenshtein("qterm", "term"))
        .where(F.col("lev").between(1, 2))
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("lev"), F.desc("df"), F.asc("term")
    )
    sugg = (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= max_sugg)
        .select("term")
    )
    return kept.union(sugg).distinct()


def bm25_topk_typo2(
    spark: SparkSession, docs: DataFrame, terms: list[str], k: int = TOPK
) -> DataFrame:
    """BM25 top-k with ED-2 spell correction — two-edit misspellings
    still retrieve (Lucene FuzzyQuery maxEdits=2)."""
    return bm25_topk(spark, docs, expand_terms_fuzzy2(spark, docs, terms), k)


def prefix_expand(
    spark: SparkSession, docs: DataFrame, raw_terms: list[str],
    max_exp: int = MAX_EXPANSIONS,
) -> DataFrame:
    """Wildcard (trailing ``*``) query expansion — Lucene
    PrefixQuery/MultiTermQuery semantics: ``foo*`` rewrites to the
    ``max_exp`` strongest vocabulary terms with that prefix (df DESC,
    term ASC — the boolean-rewrite expansion cap), literals pass
    through; output is the deduped union, fed to the ordinary BM25.

    Scale shape: the prefix condition is a contiguous RANGE of the
    sorted term dictionary (term >= pfx AND term < pfx⊕1), so against
    the persisted index it prunes to a dictionary range scan; here the
    tiny prefix list is broadcast."""
    literals = sorted({t for t in raw_terms if not t.endswith("*")})
    prefixes = sorted({t[:-1] for t in raw_terms if t.endswith("*") and len(t) > 1})
    vocab = (
        postings(docs).groupBy("term").agg(F.count("*").cast("long").alias("df"))
    )
    lit_df = inline_table(spark, [(t,) for t in literals], "term string")
    if not prefixes:
        return lit_df
    p = inline_table(spark, [(x,) for x in prefixes], "pfx string")
    w = Window.partitionBy("pfx").orderBy(F.desc("df"), F.asc("term"))
    exp = (
        vocab.join(F.broadcast(p), F.col("term").startswith(F.col("pfx")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= max_exp)
        .select("term")
    )
    return lit_df.union(exp).distinct()


def bm25_topk_prefix(
    spark: SparkSession, docs: DataFrame, raw_terms: list[str], k: int = TOPK
) -> DataFrame:
    """BM25 top-k where trailing-``*`` terms retrieve via their
    capped prefix expansion (Lucene PrefixQuery → BooleanQuery
    rewrite)."""
    return bm25_topk(spark, docs, prefix_expand(spark, docs, raw_terms), k)


def suffix_expand(
    spark: SparkSession, docs: DataFrame, raw_terms: list[str],
    max_exp: int = MAX_EXPANSIONS,
) -> DataFrame:
    """Leading-wildcard (``*foo``) query expansion — Lucene's
    ReverseStringFilter trick: a suffix condition is a PREFIX condition
    on the reversed term, so ``*er`` rewrites to the ``max_exp``
    strongest vocabulary terms ending in ``er`` (df DESC, term ASC),
    literals pass through.

    Scale shape: against the persisted index the reversed dictionary
    (Lucene indexes a reversed field for exactly this) makes the match
    a contiguous range scan; over ``documents`` the tiny suffix list is
    broadcast against the vocab aggregate — same plan as
    :func:`prefix_expand` with ``endswith`` in place of
    ``startswith``."""
    literals = sorted({t for t in raw_terms if not t.startswith("*")})
    suffixes = sorted(
        {t[1:] for t in raw_terms if t.startswith("*") and len(t) > 1}
    )
    lit_df = inline_table(spark, [(t,) for t in literals], "term string")
    if not suffixes:
        return lit_df
    vocab = (
        postings(docs).groupBy("term").agg(F.count("*").cast("long").alias("df"))
    )
    s = inline_table(spark, [(x,) for x in suffixes], "sfx string")
    w = Window.partitionBy("sfx").orderBy(F.desc("df"), F.asc("term"))
    exp = (
        vocab.join(F.broadcast(s), F.col("term").endswith(F.col("sfx")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= max_exp)
        .select("term")
    )
    return lit_df.union(exp).distinct()


def bm25_topk_suffix(
    spark: SparkSession, docs: DataFrame, raw_terms: list[str], k: int = TOPK
) -> DataFrame:
    """BM25 top-k where leading-``*`` terms retrieve via their capped
    suffix expansion (Lucene WildcardQuery on a reversed field →
    BooleanQuery rewrite)."""
    return bm25_topk(spark, docs, suffix_expand(spark, docs, raw_terms), k)


def bm25_topk_filtered(
    spark: SparkSession, docs: DataFrame, terms: list[str],
    lang: str = "en", k: int = TOPK,
) -> DataFrame:
    """BM25 top-k restricted to one language — the filtered-retrieval
    composition (GitHub's `lang:` qualifier). The filter lands in the
    corpus scan (PushedFilters) BEFORE tokenize/score, so df/idf/avgdl
    are those of the filtered subcorpus: a per-lang index shard, not a
    post-filtered global ranking (both are legitimate; this is the
    shard semantics, and the one with the cheaper plan at scale)."""
    return bm25_topk(spark, docs.where(F.col("lang") == lang), terms, k)


def suggest_terms(
    spark: SparkSession, docs: DataFrame, prefix: str = SUGGEST_PREFIX,
    k: int = SUGGEST_K,
) -> DataFrame:
    """Typeahead suggestions: top-``k`` vocabulary terms with
    ``prefix``, ranked by document frequency (df DESC, term ASC) →
    (term, df). Same dictionary-range shape as :func:`prefix_expand`;
    the engine twin serves it from the persisted terms table."""
    vocab = (
        postings(docs).groupBy("term").agg(F.count("*").cast("long").alias("df"))
    )
    return (
        vocab.where(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


SUGGEST_CONTEXT = "merge"  # gate probe: complete after this term


def suggest_next_terms(
    spark: SparkSession, docs: DataFrame, context: str = SUGGEST_CONTEXT,
    k: int = SUGGEST_K,
) -> DataFrame:
    """Context-aware query completion: the top-``k`` terms that FOLLOW
    ``context`` in the corpus, ranked by bigram occurrence count
    (n DESC, term ASC) → (term, n). The "suggest the next query word"
    feature (Google-style), complementing :func:`suggest_terms`'
    prefix typeahead — the corpus bigram table doubles as the
    completion model the way it doubles as the LM in
    textstats.bigram_loglik.

    Scale shape: ONE bigram extraction pass (array zip over the bound
    token column, no posexplode self-join) filtered to the context
    BEFORE the aggregation — the (w1 = context) predicate prunes at
    the explode, so the count never materializes the full bigram
    table; top-k is TakeOrderedAndProject."""
    toks = docs.select(tokens_col("text").alias("toks"))
    nxt = (
        toks.where(F.array_contains("toks", context))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
                )
            ).alias("bg")
        )
        .where(F.col("bg.w1") == context)
        .select(F.col("bg.w2").alias("term"))
    )
    return (
        nxt.groupBy("term")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )


def candidate_page(
    spark: SparkSession, docs: DataFrame, terms: list[str], page: int = 0,
    size: int = CANDIDATE_K,
) -> DataFrame:
    """Reference T1 pre-rank + pagination: (matched DESC, doc_id ASC)
    LIMIT size OFFSET page·size (`store.go:85-98`, PAGE_SIZE=20).

    Scale shape: ``limit((page+1)·size)`` keeps the plan a
    TakeOrderedAndProject (never a global sort); the offset filter is a
    row_number over that tiny bounded set."""
    scored = bm25_scores(spark, docs, terms)
    order = [F.desc("matched"), F.asc("doc_id")]
    top = scored.orderBy(*order).limit((page + 1) * size)
    if page == 0:
        return top.select("doc_id", "matched")
    w = Window.orderBy(*order)
    return (
        top.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > page * size)
        .select("doc_id", "matched")
    )


def bm25_topk_after(
    spark: SparkSession, docs: DataFrame, terms: list[str], k: int = TOPK,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Keyset (search-after) pagination — the ES ``search_after`` /
    Lucene ``searchAfter`` analogue, and the scale-correct upgrade over
    OFFSET paging (:func:`candidate_page`): the cursor is the
    (score, doc_id) sort key of the last hit already served, and the
    next page is the top-k of rows STRICTLY after it in
    (score DESC, doc_id ASC) order. OFFSET paging scans and discards
    ``page·size`` rows per request — O(depth) per page — while the
    cursor predicate here prunes before the top-k, so page 10^4 costs
    the same as page 1. doc_id is unique, so the cursor defines a total
    order and pages never skip or repeat rows.

    ``after=None`` (the gate query) derives the cursor declaratively
    from page 1 itself: the k-th hit's key via a 1-row broadcast cross
    join — so the whole two-page round trip is one lazy plan the oracle
    can mirror. In production the client passes the tuple back.
    """
    scored = bm25_scores(spark, docs, terms)
    if after is None:
        cursor = (
            scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .orderBy(F.asc("score"), F.desc("doc_id")).limit(1)
            .select(F.col("score").alias("c_score"),
                    F.col("doc_id").alias("c_doc"))
        )
        filtered = scored.crossJoin(F.broadcast(cursor)).where(
            (F.col("score") < F.col("c_score"))
            | ((F.col("score") == F.col("c_score"))
               & (F.col("doc_id") > F.col("c_doc")))
        )
    else:
        s, d = after
        filtered = scored.where(
            (F.col("score") < F.lit(s))
            | ((F.col("score") == F.lit(s)) & (F.col("doc_id") > F.lit(d)))
        )
    return (
        filtered.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


def total_hits(spark: SparkSession, docs: DataFrame, terms: list[str]) -> DataFrame:
    """Total distinct matching docs (reference GetTotalPages,
    `store.go:172-186`, SURVEY §2.4 A5) — the SQL-checkable twin of
    ``QueryEngine.total_hits``."""
    post = postings(docs)
    q = inline_table(spark, [(t,) for t in sorted(set(terms))], "term string")
    return (
        post.join(F.broadcast(q), "term")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_hits"))
    )


def refcompat_topk(
    spark: SparkSession, docs: DataFrame, terms: list[str], k: int = TOPK
) -> DataFrame:
    """Reference-compat TF-IDF-cosine ranking (SURVEY §8.2 flag-gated
    mode), end-to-end: the exact pipeline of
    `services/engine/internal/service/ranking/tf-idf.go:10-86` +
    `ranking.go:23-38` re-expressed as DataFrame algebra.

    - idf = the reference's quirky ``log10(N // (df+1))`` (Postgres
      1-arg LOG + integer division), 0 for OOV words (Go map default);
    - doc vector over the distinct query words: ``tf·idf``; query
      vector: ``1·idf`` (query words are distinct post-speller);
    - cosine = dot/(|d|·|q|), guarded to 0 where a magnitude is 0 (the
      reference would NaN — documented divergence);
    - candidate window (matched DESC, doc_id ASC, LIMIT 20) → min-max
      normalize within the window (dom==0 → all 0) → global =
      0.5·norm + 0.5·prior (prior ≡ 0 in this SQL flavor — the engine
      path in plans/query.py blends the real PageRank prior);
    - final order: global DESC, matched DESC, doc_id ASC.
    """
    post = postings(docs)
    n = docs.select(F.count("*").alias("n"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    qdf = inline_table(spark, [(t,) for t in sorted(set(terms))], "term string")
    ref_div = F.floor(F.col("n") / (F.col("df") + 1))
    qidf = (
        qdf.join(df_tbl, "term", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            F.when(
                F.col("df").isNotNull() & (ref_div >= 1),
                F.log10(ref_div.cast("double")),
            ).otherwise(F.lit(0.0)).alias("idf"),
        )
    )
    qmag = qidf.agg(F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("qmag"))
    per_doc = (
        post.join(F.broadcast(qidf), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("idf") * F.col("idf")).alias("dot"),
            F.sqrt(F.sum(F.pow(F.col("tf") * F.col("idf"), 2))).alias("dmag"),
            F.count("*").cast("int").alias("matched"),
        )
        .crossJoin(F.broadcast(qmag))
    )
    cosine = F.when(
        (F.col("dmag") > 0) & (F.col("qmag") > 0),
        F.col("dot") / (F.col("dmag") * F.col("qmag")),
    ).otherwise(F.lit(0.0))
    cand = (
        per_doc.withColumn("cosine", cosine)
        .orderBy(F.desc("matched"), F.asc("doc_id"))
        .limit(CANDIDATE_K)
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cmin, cmax = F.min("cosine").over(w), F.max("cosine").over(w)
    norm = F.when(cmax - cmin > 0, (F.col("cosine") - cmin) / (cmax - cmin)).otherwise(
        F.lit(0.0)
    )
    return (
        cand.withColumn("global_score", F.round(0.5 * norm, 4))
        .withColumn("cosine", F.round("cosine", 4))
        .orderBy(F.desc("global_score"), F.desc("matched"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "cosine", "global_score", "matched")
    )


def bm25_topk_conj(
    spark: SparkSession, docs: DataFrame, terms: list[str], k: int = TOPK
) -> DataFrame:
    """Conjunctive (AND) BM25 top-k: only docs matching EVERY query term
    qualify (the reference surface is disjunctive-only, `store.go:66-83`;
    AND-mode is the standard companion every inverted index carries —
    Lucene BooleanQuery MUST semantics).

    Same one-shuffle plan as :func:`bm25_scores` plus a post-agg HAVING
    on the matched count — already computed, so conjunctive mode is free
    relative to OR. (The engine path prunes harder: WAND with all-terms
    required tightens the θ bound; here we stay SQL-checkable.)
    """
    n_terms = len(set(terms))
    scored = bm25_scores(spark, docs, terms).where(F.col("matched") == n_terms)
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


MSM_MIN = 2  # min-should-match threshold for the gate query
QUERY_EXCLUDE = ["hash"]  # MUST_NOT term for the gate query
# synonym groups for the gate query: {join, merge} blended as one
# pseudo-term, plus a plain single-variant group
SYN_GROUPS: list[list[str]] = [["join", "merge"], ["window"]]


def bm25_topk_msm(
    spark: SparkSession, docs: DataFrame, terms: list[str],
    min_match: int = MSM_MIN, k: int = TOPK,
) -> DataFrame:
    """Min-should-match BM25 top-k: docs matching at least ``min_match``
    of the query terms qualify (Lucene BooleanQuery
    ``minimumNumberShouldMatch`` — the dial between the reference's
    disjunctive OR surface, `store.go:66-83`, and full AND).

    Free relative to OR: the matched count is already computed by the
    scoring aggregate, so this is a post-agg HAVING — no extra shuffle,
    and at scale the filter runs map-side of the top-k."""
    scored = bm25_scores(spark, docs, terms).where(
        F.col("matched") >= min_match
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


def bm25_topk_not(
    spark: SparkSession, docs: DataFrame, terms: list[str],
    exclude: list[str] | None = None, k: int = TOPK,
) -> DataFrame:
    """BM25 top-k with MUST_NOT exclusion: disjunctive scoring over
    ``terms``, then docs containing ANY ``exclude`` term are dropped
    (Lucene BooleanQuery MUST_NOT / GitHub code search ``NOT``; the
    reference has no negation surface).

    Plan shape: the exclusion set is a left-anti join against the
    postings rows of the excluded terms — the excluded-term posting
    lists are the ONLY extra rows read (broadcast the tiny term list,
    never a content scan), and the anti-join keys on doc_id so it
    rides the same exchange as the scoring aggregate."""
    exclude = QUERY_EXCLUDE if exclude is None else exclude
    post = postings(docs)
    ex_q = inline_table(
        spark, [(t,) for t in sorted(set(exclude))], "term string"
    )
    ex_docs = post.join(F.broadcast(ex_q), "term").select("doc_id").distinct()
    scored = bm25_scores(spark, docs, terms).join(ex_docs, "doc_id", "left_anti")
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


def bm25_topk_syn(
    spark: SparkSession, docs: DataFrame,
    groups: list[list[str]] | None = None, k: int = TOPK,
) -> DataFrame:
    """Synonym-blended BM25 top-k (Lucene SynonymQuery analogue): each
    group of variant terms scores as ONE pseudo-term — per-doc tf is
    the sum of variant tfs, and the pseudo-term's df is the number of
    docs matching ANY variant. Lucene approximates the blended df as
    max(docFreq) because a union-df is expensive in its per-segment
    model; as one distributed aggregate the exact union-df is free
    here, so we use it (strictly better idf estimate, and a pure
    function of the input, so the DuckDB twin is exact).

    Plan shape: variant→group mapping is a broadcast join on the
    postings rows of the variant terms only, then one (doc_id, gid)
    aggregate; the group-df table is #groups rows. Same single wide
    exchange class as plain :func:`bm25_scores`."""
    groups = SYN_GROUPS if groups is None else groups
    post = postings(docs)
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    pairs = [
        (t, gi) for gi, g in enumerate(groups) for t in sorted(set(g))
    ]
    q = inline_table(spark, pairs, "term string, gid int")
    gtf = (
        post.join(F.broadcast(q), "term")
        .groupBy("doc_id", "gid")
        .agg(F.sum("tf").cast("long").alias("tf"))
    )
    gdf = gtf.groupBy("gid").agg(F.count("*").cast("long").alias("df"))
    stats = _corpus_stats(docs)
    m = (
        gtf.join(F.broadcast(gdf), "gid")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        m.withColumn("partial", idf * tfn)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("partial"), 4).alias("score"),
            F.count("*").cast("int").alias("matched"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


def bm25_explain(
    spark: SparkSession, docs: DataFrame, terms: list[str], k: int = TOPK,
) -> DataFrame:
    """Per-term score breakdown for the top-k hits (Lucene
    ``explain()``): one row per (doc, matched term) carrying the raw
    statistics (tf, df, dl) and the derived factors (idf, saturated
    tf, partial score) whose sum is the hit's BM25 score. The
    relevance-debugging surface every search engine ships; the
    reference exposes only the final score (`store.go:66-83`).

    Content is never touched: the breakdown is k·|q| posting rows
    joined against the (broadcast) top-k doc_id set."""
    post = postings(docs)
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    q = inline_table(spark, [(t,) for t in sorted(set(terms))], "term string")
    stats = _corpus_stats(docs)
    top = (
        bm25_topk(spark, docs, terms, k)
        .select("doc_id", "score")
    )
    m = (
        post.join(F.broadcast(q), "term")
        .join(F.broadcast(top), "doc_id")
        .join(df_tbl, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return m.select(
        "doc_id",
        "term",
        F.col("tf").cast("int").alias("tf"),
        "df",
        "dl",
        F.round(idf, 4).alias("idf"),
        F.round(tfn, 4).alias("tfn"),
        F.round(idf * tfn, 4).alias("partial"),
        "score",
    )


def search_facets(
    spark: SparkSession, docs: DataFrame, terms: list[str],
    facet_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Facet counts over the FULL matching set (not just the page):
    per (facet dimension, value) — matching-doc count, max and total
    BM25 score. The aggregation surface a search UI / relevance
    pipeline reads next to the top-k (Lucene facets / Elasticsearch
    terms-agg shape; the reference stops at GetTotalPages,
    store.go:100-118 — this generalizes that COUNT to per-dimension
    counts).

    Plan shape: the scored set is already (doc_id, score) post-agg;
    one shuffle join back to the docs dims on doc_id, then a stack of
    low-cardinality groupBys (partial-agg friendly — combiner output
    is #values per mapper, so the facet shuffle is tiny at any scale).
    """
    scored = bm25_scores(spark, docs, terms)
    dims = docs.select("doc_id", *facet_cols)
    # stack (unpivot) instead of one groupBy-per-dimension unioned:
    # a union would re-plan the whole scoring pipeline per dimension;
    # the stack explodes each matched row into #dims rows in the same
    # narrow stage, so all dimensions aggregate in ONE pass
    stack_args = ", ".join(f"'{c}', {c}" for c in facet_cols)
    stacked = scored.join(dims, "doc_id").selectExpr(
        "score",
        f"stack({len(facet_cols)}, {stack_args}) AS (facet, value)",
    )
    return stacked.groupBy("facet", "value").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.max("score"), 4).alias("max_score"),
        F.round(F.sum("score"), 4).alias("sum_score"),
    )


MLT_TOP_TERMS = 5  # seed-doc terms used as the derived query


def more_like_this(
    spark: SparkSession, docs: DataFrame, k: int = TOPK,
    top_terms: int = MLT_TOP_TERMS,
) -> DataFrame:
    """More-like-this: take the corpus's min-doc_id document as the
    seed, extract its ``top_terms`` strongest terms by (tf·idf DESC,
    term ASC), and run disjunctive BM25 with the seed doc excluded —
    Lucene MoreLikeThis over the same frozen tokenizer.

    Plan shape: the seed's posting row-set is tiny (one doc) and the
    derived query table is broadcast, so the expensive side stays the
    single postings shuffle every scoring op shares. Scoring reuses
    :func:`bm25_scores` unchanged — MLT is query *construction*, not a
    new scorer.
    """
    post = postings(docs)
    n = docs.select(F.count("*").alias("n"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    seed = docs.agg(F.min("doc_id").alias("doc_id"))
    seed_post = post.join(F.broadcast(seed), "doc_id")
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    qterms = (
        seed_post.join(df_tbl, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("w", F.round(F.col("tf") * idf, 6))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(top_terms)
        .select("term")
    )
    scored = bm25_scores(spark, docs, qterms).join(
        F.broadcast(seed), "doc_id", "left_anti"
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


SIG_TOP_K = 10  # significant terms reported per result set


def significant_terms(
    spark: SparkSession, docs: DataFrame, terms: list[str],
    k: int = SIG_TOP_K,
) -> DataFrame:
    """ES-style significant-terms aggregation over the FULL result set
    of a disjunctive query (Elasticsearch ``significant_terms`` with
    the JLH heuristic): terms whose document frequency inside the
    matching docs (foreground) is anomalously high vs the whole corpus
    (background). JLH = (fg% − bg%) · (fg% / bg%) — the absolute lift
    times the relative lift; only positive lifts qualify. The classic
    "what is this result set ABOUT" drill-down the reference's UI
    would hang off a search. Query terms themselves are excluded (they
    match every foreground doc by construction — pure noise atop the
    signal).

    Plan shape: ONE distinct (doc_id, term) aggregation feeds both
    legs — the foreground doc set is a broadcast-terms semi-join of
    it, foreground df a semi-join + term-keyed count riding the same
    exchange, background df the plain term-keyed count; F and N are
    1-row broadcasts; top-k is TakeOrderedAndProject on the rounded
    score (6dp, term-asc tie-break — the established cross-engine
    float protocol). All inputs to the score are exact integer-derived
    doubles, so both engines compute identical IEEE products."""
    dt = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .distinct()
        .persist()  # reused 3× (fg docs, fg df, bg df): one tokenize pass
    )
    qt = inline_table(
        spark, [(t,) for t in sorted(set(terms))], "qterm string"
    )
    fg_docs = dt.join(
        F.broadcast(qt), dt.term == qt.qterm, "left_semi"
    ).select("doc_id").distinct()
    fsize = fg_docs.agg(F.count("*").cast("long").alias("fg"))
    nsize = docs.agg(F.count("*").cast("long").alias("n"))
    fg_df = (
        dt.join(fg_docs, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("fg_df"))
    )
    bg_df = dt.groupBy("term").agg(F.count("*").cast("long").alias("bg_df"))
    fg_pct = F.col("fg_df") / F.col("fg")
    bg_pct = F.col("bg_df") / F.col("n")
    return (
        fg_df.join(bg_df, "term")
        .join(F.broadcast(qt), fg_df.term == qt.qterm, "left_anti")
        .crossJoin(F.broadcast(fsize))
        .crossJoin(F.broadcast(nsize))
        .withColumn(
            "score", F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
        )
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
        .select("term", "fg_df", "bg_df", "score")
    )


# BM25F field weights: the path field outranks content (a filename hit
# beats a body mention — the code-search analogue of the reference
# boosting Title in its re-rank comparator, util.go:20-36).
BM25F_W_CONTENT = 1.0
BM25F_W_PATH = 2.0
QUERY_BM25F = ["table", "src3"]  # one content-ish term, one path-ish term


def _path_tokens(col: str) -> F.Column:
    """Path tokenizer: lowercase, split on path punctuation ([/._-] and
    whitespace), keep non-empty alnum tokens ≤25 chars. Paths carry
    digits (``v2``, ``src3``), so this deliberately admits [a-z0-9]+
    where the content tokenizer (frozen §8.1) is letters-only."""
    raw = F.split(F.lower(F.col(col)), r"[/._\- \t]+")
    return F.filter(
        raw,
        lambda t: (F.length(t) > 0)
        & (F.length(t) <= MAX_TERM_LEN)
        & t.rlike(r"^[a-z0-9]+$"),
    )


def _duck_path_tokens(col: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({col}), '[/._\\- \\t]+'),"
        f" t -> len(t) > 0 AND len(t) <= {MAX_TERM_LEN}"
        f" AND regexp_full_match(t, '[a-z0-9]+'))"
    )


def bm25f_topk(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    k: int = TOPK,
) -> DataFrame:
    """Field-weighted BM25F top-k over (content=text, path=source):
    per-field term frequencies are combined BEFORE saturation —
    ``wtf = w_c·tf_content + w_p·tf_path``, ``wdl = w_c·len_content +
    w_p·len_path`` — then scored once with the standard BM25 formula
    (Robertson & Zaragoza 2009, the simple-BM25F variant Lucene's
    multi-field scoring approximates). df counts docs where wtf > 0,
    so a path-only hit still earns idf.

    Plan shape: two narrow explodes union into ONE postings relation →
    the same single groupBy shuffle as plain BM25; weights ride along
    as literals. No extra pass over content.
    """
    terms = QUERY_BM25F if terms is None else terms
    c_toks, p_toks = tokens_col("text"), _path_tokens("source")
    field_post = (
        docs.select(
            "doc_id", F.explode(c_toks).alias("term"),
            F.lit(BM25F_W_CONTENT).alias("w"),
        )
        .unionByName(
            docs.select(
                "doc_id", F.explode(p_toks).alias("term"),
                F.lit(BM25F_W_PATH).alias("w"),
            )
        )
        .groupBy("doc_id", "term")
        .agg(F.sum("w").alias("wtf"))
    )
    wdl = docs.select(
        "doc_id",
        (
            F.lit(BM25F_W_CONTENT) * F.size(c_toks)
            + F.lit(BM25F_W_PATH) * F.size(p_toks)
        ).alias("wdl"),
    )
    stats = docs.agg(
        F.count("*").alias("n"),
        F.avg(
            F.lit(BM25F_W_CONTENT) * F.size(c_toks)
            + F.lit(BM25F_W_PATH) * F.size(p_toks)
        ).alias("avg_wdl"),
    )
    df_tbl = field_post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    q = inline_table(spark, [(t,) for t in sorted(set(terms))], "term string")
    m = (
        field_post.join(F.broadcast(q), "term")
        .join(df_tbl, "term")
        .join(wdl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("wtf") * (BM25_K1 + 1)) / (
        F.col("wtf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("wdl") / F.col("avg_wdl"))
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
        .select("doc_id", "score", "matched")
    )


QUERY_DYM = ["joinx", "windov"]  # adjacent typo pair; fix = "join window"
DYM_CAND = 3
DYM_K = 3


def did_you_mean(
    spark: SparkSession, docs: DataFrame,
    raw_terms: list[str] | None = None,
    n_cand: int = DYM_CAND, k: int = DYM_K,
) -> DataFrame:
    """Whole-query "did you mean" (the Google-style full-query
    correction, composing the spell and next-term machinery): each
    query position proposes its top-``n_cand`` ED≤1 vocabulary
    candidates (lev ASC, df DESC, term ASC — exact terms rank first at
    lev 0), the ≤ n_cand^L combinations are ranked by corpus BIGRAM
    support of their adjacent pairs, then total df, then the corrected
    string — an ALL-INTEGER key, so the twin cuts identically (the
    same determinism rule as the PRF expansion).

    Scale shape: the vocab leg is the dictionary-sized levenshtein
    scan the ED-twin ops already use (engine-side this is the SymSpell
    index instead); the bigram aggregate is bounded by distinct
    bigrams (the bigram_loglik argument) and joins the candidate
    combos BROADCAST (≤ n_cand^L rows). Nothing corpus-sized beyond
    those two aggregates."""
    from pyspark.sql import Window

    raw_terms = QUERY_DYM if raw_terms is None else raw_terms
    L = len(raw_terms)
    post = postings(docs)
    vocab = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    rawt = inline_table(
        spark, [(i, t) for i, t in enumerate(raw_terms)],
        "pos int, raw string",
    )
    cand = (
        rawt.join(vocab, F.levenshtein(F.col("raw"), F.col("term")) <= 1)
        .withColumn("lev", F.levenshtein("raw", "term"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("pos").orderBy(
                    F.asc("lev"), F.desc("df"), F.asc("term")
                )
            ),
        )
        .where(F.col("rk") <= n_cand)
        .select("pos", "term", "df")
    )
    combo = cand.where(F.col("pos") == 0).select(
        F.col("term").alias("t0"), F.col("df").alias("d0")
    )
    for i in range(1, L):
        ci = cand.where(F.col("pos") == i).select(
            F.col("term").alias(f"t{i}"), F.col("df").alias(f"d{i}")
        )
        combo = combo.crossJoin(ci)
    toks = docs.select(tokens_col("text").alias("t"))
    occ = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("bg")
        )
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    bg_total = F.lit(0).cast("long")
    for i in range(L - 1):
        o = occ.select(
            F.col("w1").alias(f"_a{i}"), F.col("w2").alias(f"_b{i}"),
            F.col("n").alias(f"_n{i}"),
        )
        combo = combo.join(
            o,
            (F.col(f"t{i}") == F.col(f"_a{i}"))
            & (F.col(f"t{i + 1}") == F.col(f"_b{i}")),
            "left",
        ).drop(f"_a{i}", f"_b{i}")
        bg_total = bg_total + F.coalesce(F.col(f"_n{i}"), F.lit(0))
    return (
        combo.select(
            F.concat_ws(" ", *[F.col(f"t{i}") for i in range(L)])
            .alias("query"),
            bg_total.alias("bigram_n"),
            sum(
                [F.col(f"d{i}") for i in range(1, L)], F.col("d0")
            ).cast("long").alias("sum_df"),
        )
        .orderBy(F.desc("bigram_n"), F.desc("sum_df"), F.asc("query"))
        .limit(k)
    )


def _dym_sql(raw_terms: list[str], n_cand: int = DYM_CAND,
             k: int = DYM_K) -> str:
    """DuckDB twin of :func:`did_you_mean` (generated per position)."""
    L = len(raw_terms)
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(raw_terms))
    combo_from = ", ".join(
        f"(SELECT * FROM cand WHERE pos = {i}) c{i}" for i in range(L)
    )
    combo_cols = ", ".join(
        f"c{i}.term AS t{i}, c{i}.df AS d{i}" for i in range(L)
    )
    occ_joins = "\n".join(
        f"LEFT JOIN occ o{i} ON o{i}.w1 = combo.t{i} AND o{i}.w2 = combo.t{i + 1}"
        for i in range(L - 1)
    )
    bg_sum = " + ".join(f"coalesce(o{i}.n, 0)" for i in range(L - 1))
    qcat = " || ' ' || ".join(f"t{i}" for i in range(L))
    df_sum = " + ".join(f"d{i}" for i in range(L))
    return f"""
WITH {_POST},
toks AS (SELECT {_T} AS t FROM documents),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
raw(pos, raw) AS (VALUES {vals}),
cand AS (
  SELECT pos, term, df FROM (
    SELECT r.pos, v.term, v.df,
           row_number() OVER (PARTITION BY r.pos
             ORDER BY levenshtein(r.raw, v.term) ASC, v.df DESC,
                      v.term ASC) AS rk
    FROM raw r JOIN dfq v ON levenshtein(r.raw, v.term) <= 1
  ) WHERE rk <= {n_cand}
),
big AS (
  SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
),
occ AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM big GROUP BY w1, w2),
combo AS (SELECT {combo_cols} FROM {combo_from})
SELECT {qcat} AS query,
       CAST({bg_sum} AS BIGINT) AS bigram_n,
       CAST({df_sum} AS BIGINT) AS sum_df
FROM combo
{occ_joins}
ORDER BY bigram_n DESC, sum_df DESC, query ASC
LIMIT {k}
"""


TOP_HITS_N = 3


def top_hits_per_group(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    n: int = TOP_HITS_N, group_col: str = "source",
) -> DataFrame:
    """ES ``top_hits`` aggregation: the top-``n`` hits per
    ``group_col`` value (per-repo result panels) — the top-N
    generalization of :func:`bm25_topk_collapse`'s best-1.

    Scale shape: a naive window PARTITION BY group sorts a hot group's
    entire candidate set in one task, so this is TWO-PHASE (the
    pack_sequences / stratified-rank pattern): phase 1 ranks within
    (group, doc_id-hash bucket) — bounded partitions — keeping ≤ n per
    bucket; phase 2 ranks the survivors (≤ 32·n rows per group) within
    the group. Both windows see candidate-sized, never corpus-sized,
    input; the result is identical to the single-window twin because
    any group-wide top-n row is necessarily in its bucket's top-n."""
    from pyspark.sql import Window

    scored = bm25_scores(spark, docs, terms or QUERY_MAIN)
    j = scored.join(
        docs.select("doc_id", F.col(group_col).alias("grp")), "doc_id"
    )
    order = [F.desc("score"), F.asc("doc_id")]
    w_local = Window.partitionBy(
        "grp", F.pmod(F.xxhash64("doc_id"), F.lit(32))
    ).orderBy(*order)
    w_grp = Window.partitionBy("grp").orderBy(*order)
    return (
        j.withColumn("_lrk", F.row_number().over(w_local))
        .where(F.col("_lrk") <= n)
        .withColumn("rk", F.row_number().over(w_grp))
        .where(F.col("rk") <= n)
        .select(
            F.col("grp").alias(group_col), "doc_id", "score", "matched",
            F.col("rk").cast("int").alias("rk"),
        )
    )


PRF_N_FB = 5      # feedback docs
PRF_N_EXP = 3     # expansion terms
PRF_ALPHA = 0.5   # expansion-term weight


def prf_expanded_topk(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    n_fb: int = PRF_N_FB, n_exp: int = PRF_N_EXP,
    alpha: float = PRF_ALPHA, k: int = TOPK,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio 1971 /
    Lavrenko & Croft relevance models, the RM3 interpolation shape):
    run the query, take the top ``n_fb`` docs as pseudo-relevant,
    mine ``n_exp`` expansion terms from them, and re-score with the
    original terms at weight 1.0 + expansion terms at ``alpha`` —
    riding the same per-term-weight algebra as ``bm25_topk_boost``.

    Expansion ranking is INTEGER-deterministic by design: candidate
    terms order by (Σtf within feedback docs DESC, corpus df ASC, term
    ASC) — frequent in the feedback set, rare in the corpus — so both
    engines cut the same top-``n_exp`` with no float-tie divergence
    (the reason this is not a literal float RM1 estimate; documented
    twin-stability trade, cf. the fixed-point graph ops).

    Scale shape: pass 1 is the ordinary one-shuffle scored set;
    feedback is k-row; expansion mining joins postings against a
    BROADCAST n_fb-row doc set then aggregates vocab-sized rows;
    pass 2 re-runs the one-shuffle scoring with ≤ |q|+n_exp terms.
    Nothing corpus-sized happens twice except the postings aggregate
    both passes share (AQE ReusedExchange)."""
    terms = QUERY_MAIN if terms is None else terms
    q_terms = sorted(set(terms))
    post = postings(docs)
    fb = (
        bm25_scores(spark, docs, q_terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(n_fb)
        .select("doc_id")
    )
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    exp = (
        post.join(F.broadcast(fb), "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("s_tf"))
        .where(~F.col("term").isin(q_terms))
        .join(df_tbl, "term")
        .orderBy(F.desc("s_tf"), F.asc("df"), F.asc("term"))
        .limit(n_exp)
        .select("term", F.lit(float(alpha)).alias("w"))
    )
    q2 = inline_table(
        spark, [(t, 1.0) for t in q_terms], "term string, w double"
    ).unionByName(exp)
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = _corpus_stats(docs)
    m = (
        post.join(F.broadcast(q2), "term")
        .join(df_tbl, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        m.withColumn("partial", F.col("w") * idf * tfn)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("partial"), 4).alias("score"),
            F.count("*").cast("int").alias("matched"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "matched")
    )


DISMAX_TIE = 0.3


def dismax_topk(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    tie: float = DISMAX_TIE, k: int = TOPK,
) -> DataFrame:
    """Disjunction-max top-k over (content, path) fields — Lucene
    DisjunctionMaxQuery / ES ``dis_max`` with a tie_breaker: each field
    scores INDEPENDENTLY (its own tf, df, dl, avgdl — the contrast to
    BM25F, which merges tf pre-saturation), and the doc's score is
    ``best + tie·(sum − best)``. Favors docs strong in ONE field over
    docs mediocre in several; ``n_fields`` counts fields with any
    match.

    Plan shape: two narrow explode→groupBy legs (content postings is
    the same aggregate plain BM25 needs; the path leg is token-count
    sized, ~5 tokens/doc) union into one per-(doc, field) relation; the
    final per-doc max/sum rides one doc_id-keyed aggregate;
    TakeOrderedAndProject top-k. No content re-read between legs."""
    terms = QUERY_BM25F if terms is None else terms
    q = inline_table(spark, [(t,) for t in sorted(set(terms))], "term string")

    def field_scores(toks: F.Column, tag: str) -> DataFrame:
        post = (
            docs.select("doc_id", F.explode(toks).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("int").alias("tf"))
        )
        dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
        dfq = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
        stats = docs.select(F.count("*").alias("n")).crossJoin(
            post.agg((F.sum("tf").cast("double")).alias("ttf"))
        ).select("n", (F.col("ttf") / F.col("n")).alias("avgdl"))
        m = (
            post.join(F.broadcast(q), "term")
            .join(dfq, "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
        )
        idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        tfn = (F.col("tf") * (BM25_K1 + 1)) / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
        return (
            m.withColumn("partial", idf * tfn)
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("fs"))
            .select("doc_id", F.lit(tag).alias("field"), "fs")
        )

    both = field_scores(tokens_col("text"), "content").unionByName(
        field_scores(_path_tokens("source"), "path")
    )
    return (
        both.groupBy("doc_id")
        .agg(
            F.round(
                F.max("fs") + F.lit(tie) * (F.sum("fs") - F.max("fs")), 4
            ).alias("score"),
            F.count("*").cast("int").alias("n_fields"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "n_fields")
    )


# stored percolator queries: (query_id, terms, require_all) — ES
# percolate semantics: require_all=True is a MUST conjunction,
# False is a SHOULD disjunction (≥1 term)
PERC_QUERIES = [
    ("q_all_filter_join", ["filter", "join"], True),
    ("q_any_stream_window", ["stream", "window"], False),
    ("q_all_table_scan", ["table", "scan"], True),
    ("q_any_commit_merge", ["commit", "merge"], False),
]


def percolate(
    spark: SparkSession, docs: DataFrame,
    queries: list[tuple[str, list[str], bool]] | None = None,
) -> DataFrame:
    """Reverse search (ES/Lucene percolator): the QUERIES are stored,
    the DOCS are probes — for every doc, emit the stored queries it
    matches (alerting / saved-search notification shape). A conjunctive
    stored query matches when every term is present; a disjunctive one
    when at least one is.

    Scale shape: the stored-query table is broadcast (a percolator
    registry is KB–MB); the only corpus-sized work is the postings
    aggregate every other op shares, and the match test is one
    (doc_id, qid)-keyed count — output bounded by matches, never
    docs×queries materialized."""
    queries = PERC_QUERIES if queries is None else queries
    rows = [
        (qid, t, len(sorted(set(terms))), bool(require_all))
        for qid, terms, require_all in queries
        for t in sorted(set(terms))
    ]
    qt = inline_table(
        spark, sorted(rows),
        "qid string, term string, n_terms int, require_all boolean",
    )
    post = postings(docs)  # already distinct (doc_id, term)
    return (
        post.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "qid", "n_terms", "require_all")
        .agg(F.count("*").cast("int").alias("n_hit"))
        .where((~F.col("require_all")) | (F.col("n_hit") == F.col("n_terms")))
        .select("doc_id", "qid", "n_hit")
    )


# stored queries with MUST_NOT clauses: (qid, terms, require_all, exclude)
PERC_NOT_QUERIES = [
    ("q_all_filter_join_not_hash", ["filter", "join"], True, ["hash"]),
    ("q_any_window_not_merge", ["window"], False, ["merge"]),
    ("q_any_stream", ["stream"], False, []),
]


def percolate_not(
    spark: SparkSession, docs: DataFrame,
    queries: list[tuple[str, list[str], bool, list[str]]] | None = None,
) -> DataFrame:
    """Percolator with MUST_NOT clauses (the ES percolator's boolean
    form): a stored query matches when its positive rule holds
    (conjunctive = every term, disjunctive = ≥1) AND the doc contains
    NONE of its excluded terms — saved-search alerting with negative
    filters ("spark AND join but NOT hash").

    Plan shape: ONE broadcast registry carrying both clause polarities
    (``is_neg``) joined against the shared postings aggregate, then a
    single per-(doc, qid) count — positive hits counted, any negative
    hit vetoing the pair in the same aggregation. The corpus really is
    touched exactly once (ADVICE r3: the previous anti-join formulation
    re-derived ``postings(docs)`` for the exclusion leg)."""
    queries = PERC_NOT_QUERIES if queries is None else queries
    rows = [
        (qid, t, len(sorted(set(terms))), bool(require_all), is_neg)
        for qid, terms, require_all, exclude in queries
        for t, is_neg in (
            [(t, False) for t in sorted(set(terms))]
            + [(t, True) for t in sorted(set(exclude))]
        )
    ]
    qt = inline_table(
        spark, sorted(rows),
        "qid string, term string, n_terms int, require_all boolean,"
        " is_neg boolean",
    )
    return (
        postings(docs)
        .join(F.broadcast(qt), "term")
        .groupBy("doc_id", "qid", "n_terms", "require_all")
        .agg(
            F.sum(F.when(~F.col("is_neg"), 1).otherwise(0))
            .cast("int")
            .alias("n_hit"),
            F.max(F.col("is_neg").cast("int")).alias("n_neg"),
        )
        .where(
            (F.col("n_neg") == 0)
            & (F.col("n_hit") > 0)
            & ((~F.col("require_all")) | (F.col("n_hit") == F.col("n_terms")))
        )
        .select("doc_id", "qid", "n_hit")
    )


HIST_WIDTH = 50


def match_histogram(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    width: int = HIST_WIDTH,
) -> DataFrame:
    """ES histogram aggregation over the FULL match set: bucket the
    matching docs by ``n_chars`` in fixed-width intervals, with per-
    bucket doc count and score mass. Same one-pass shape as
    ``search_facets`` — the scored set joins the metadata column and
    aggregates once; integer bucket arithmetic (floor division) so the
    bucket key is exact on both engines."""
    terms = QUERY_MAIN if terms is None else terms
    scored = bm25_scores(spark, docs, terms)
    return (
        scored.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy(
            (F.floor(F.col("n_chars") / width) * width)
            .cast("long")
            .alias("bucket_lo")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum("score"), 4).alias("sum_score"),
        )
    )


COMPOSITE_SIZE = 8
COMPOSITE_AFTER = ("en", "src2")  # after-key cursor: (lang, source)


def composite_agg(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    size: int = COMPOSITE_SIZE,
    after: tuple[str, str] | None = COMPOSITE_AFTER,
) -> DataFrame:
    """ES composite aggregation: pageable multi-source buckets over the
    FULL matching set — buckets keyed (lang, source) in key order, one
    page of ``size`` buckets strictly AFTER the ``after`` cursor. The
    scale-safe bucket pagination: where a terms-agg must materialize
    (and re-sort) every bucket per request, the after-key predicate
    prunes buckets BEFORE the page cut, so deep bucket paging costs the
    same as page 1 — the aggregation twin of keyset (search_after)
    document paging.

    Plan shape: the one-shuffle scored set joins doc metadata, one
    (lang, source)-keyed aggregate with map-side combine, the cursor
    filter on the aggregate output, TakeOrderedAndProject for the
    page."""
    terms = QUERY_MAIN if terms is None else terms
    scored = bm25_scores(spark, docs, terms)
    buckets = (
        scored.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum("score"), 4).alias("sum_score"),
        )
    )
    if after is not None:
        buckets = buckets.where(
            F.struct("lang", "source")
            > F.struct(F.lit(after[0]).alias("lang"), F.lit(after[1]).alias("source"))
        )
    return (
        buckets.orderBy(F.asc("lang"), F.asc("source"))
        .limit(size)
        .select("lang", "source", "n_docs", "sum_score")
    )


DECAY_OFFSET_D = 30   # grace period before decay starts (days)
DECAY_SCALE_D = 90    # at offset+scale days the multiplier equals DECAY_RATE
DECAY_RATE = 0.5
AGE_MOD = 365         # deterministic pseudo-age: doc_id mod 365 days


def _age_days() -> F.Column:
    """Deterministic pseudo-recency in days derived from doc_id (the
    driver's documents table carries no timestamp; a real deployment
    uses the doc's date column here). Double-mod keeps the result
    non-negative on both engines regardless of doc_id sign."""
    return (F.col("doc_id") % AGE_MOD + AGE_MOD) % AGE_MOD


def bm25_topk_decay(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    k: int = TOPK,
) -> DataFrame:
    """ES function_score with an exponential recency decay
    (`exp` decay function: multiplier = rate^(max(0, age−offset)/scale))
    — fresher docs outrank stale ones at equal text relevance, the
    standard news/commerce ranking blend.

    The multiplier applies to the 4dp-rounded BM25 score and the result
    re-rounds to 4dp, so both engines multiply identical doubles.
    Scale shape: the decay is a per-row expression on the already-
    aggregated scored set — zero extra joins or shuffles beyond
    ``bm25_scores``; top-k stays TakeOrderedAndProject. On the
    compressed-index path this multiplier would cap WAND upper bounds
    by the partition's max multiplier; here the op stays exhaustive
    (the full match set is scored anyway)."""
    terms = QUERY_MAIN if terms is None else terms
    scored = bm25_scores(spark, docs, terms)
    age = _age_days()
    mult = F.exp(
        F.log(F.lit(DECAY_RATE))
        * F.greatest(F.lit(0.0), (age - DECAY_OFFSET_D).cast("double"))
        / F.lit(float(DECAY_SCALE_D))
    )
    return (
        scored.select(
            "doc_id",
            F.round(F.col("score") * mult, 4).alias("score"),
            "matched",
            age.cast("int").alias("age_days"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


RF_PIVOT = 256    # rank_feature saturation pivot (chars)
RF_WEIGHT = 2.0   # boost weight of the feature clause


def rank_feature_topk(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    k: int = TOPK,
) -> DataFrame:
    """ES rank_feature query (saturation form): score = BM25 +
    w·f/(f+pivot) over a numeric per-doc feature — here ``n_chars``
    stands in for the stored feature (pagerank, popularity, …). The
    saturation keeps the feature's contribution bounded by ``w`` no
    matter how large the raw value, exactly Lucene's
    FeatureField#newSaturationQuery.

    Scale shape: one narrow (doc_id, n_chars) join onto the scored
    set — the feature column rides the same doc-keyed exchange; at
    production scale it lives in the doc-metadata sidecar the engine
    already broadcasts per-hit."""
    terms = QUERY_MAIN if terms is None else terms
    scored = bm25_scores(spark, docs, terms)
    sat = F.col("n_chars").cast("double") / (
        F.col("n_chars").cast("double") + F.lit(float(RF_PIVOT))
    )
    return (
        scored.join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            "doc_id",
            F.round(F.col("score") + F.lit(RF_WEIGHT) * sat, 4).alias("score"),
            "matched",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


QUERY_STEM = ["windows", "joins"]  # plural forms; s-stem → in-vocab terms


def _stem_col(c: F.Column) -> F.Column:
    """Minimal English s-stemmer (Lucene EnglishMinimalStemFilter /
    Harman's s-stemmer): strip one trailing 's' from terms of length ≥4
    unless they end in 'ss'/'us'/'is'. Pure CASE + substring — the one
    stemming rule expressible identically in Spark SQL and DuckDB
    (RE2 has no lookbehind, so no regex)."""
    strip = (
        (F.length(c) >= 4)
        & c.endswith("s")
        & ~c.endswith("ss")
        & ~c.endswith("us")
        & ~c.endswith("is")
    )
    return F.when(strip, F.substring(c, F.lit(1), F.length(c) - 1)).otherwise(c)


def stem_py(t: str) -> str:
    """Driver-side twin of :func:`_stem_col` for query-term analysis."""
    if len(t) >= 4 and t.endswith("s") and not t.endswith(("ss", "us", "is")):
        return t[:-1]
    return t


def bm25_topk_stem(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    k: int = TOPK,
) -> DataFrame:
    """BM25 top-k under a stemming analyzer: the s-stemmer runs on BOTH
    the indexed tokens and the query terms (the analyzer symmetry every
    Lucene analysis chain guarantees), so 'windows' matches docs
    containing 'window' and plural/singular variants share one posting
    list (tf sums, df unions — the index-side merge a query-time
    synonym expansion can't replicate).

    Scale shape: identical to :func:`bm25_scores` — the stem is a
    per-token expression inside the same explode→groupBy, zero extra
    passes."""
    terms = QUERY_STEM if terms is None else terms
    toks = tokens_col("text")
    post = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .select("doc_id", _stem_col(F.col("tok")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    q = inline_table(
        spark, [(t,) for t in sorted({stem_py(t) for t in terms})], "term string"
    )
    stats = _corpus_stats(docs)  # n + avgdl are stem-invariant (tf conserved)
    m = (
        post.join(F.broadcast(q), "term")
        .join(df_tbl, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
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


QUERY_PORTER = ["joining", "windows", "sorted"]  # derivational forms the
# s-stemmer cannot reach ('joining'/'sorted'); Porter maps them onto the
# corpus vocabulary ('join'/'window'/'sort')


def bm25_topk_porter(
    spark: SparkSession, docs: DataFrame, terms: list[str] | None = None,
    k: int = TOPK,
) -> DataFrame:
    """BM25 top-k under the FULL Porter analyzer (functions/porter.py —
    the 1980 algorithm, r4): Porter runs on both the indexed tokens and
    the query terms, so inflectional AND derivational variants share
    one posting list ('joining' matches 'join' — beyond the s-stemmer's
    plural rule).

    Scale shape: the heavy stemming expression evaluates once per
    DISTINCT token (vocab-sized map joined back broadcast —
    functions/tokenize._porter_map), then the usual explode→groupBy.
    The DuckDB twin re-derives the stems through the same generated
    SQL stages (porter_duck_ctes), so a generator bug cannot hide."""
    from search_engine_spark.functions.porter import porter_stem
    from search_engine_spark.functions.tokenize import _porter_map

    terms = QUERY_PORTER if terms is None else terms
    toks = tokens_col("text")
    exploded = docs.select("doc_id", F.explode(toks).alias("term"))
    post = (
        _porter_map(exploded)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
        # materialize: post feeds three joins (df/dl/scores) and the
        # stem-mapped plan re-optimizes pathologically when inlined
        # three times (deep CASE chains × constraint propagation);
        # vocab-sized, blocks GC'd with the result
        .localCheckpoint(eager=True)
    )
    dl = post.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df_tbl = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    q = inline_table(
        spark, [(t,) for t in sorted({porter_stem(t) for t in terms})],
        "term string",
    )
    stats = _corpus_stats(docs)  # n + avgdl are analyzer-invariant
    m = (
        post.join(F.broadcast(q), "term")
        .join(df_tbl, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
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


def index_block_layout(docs: DataFrame) -> DataFrame:
    """The compressed index's block numbering as a window query:
    postings bucketed by term hash, row-numbered by doc_id within term,
    grouped into BLOCK_SIZE blocks with per-block doc range + max tf —
    the relational skeleton of operators/compress.py's encode step."""
    post = postings(docs).withColumn(
        "bucket", (term_hash31(F.col("term")) % N_BUCKETS).cast("int")
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    blk = post.withColumn(
        "block_id",
        F.floor((F.row_number().over(w) - 1) / BLOCK_SIZE).cast("int"),
    )
    return blk.groupBy("bucket", "term", "block_id").agg(
        F.count("*").cast("int").alias("n_postings"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.max("tf").alias("max_tf"),
    )


# --------------------------------------------------------------- oracle SQL

_T = duck_tokens("text")

_POST = f"""
post AS (
  SELECT doc_id, term, CAST(count(*) AS INTEGER) AS tf
  FROM (SELECT doc_id, unnest({_T}) AS term FROM documents)
  GROUP BY doc_id, term
)"""


def _q_values(terms: list[str]) -> str:
    return ", ".join(f"('{t}')" for t in sorted(set(terms)))


def _spell_q_cte(terms: list[str], max_sugg: int = MAX_SUGGESTIONS) -> str:
    """DuckDB twin of :func:`expand_terms`: vocab pass-through + top-3
    ED-1 suggestions by (df DESC, term ASC)."""
    return f"""qraw(term) AS (VALUES {_q_values(terms)}),
kept AS (SELECT q.term FROM qraw q JOIN dfq v USING (term)),
oov AS (SELECT term FROM qraw EXCEPT SELECT term FROM kept),
sugg AS (
  SELECT term FROM (
    SELECT o.term AS oterm, v.term,
           row_number() OVER (PARTITION BY o.term
                              ORDER BY v.df DESC, v.term ASC) AS rk
    FROM oov o JOIN dfq v ON levenshtein(o.term, v.term) = 1
  ) WHERE rk <= {max_sugg}
),
q AS (SELECT DISTINCT term FROM (SELECT term FROM kept UNION ALL SELECT term FROM sugg))"""


def _spell2_q_cte(terms: list[str], max_sugg: int = MAX_SUGGESTIONS) -> str:
    """DuckDB twin of :func:`expand_terms_fuzzy2`: vocab pass-through +
    top-3 ED≤2 suggestions by (lev ASC, df DESC, term ASC)."""
    return f"""qraw(term) AS (VALUES {_q_values(terms)}),
kept AS (SELECT q.term FROM qraw q JOIN dfq v USING (term)),
oov AS (SELECT term FROM qraw EXCEPT SELECT term FROM kept),
sugg AS (
  SELECT term FROM (
    SELECT o.term AS oterm, v.term,
           row_number() OVER (PARTITION BY o.term
                              ORDER BY levenshtein(o.term, v.term) ASC,
                                       v.df DESC, v.term ASC) AS rk
    FROM oov o JOIN dfq v ON levenshtein(o.term, v.term) BETWEEN 1 AND 2
  ) WHERE rk <= {max_sugg}
),
q AS (SELECT DISTINCT term FROM (SELECT term FROM kept UNION ALL SELECT term FROM sugg))"""


def _prefix_q_cte(raw_terms: list[str], max_exp: int = MAX_EXPANSIONS) -> str:
    """DuckDB twin of :func:`prefix_expand`: literal pass-through +
    per-prefix top-``max_exp`` expansion by (df DESC, term ASC)."""
    literals = sorted({t for t in raw_terms if not t.endswith("*")})
    prefixes = sorted({t[:-1] for t in raw_terms if t.endswith("*") and len(t) > 1})
    lit_vals = ", ".join(f"('{t}')" for t in literals)
    pfx_vals = ", ".join(f"('{x}')" for x in prefixes)
    return f"""lit(term) AS (VALUES {lit_vals}),
pfx(pfx) AS (VALUES {pfx_vals}),
exp AS (
  SELECT term FROM (
    SELECT v.term,
           row_number() OVER (PARTITION BY p.pfx
                              ORDER BY v.df DESC, v.term ASC) AS rk
    FROM pfx p JOIN dfq v ON starts_with(v.term, p.pfx)
  ) WHERE rk <= {max_exp}
),
q AS (SELECT DISTINCT term FROM (SELECT term FROM lit UNION ALL SELECT term FROM exp))"""


def _suffix_q_cte(raw_terms: list[str], max_exp: int = MAX_EXPANSIONS) -> str:
    """DuckDB twin of :func:`suffix_expand`: literal pass-through +
    per-suffix top-``max_exp`` expansion by (df DESC, term ASC)."""
    literals = sorted({t for t in raw_terms if not t.startswith("*")})
    suffixes = sorted(
        {t[1:] for t in raw_terms if t.startswith("*") and len(t) > 1}
    )
    lit_vals = ", ".join(f"('{t}')" for t in literals)
    sfx_vals = ", ".join(f"('{x}')" for x in suffixes)
    return f"""lit(term) AS (VALUES {lit_vals}),
sfx(sfx) AS (VALUES {sfx_vals}),
exp AS (
  SELECT term FROM (
    SELECT v.term,
           row_number() OVER (PARTITION BY s.sfx
                              ORDER BY v.df DESC, v.term ASC) AS rk
    FROM sfx s JOIN dfq v ON ends_with(v.term, s.sfx)
  ) WHERE rk <= {max_exp}
),
q AS (SELECT DISTINCT term FROM (SELECT term FROM lit UNION ALL SELECT term FROM exp))"""


def _scores_cte(terms: list[str], spell: bool = False,
                q_cte: str | None = None) -> str:
    if q_cte is None:
        q_cte = (
            _spell_q_cte(terms) if spell else f"q(term) AS (VALUES {_q_values(terms)})"
        )
    return f"""
WITH {_POST},
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM post) / (SELECT count(*) FROM documents) AS avgdl
),
{q_cte},
scored AS (
  SELECT p.doc_id,
         round(sum(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1)) /
                 (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p
  JOIN q USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY p.doc_id
)"""


def _duck_stem(col: str) -> str:
    """DuckDB twin of :func:`_stem_col` (s-stemmer CASE)."""
    return (
        f"CASE WHEN len({col}) >= 4 AND {col} LIKE '%s'"
        f" AND NOT ({col} LIKE '%ss' OR {col} LIKE '%us' OR {col} LIKE '%is')"
        f" THEN substr({col}, 1, len({col}) - 1) ELSE {col} END"
    )


def _stem_scores_sql(terms: list[str], k: int = TOPK) -> str:
    """DuckDB twin of :func:`bm25_topk_stem`: the s-stemmer runs inside
    the postings CTE and on the literal query terms."""
    stemmed = sorted({stem_py(t) for t in terms})
    vals = ", ".join(f"('{t}')" for t in stemmed)
    return f"""
WITH post AS (
  SELECT doc_id, term, CAST(count(*) AS INTEGER) AS tf
  FROM (SELECT doc_id, {_duck_stem('t')} AS term
        FROM (SELECT doc_id, unnest({_T}) AS t FROM documents))
  GROUP BY doc_id, term
),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM post) / (SELECT count(*) FROM documents) AS avgdl
),
q(term) AS (VALUES {vals}),
scored AS (
  SELECT p.doc_id,
         round(sum(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1)) /
                 (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p
  JOIN q USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, score, matched FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _porter_scores_sql(terms: list[str], k: int = TOPK) -> str:
    """DuckDB twin of :func:`bm25_topk_porter`: the generated Porter
    CTE chain (functions/porter.porter_duck_ctes) stems the unnested
    tokens; query terms are Porter-stemmed literals."""
    from search_engine_spark.functions.porter import (
        porter_duck_ctes,
        porter_stem,
    )

    stemmed = sorted({porter_stem(t) for t in terms})
    vals = ", ".join(f"('{t}')" for t in stemmed)
    ctes = porter_duck_ctes(
        f"SELECT doc_id, unnest({_T}) AS w FROM documents"
    )
    return f"""
WITH {ctes},
post AS (
  SELECT doc_id, w AS term, CAST(count(*) AS INTEGER) AS tf
  FROM pstem GROUP BY doc_id, w
),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM post) / (SELECT count(*) FROM documents) AS avgdl
),
q(term) AS (VALUES {vals}),
scored AS (
  SELECT p.doc_id,
         round(sum(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1)) /
                 (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p
  JOIN q USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, score, matched FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _boost_scores_sql(weighted: list[tuple[str, float]], k: int = TOPK) -> str:
    """DuckDB twin of :func:`bm25_topk_boost`: q carries (term, w) and
    the BM25 partial scales by w inside the per-doc sum."""
    vals = ", ".join(f"('{t}', {float(w)})" for t, w in sorted(set(weighted)))
    return f"""
WITH {_POST},
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM post) / (SELECT count(*) FROM documents) AS avgdl
),
q(term, w) AS (VALUES {vals}),
scored AS (
  SELECT p.doc_id,
         round(sum(q.w * ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1)) /
                 (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p
  JOIN q USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, score, matched FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _prf_sql(terms: list[str], n_fb: int = PRF_N_FB,
             n_exp: int = PRF_N_EXP, alpha: float = PRF_ALPHA,
             k: int = TOPK) -> str:
    """DuckDB twin of :func:`prf_expanded_topk`: feedback top-docs CTE,
    integer-keyed expansion ranking, weighted re-score."""
    q_terms = sorted(set(terms))
    in_list = ", ".join(f"'{t}'" for t in q_terms)
    orig_vals = ", ".join(f"('{t}', 1.0)" for t in q_terms)
    return (
        _scores_cte(q_terms)
        + f""",
fb AS (SELECT doc_id FROM scored ORDER BY score DESC, doc_id ASC LIMIT {n_fb}),
exp AS (
  SELECT p.term, {float(alpha)} AS w
  FROM post p JOIN fb USING (doc_id)
  JOIN dfq ON dfq.term = p.term
  WHERE p.term NOT IN ({in_list})
  GROUP BY p.term, dfq.df
  ORDER BY CAST(sum(p.tf) AS BIGINT) DESC, dfq.df ASC, p.term ASC
  LIMIT {n_exp}
),
q2(term, w) AS (
  SELECT * FROM (VALUES {orig_vals}) UNION ALL SELECT term, w FROM exp
),
scored2 AS (
  SELECT p.doc_id,
         round(sum(q2.w * ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1)) /
                 (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p
  JOIN q2 USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, score, matched FROM scored2
ORDER BY score DESC, doc_id ASC LIMIT {k}"""
    )


def _field_scored_cte(pref: str, tok_expr: str) -> str:
    """Per-field scored CTE set for the dis_max twin: independent
    tf/df/dl/avgdl from ``tok_expr``, per-doc float score ``fs``.
    Expects a ``q(term)`` CTE in scope."""
    return f"""{pref}post AS (
  SELECT doc_id, term, CAST(count(*) AS INTEGER) AS tf
  FROM (SELECT doc_id, unnest({tok_expr}) AS term FROM documents)
  GROUP BY doc_id, term
),
{pref}dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM {pref}post GROUP BY doc_id),
{pref}df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM {pref}post GROUP BY term),
{pref}stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM {pref}post)
           / (SELECT count(*) FROM documents) AS avgdl
),
{pref}s AS (
  SELECT p.doc_id,
         sum(ln((st.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (p.tf * ({BM25_K1} + 1)) /
               (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * l.dl / st.avgdl))) AS fs
  FROM {pref}post p
  JOIN q USING (term)
  JOIN {pref}df d ON d.term = p.term
  JOIN {pref}dl l ON l.doc_id = p.doc_id
  CROSS JOIN {pref}stats st
  GROUP BY p.doc_id
)"""


def _dismax_sql(terms: list[str], tie: float = DISMAX_TIE,
                k: int = TOPK) -> str:
    """DuckDB twin of :func:`dismax_topk`: two independent per-field
    scored CTEs, union, per-doc best + tie·(sum − best)."""
    return f"""
WITH q(term) AS (VALUES {_q_values(sorted(set(terms)))}),
{_field_scored_cte('c', _T)},
{_field_scored_cte('p', _duck_path_tokens('source'))},
u AS (SELECT doc_id, fs FROM cs UNION ALL SELECT doc_id, fs FROM ps)
SELECT doc_id,
       round(max(fs) + {float(tie)} * (sum(fs) - max(fs)), 4) AS score,
       CAST(count(*) AS INTEGER) AS n_fields
FROM u GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _percolate_sql(
    queries: list[tuple[str, list[str], bool]],
) -> str:
    """DuckDB twin of :func:`percolate`: the stored-query table as an
    inline VALUES relation, match = per-(doc, qid) hit count vs the
    all/any rule."""
    rows = sorted(
        (qid, t, len(sorted(set(terms))), bool(require_all))
        for qid, terms, require_all in queries
        for t in sorted(set(terms))
    )
    vals = ", ".join(
        f"('{qid}', '{t}', {n}, {'TRUE' if ra else 'FALSE'})"
        for qid, t, n, ra in rows
    )
    return f"""
WITH {_POST},
q(qid, term, n_terms, require_all) AS (VALUES {vals}),
m AS (
  SELECT p.doc_id, q.qid, q.n_terms, q.require_all,
         CAST(count(*) AS INTEGER) AS n_hit
  FROM post p JOIN q USING (term)
  GROUP BY p.doc_id, q.qid, q.n_terms, q.require_all
)
SELECT doc_id, qid, n_hit FROM m
WHERE (NOT require_all) OR n_hit = n_terms
"""


def _percolate_not_sql(
    queries: list[tuple[str, list[str], bool, list[str]]],
) -> str:
    """DuckDB twin of :func:`percolate_not`: positive rule as in
    :func:`_percolate_sql`, minus the (doc, qid) pairs hitting any
    excluded term."""
    pos = sorted(
        (qid, t, len(sorted(set(terms))), bool(require_all))
        for qid, terms, require_all, _ in queries
        for t in sorted(set(terms))
    )
    vals = ", ".join(
        f"('{qid}', '{t}', {n}, {'TRUE' if ra else 'FALSE'})"
        for qid, t, n, ra in pos
    )
    neg = sorted(
        (qid, t) for qid, _, _, exclude in queries for t in sorted(set(exclude))
    )
    if not neg:
        # no stored query has exclusions: 'VALUES ' with zero rows is a
        # SQL syntax error, and the Spark twin (percolate_not) already
        # degrades to plain percolation — mirror it exactly
        return _percolate_sql(
            [(qid, terms, ra) for qid, terms, ra, _ in queries]
        )
    nvals = ", ".join(f"('{qid}', '{t}')" for qid, t in neg)
    return f"""
WITH {_POST},
q(qid, term, n_terms, require_all) AS (VALUES {vals}),
nq(qid, term) AS (VALUES {nvals}),
m AS (
  SELECT p.doc_id, q.qid, q.n_terms, q.require_all,
         CAST(count(*) AS INTEGER) AS n_hit
  FROM post p JOIN q USING (term)
  GROUP BY p.doc_id, q.qid, q.n_terms, q.require_all
),
sup AS (
  SELECT DISTINCT p.doc_id, nq.qid FROM post p JOIN nq USING (term)
)
SELECT m.doc_id, m.qid, m.n_hit FROM m
ANTI JOIN sup ON sup.doc_id = m.doc_id AND sup.qid = m.qid
WHERE (NOT m.require_all) OR m.n_hit = m.n_terms
"""


_BATCH_SCORED_CTE = f"""
WITH {_POST},
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM post) / (SELECT count(*) FROM documents) AS avgdl
),
q(query_id, term) AS (VALUES {", ".join(
    f"('{qid}', '{t}')"
    for qid, ts in sorted(BATCH_QUERIES.items()) for t in sorted(set(ts))
)}),
scored AS (
  SELECT q.query_id, p.doc_id,
         round(sum(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1)) /
                 (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p
  JOIN q USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY q.query_id, p.doc_id
)"""


def _sig_terms_sql(terms: list[str], k: int = SIG_TOP_K) -> str:
    lst = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest({_T}) AS term FROM documents)
),
qt AS (SELECT unnest([{lst}]) AS qterm),
fg_docs AS (
  SELECT DISTINCT doc_id FROM dt WHERE term IN (SELECT qterm FROM qt)
),
fsize AS (SELECT CAST(count(*) AS BIGINT) AS fg FROM fg_docs),
nsize AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
fgt AS (
  SELECT term, CAST(count(*) AS BIGINT) AS fg_df FROM dt
  WHERE doc_id IN (SELECT doc_id FROM fg_docs) GROUP BY term
),
bgt AS (SELECT term, CAST(count(*) AS BIGINT) AS bg_df FROM dt GROUP BY term),
scored AS (
  SELECT f.term, f.fg_df, b.bg_df,
         round((f.fg_df * 1.0 / fs.fg - b.bg_df * 1.0 / ns.n)
               * ((f.fg_df * 1.0 / fs.fg) / (b.bg_df * 1.0 / ns.n)), 6)
           AS score
  FROM fgt f JOIN bgt b USING (term)
  CROSS JOIN fsize fs CROSS JOIN nsize ns
  WHERE f.term NOT IN (SELECT qterm FROM qt)
)
SELECT term, fg_df, bg_df, score FROM scored
WHERE score > 0
ORDER BY score DESC, term ASC
LIMIT {k}
"""


ORACLE_SQL = {
    "search_postings": f"WITH {_POST} SELECT doc_id, term, tf FROM post",
    "search_significant_terms": _sig_terms_sql(QUERY_MAIN),
    "search_term_stats": f"""
WITH {_POST},
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT term, df,
       round(ln((n.n - df + 0.5) / (df + 0.5) + 1.0), 4) AS idf_bm25,
       CASE WHEN (n.n // (df + 1)) >= 1
            THEN round(log10(CAST(n.n // (df + 1) AS DOUBLE)), 4)
            ELSE 0.0 END AS idf_ref
FROM dfq CROSS JOIN n
""",
    "search_bm25_scores": _scores_cte(QUERY_MAIN) + "\nSELECT doc_id, score, matched FROM scored",
    "search_facets": _scores_cte(QUERY_MAIN)
    + """
SELECT f.facet, f.value,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(max(s.score), 4) AS max_score,
       round(sum(s.score), 4) AS sum_score
FROM scored s
JOIN documents d USING (doc_id),
     LATERAL (VALUES ('lang', d.lang), ('source', d.source)) f(facet, value)
GROUP BY f.facet, f.value
""",
    "search_bm25_topk": _scores_cte(QUERY_MAIN)
    + f"\nSELECT doc_id, score, matched FROM scored ORDER BY score DESC, doc_id ASC LIMIT {TOPK}",
    "search_bm25_decay": _scores_cte(QUERY_MAIN)
    + f""",
dec AS (
  SELECT doc_id,
         round(score * exp(ln({DECAY_RATE})
               * greatest(0.0, CAST(((doc_id % {AGE_MOD}) + {AGE_MOD}) % {AGE_MOD}
                                    - {DECAY_OFFSET_D} AS DOUBLE))
               / {DECAY_SCALE_D}.0), 4) AS score,
         matched,
         CAST(((doc_id % {AGE_MOD}) + {AGE_MOD}) % {AGE_MOD} AS INTEGER) AS age_days
  FROM scored
)
SELECT doc_id, score, matched, age_days FROM dec
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}""",
    "search_rank_feature": _scores_cte(QUERY_MAIN)
    + f"""
SELECT s.doc_id,
       round(s.score + {RF_WEIGHT} * CAST(d.n_chars AS DOUBLE)
             / (CAST(d.n_chars AS DOUBLE) + {RF_PIVOT}.0), 4) AS score,
       s.matched
FROM scored s JOIN documents d USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}""",
    "search_bm25_stem": _stem_scores_sql(QUERY_STEM),
    "search_bm25_porter": _porter_scores_sql(QUERY_PORTER),
    "search_composite_agg": _scores_cte(QUERY_MAIN)
    + f"""
SELECT d.lang, d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(s.score), 4) AS sum_score
FROM scored s JOIN documents d USING (doc_id)
GROUP BY d.lang, d.source
HAVING (d.lang, d.source) > ('{COMPOSITE_AFTER[0]}', '{COMPOSITE_AFTER[1]}')
ORDER BY d.lang ASC, d.source ASC LIMIT {COMPOSITE_SIZE}""",
    "search_collapse_topk": _scores_cte(QUERY_MAIN)
    + f""",
best AS (
  SELECT d.source, s.doc_id, s.score, s.matched,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.score DESC, s.doc_id ASC) AS rk
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT source, doc_id, score, matched FROM best WHERE rk = 1
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}""",
    "search_bm25_snippets": _scores_cte(QUERY_MAIN)
    + f""",
topk AS (
  SELECT doc_id, score, matched FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {TOPK}
),
anch AS (
  SELECT t.doc_id, t.score, t.matched, d.text,
         least({", ".join(
             f"CASE WHEN strpos(lower(d.text), '{t}') > 0 "
             f"THEN strpos(lower(d.text), '{t}') ELSE {_NO_SUBSTR} END"
             for t in sorted(set(QUERY_MAIN))
         )}) AS rawpos
  FROM topk t JOIN documents d USING (doc_id)
)
SELECT doc_id, score, matched,
       CAST(CASE WHEN rawpos = {_NO_SUBSTR} THEN 0 ELSE rawpos END AS INTEGER)
         AS anchor,
       substr(text,
              greatest(1, (CASE WHEN rawpos = {_NO_SUBSTR} THEN 0 ELSE rawpos END)
                          - {SNIPPET_RADIUS}),
              {SNIPPET_LEN}) AS snippet
FROM anch
""",
    "search_bm25_topk_oov": _scores_cte(QUERY_MIXED)
    + f"\nSELECT doc_id, score, matched FROM scored ORDER BY score DESC, doc_id ASC LIMIT {TOPK}",
    "search_bm25_topk_typo": _scores_cte(QUERY_TYPO, spell=True)
    + f"\nSELECT doc_id, score, matched FROM scored ORDER BY score DESC, doc_id ASC LIMIT {TOPK}",
    "search_bm25_topk_typo2": _scores_cte([], q_cte=_spell2_q_cte(QUERY_TYPO2))
    + f"\nSELECT doc_id, score, matched FROM scored ORDER BY score DESC, doc_id ASC LIMIT {TOPK}",
    "search_bm25_topk_boost": _boost_scores_sql(QUERY_BOOST),
    "search_bm25_field": _scores_cte(QUERY_MAIN)
    + f"""
SELECT s.doc_id, s.score, s.matched
FROM scored s JOIN documents d USING (doc_id)
WHERE d.{FIELD_FILTER[0]} = '{FIELD_FILTER[1]}'
ORDER BY s.score DESC, s.doc_id ASC LIMIT {TOPK}""",
    "search_dismax_topk": _dismax_sql(QUERY_BM25F),
    "search_prf_topk": _prf_sql(QUERY_MAIN),
    "search_did_you_mean": _dym_sql(QUERY_DYM),
    "search_top_hits": _scores_cte(QUERY_MAIN)
    + f"""
SELECT source, doc_id, score, matched, rk FROM (
  SELECT d.source, s.doc_id, s.score, s.matched,
         CAST(row_number() OVER (PARTITION BY d.source
                                 ORDER BY s.score DESC, s.doc_id ASC)
              AS INTEGER) AS rk
  FROM scored s JOIN documents d USING (doc_id)
) WHERE rk <= {TOP_HITS_N}""",
    "search_percolate": _percolate_sql(PERC_QUERIES),
    "search_percolate_not": _percolate_not_sql(PERC_NOT_QUERIES),
    "search_bm25_highlight": _scores_cte(QUERY_MAIN)
    + f""",
topk AS (
  SELECT doc_id, score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {TOPK}
),
anch AS (
  SELECT t.doc_id, t.score, d.text,
         list_sort(list_distinct(list_filter(
           [{", ".join(f"strpos(lower(d.text), '{t}')" for t in sorted(set(QUERY_MAIN)))}],
           p -> p > 0))) AS ps
  FROM topk t JOIN documents d USING (doc_id)
),
pp AS (
  SELECT doc_id, score, text, ps[1] AS p1, ps[2] AS p2, ps[3] AS p3 FROM anch
),
keeps AS (
  SELECT doc_id, score, text, p1 AS k1,
         CASE WHEN greatest(1, p2 - {FRAG_LEFT})
                   >= greatest(1, p1 - {FRAG_LEFT}) + {FRAG_LEN}
              THEN p2 END AS k2,
         CASE WHEN greatest(1, p3 - {FRAG_LEFT})
                   >= greatest(1, coalesce(
                        CASE WHEN greatest(1, p2 - {FRAG_LEFT})
                                  >= greatest(1, p1 - {FRAG_LEFT}) + {FRAG_LEN}
                             THEN p2 END,
                        p1) - {FRAG_LEFT}) + {FRAG_LEN}
              THEN p3 END AS k3
  FROM pp
),
f AS (
  SELECT doc_id, score, text,
         unnest(list_filter([k1, k2, k3], x -> x IS NOT NULL)) AS frag_start
  FROM keeps
)
SELECT doc_id, score,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY frag_start)
            AS INTEGER) AS frag_no,
       CAST(frag_start AS INTEGER) AS frag_start,
       substr(text, greatest(1, frag_start - {FRAG_LEFT}), {FRAG_LEN})
         AS fragment
FROM f""",
    "search_match_histogram": _scores_cte(QUERY_MAIN)
    + f"""
SELECT CAST((d.n_chars // {HIST_WIDTH}) * {HIST_WIDTH} AS BIGINT) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(s.score), 4) AS sum_score
FROM scored s JOIN documents d USING (doc_id)
GROUP BY 1""",
    "search_bm25_must": _scores_cte(sorted({*QUERY_MUST[0], *QUERY_MUST[1]}))
    + f"""
, req AS (
  SELECT doc_id FROM post
  WHERE term IN ({", ".join(f"'{t}'" for t in sorted(set(QUERY_MUST[1])))})
  GROUP BY doc_id
  HAVING count(DISTINCT term) = {len(set(QUERY_MUST[1]))}
)
SELECT doc_id, score, matched FROM scored
WHERE doc_id IN (SELECT doc_id FROM req)
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}""",
    "search_bm25_lang": f"""
WITH fdocs AS (SELECT * FROM documents WHERE lang = 'en'),
post AS (
  SELECT doc_id, term, CAST(count(*) AS INTEGER) AS tf
  FROM (SELECT doc_id, unnest({_T}) AS term FROM fdocs)
  GROUP BY doc_id, term
),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM fdocs) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM post) / (SELECT count(*) FROM fdocs) AS avgdl
),
q(term) AS (VALUES {_q_values(QUERY_MAIN)}),
scored AS (
  SELECT p.doc_id,
         round(sum(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1)) /
                 (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p
  JOIN q USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, score, matched FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}
""",
    "search_bm25_prefix": _scores_cte([], q_cte=_prefix_q_cte(QUERY_PREFIX))
    + f"\nSELECT doc_id, score, matched FROM scored ORDER BY score DESC, doc_id ASC LIMIT {TOPK}",
    "search_bm25_suffix": _scores_cte([], q_cte=_suffix_q_cte(QUERY_SUFFIX))
    + f"\nSELECT doc_id, score, matched FROM scored ORDER BY score DESC, doc_id ASC LIMIT {TOPK}",
    "search_suggest_next": f"""
WITH toks AS (SELECT {_T} AS t FROM documents),
big AS (
  SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
)
SELECT w2 AS term, CAST(count(*) AS BIGINT) AS n
FROM big WHERE w1 = '{SUGGEST_CONTEXT}'
GROUP BY w2 ORDER BY n DESC, term ASC LIMIT {SUGGEST_K}
""",
    "search_suggest": f"""
WITH {_POST},
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term)
SELECT term, df FROM dfq
WHERE starts_with(term, '{SUGGEST_PREFIX}')
ORDER BY df DESC, term ASC LIMIT {SUGGEST_K}
""",
    "search_bm25_topk_batch": _BATCH_SCORED_CTE + f"""
SELECT query_id, doc_id, score, matched, CAST(rk AS INTEGER) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS rk
  FROM scored
) WHERE rk <= {TOPK}
""",
    "search_rank_eval": _BATCH_SCORED_CTE + f""",
nt(query_id, n_terms) AS (VALUES {", ".join(
    f"('{qid}', {len(set(ts))})" for qid, ts in sorted(BATCH_QUERIES.items())
)}),
r AS (
  SELECT s.query_id, s.doc_id, s.score, s.matched, nt.n_terms,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.score DESC, s.doc_id ASC) AS rk,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.matched DESC, s.doc_id ASC) AS irk
  FROM scored s JOIN nt USING (query_id)
)
SELECT query_id,
       round(
         CAST(sum(CASE WHEN rk <= {TOPK} THEN
             CAST(floor(1e9 * (pow(2, matched) - 1) / log2(rk + 1)) AS BIGINT)
           ELSE 0 END) AS DOUBLE)
         / CAST(sum(CASE WHEN irk <= {TOPK} THEN
             CAST(floor(1e9 * (pow(2, matched) - 1) / log2(irk + 1)) AS BIGINT)
           ELSE 0 END) AS DOUBLE), 4) AS ndcg,
       CAST(coalesce(floor(1000000 / min(
         CASE WHEN rk <= {TOPK} AND matched = n_terms THEN rk END)), 0)
         AS BIGINT) AS mrr_e6,
       CAST(sum(CASE WHEN matched = n_terms THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full
FROM r GROUP BY query_id
""",
    "search_candidate_page": _scores_cte(QUERY_MAIN)
    + f"\nSELECT doc_id, matched FROM scored ORDER BY matched DESC, doc_id ASC LIMIT {CANDIDATE_K}",
    "search_candidate_page_2": _scores_cte(QUERY_MAIN)
    + f"\nSELECT doc_id, matched FROM scored ORDER BY matched DESC, doc_id ASC"
    + f" LIMIT {CANDIDATE_K} OFFSET {CANDIDATE_K}",
    "search_bm25_after": _scores_cte(QUERY_MAIN)
    + f""",
page1 AS (
  SELECT doc_id, score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {TOPK}
),
cursor AS (
  SELECT score AS c_score, doc_id AS c_doc FROM page1
  ORDER BY score ASC, doc_id DESC LIMIT 1
)
SELECT s.doc_id, s.score, s.matched
FROM scored s CROSS JOIN cursor c
WHERE s.score < c.c_score OR (s.score = c.c_score AND s.doc_id > c.c_doc)
ORDER BY s.score DESC, s.doc_id ASC LIMIT {TOPK}
""",
    "search_total_hits": f"""
WITH {_POST},
q(term) AS (VALUES {_q_values(QUERY_MAIN)})
SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_hits
FROM post JOIN q USING (term)
""",
    "search_refcompat_topk": f"""
WITH {_POST},
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
qraw(term) AS (VALUES {_q_values(QUERY_MAIN)}),
qidf AS (
  SELECT q.term,
         CASE WHEN v.df IS NOT NULL AND (n.n // (v.df + 1)) >= 1
              THEN log10(CAST(n.n // (v.df + 1) AS DOUBLE)) ELSE 0.0 END AS idf
  FROM qraw q LEFT JOIN dfq v USING (term) CROSS JOIN n
),
qmag AS (SELECT sqrt(sum(idf * idf)) AS qmag FROM qidf),
per_doc AS (
  SELECT p.doc_id,
         sum(p.tf * i.idf * i.idf) AS dot,
         sqrt(sum(pow(p.tf * i.idf, 2))) AS dmag,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p JOIN qidf i USING (term)
  GROUP BY p.doc_id
),
cand AS (
  SELECT d.doc_id, d.matched,
         CASE WHEN d.dmag > 0 AND m.qmag > 0
              THEN d.dot / (d.dmag * m.qmag) ELSE 0.0 END AS cosine
  FROM per_doc d CROSS JOIN qmag m
  ORDER BY d.matched DESC, d.doc_id ASC LIMIT {CANDIDATE_K}
),
mm AS (SELECT min(cosine) AS cmin, max(cosine) AS cmax FROM cand)
SELECT doc_id, round(cosine, 4) AS cosine,
       round(0.5 * CASE WHEN (cmax - cmin) > 0
                        THEN (cosine - cmin) / (cmax - cmin)
                        ELSE 0.0 END, 4) AS global_score,
       matched
FROM cand CROSS JOIN mm
ORDER BY global_score DESC, matched DESC, doc_id ASC
LIMIT {TOPK}
""",
    "search_bm25_conj": _scores_cte(QUERY_MAIN)
    + f"\nSELECT doc_id, score, matched FROM scored"
    + f" WHERE matched = {len(set(QUERY_MAIN))}"
    + f" ORDER BY score DESC, doc_id ASC LIMIT {TOPK}",
    "search_bm25_msm": _scores_cte(QUERY_MAIN)
    + f"\nSELECT doc_id, score, matched FROM scored"
    + f" WHERE matched >= {MSM_MIN}"
    + f" ORDER BY score DESC, doc_id ASC LIMIT {TOPK}",
    "search_bm25_not": _scores_cte(QUERY_MAIN)
    + f"""
SELECT doc_id, score, matched FROM scored
WHERE doc_id NOT IN (
  SELECT DISTINCT doc_id FROM post
  WHERE term IN ({", ".join(f"'{t}'" for t in sorted(set(QUERY_EXCLUDE)))})
)
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}""",
    "search_bm25_syn": f"""
WITH {_POST},
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM post) / (SELECT count(*) FROM documents) AS avgdl
),
q(term, gid) AS (VALUES {", ".join(
    f"('{t}', {gi})"
    for gi, g in enumerate(SYN_GROUPS) for t in sorted(set(g))
)}),
gtf AS (
  SELECT p.doc_id, q.gid, CAST(sum(p.tf) AS BIGINT) AS tf
  FROM post p JOIN q USING (term) GROUP BY p.doc_id, q.gid
),
gdf AS (SELECT gid, CAST(count(*) AS BIGINT) AS df FROM gtf GROUP BY gid),
scored AS (
  SELECT g.doc_id,
         round(sum(ln((stats.n - gdf.df + 0.5) / (gdf.df + 0.5) + 1.0)
               * (g.tf * ({BM25_K1} + 1)) /
                 (g.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM gtf g
  JOIN gdf USING (gid)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY g.doc_id
)
SELECT doc_id, score, matched FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}""",
    "search_bm25_explain": _scores_cte(QUERY_MAIN)
    + f""",
topk AS (
  SELECT doc_id, score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {TOPK}
)
SELECT p.doc_id, p.term, CAST(p.tf AS INTEGER) AS tf, dfq.df, dl.dl,
       round(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0), 4) AS idf,
       round((p.tf * ({BM25_K1} + 1)) /
             (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl)), 4) AS tfn,
       round(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
             * (p.tf * ({BM25_K1} + 1)) /
               (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl)), 4) AS partial,
       t.score
FROM post p
JOIN q USING (term)
JOIN topk t ON t.doc_id = p.doc_id
JOIN dfq ON dfq.term = p.term
JOIN dl ON dl.doc_id = p.doc_id
CROSS JOIN stats""",
    "search_mlt": f"""
WITH {_POST},
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(tf) AS DOUBLE) FROM post) / (SELECT count(*) FROM documents) AS avgdl
),
seed AS (SELECT min(doc_id) AS doc_id FROM documents),
seedw AS (
  SELECT p.term,
         round(p.tf * ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0), 6) AS w
  FROM post p
  JOIN seed s ON p.doc_id = s.doc_id
  JOIN dfq ON dfq.term = p.term
  CROSS JOIN stats
),
q AS (SELECT term FROM seedw ORDER BY w DESC, term ASC LIMIT {MLT_TOP_TERMS}),
scored AS (
  SELECT p.doc_id,
         round(sum(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1)) /
                 (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM post p
  JOIN q USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, score, matched FROM scored
WHERE doc_id <> (SELECT doc_id FROM seed)
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}
""",
    "search_bm25f_topk": f"""
WITH fpost AS (
  SELECT doc_id, term, CAST(sum(w) AS DOUBLE) AS wtf FROM (
    SELECT doc_id, unnest({_T}) AS term, {BM25F_W_CONTENT} AS w FROM documents
    UNION ALL
    SELECT doc_id, unnest({_duck_path_tokens('source')}) AS term,
           {BM25F_W_PATH} AS w
    FROM documents
  ) GROUP BY doc_id, term
),
wdl AS (
  SELECT doc_id,
         {BM25F_W_CONTENT} * len({_T})
         + {BM25F_W_PATH} * len({_duck_path_tokens('source')}) AS wdl
  FROM documents
),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT avg(wdl) FROM wdl) AS avg_wdl
),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM fpost GROUP BY term),
q(term) AS (VALUES {_q_values(QUERY_BM25F)}),
scored AS (
  SELECT p.doc_id,
         round(sum(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (p.wtf * ({BM25_K1} + 1)) /
                 (p.wtf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * wdl.wdl / stats.avg_wdl))), 4) AS score,
         CAST(count(*) AS INTEGER) AS matched
  FROM fpost p
  JOIN q USING (term)
  JOIN dfq ON dfq.term = p.term
  JOIN wdl ON wdl.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY p.doc_id
)
SELECT doc_id, score, matched FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {TOPK}
""",
    "search_block_layout": f"""
WITH {_POST},
blk AS (
  SELECT CAST({duck_term_hash31('term')} % {N_BUCKETS} AS INTEGER) AS bucket,
         term, doc_id, tf,
         CAST(floor((row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1)
                    / {BLOCK_SIZE}) AS INTEGER) AS block_id
  FROM post
)
SELECT bucket, term, block_id,
       CAST(count(*) AS INTEGER) AS n_postings,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc,
       max(tf) AS max_tf
FROM blk GROUP BY bucket, term, block_id
""",
}

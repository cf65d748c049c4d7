"""Distributed BPE subword training + encoding (Sennrich et al.,
ACL 2016 — the public byte-pair-encoding algorithm every modern LLM
tokenizer descends from).

Scale shape
-----------
The ONLY corpus-sized pass is the word-count aggregate (tokenize →
groupBy(term)), one shuffle. The vocabulary is bounded (~10⁶ rows at
100 TB; term cap 25 chars) regardless of corpus size, so training is a
vocab-sized problem, and there are two trainers:

* ``train_bpe_local`` (default for the gate surfaces): pulls the
  bounded word-count dict to the driver ONCE and runs the classic
  incremental-pair-count algorithm (Sennrich's subword-nmt shape) —
  exact sequential BPE, **one driver sync total** instead of one per
  merge (VERDICT r02 item 4: at a production 30k-merge vocab the
  per-merge argmax collect was 30k sequential Spark jobs). The pull is
  bounded: ``max_vocab`` caps it to the top-V words by count (standard
  practice — BPE is trained on the frequency dict, and a count cap
  changes only sub-threshold tail merges).
* ``train_bpe`` (distributed): keeps everything executor-side — one
  vocab-sized aggregate + a 1-row argmax collect per merge. The
  no-driver-memory fallback when the vocabulary itself is too large to
  pull (not the expected regime).

Encoding re-joins the trained ``term → subwords`` map back to the
postings-style exploded corpus (broadcast-sized right side).

Merge application is a pure array expression (no UDF): greedy
left-to-right pairing, with the ``l == r`` overlap case resolved by
run-parity — an occurrence at position i merges iff the number of
consecutive ``l`` symbols immediately before i is even, which is
exactly what the sequential greedy scan does. Words are ≤25 chars (the
frozen term cap), so the O(n²) per-word lambda is constant-bounded.

The DuckDB twin (``oracle_sql_bpe``) re-learns the merges from scratch
in SQL — materialized chain CTEs, one per iteration, each computing its
own pair counts and argmax — so a Spark-side training bug cannot hide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.ops.sqltwin import duck_tokens, tokens_col

N_MERGES = 6

MERGES_SCHEMA = "rank int, lhs string, rhs string, merged string, pair_count long"


def _merged_at(s: Column, i: Column, l: str, r: str) -> Column:
    """True iff the greedy scan merges pair (l, r) at 1-based position i
    of symbol array ``s``. F.get is 0-indexed and null-safe out of
    range, so boundary positions never raise."""
    ll, rr = F.lit(l), F.lit(r)

    def el(j):
        return F.get(s, j - 1)

    match = (i < F.size(s)) & (el(i) == ll) & (el(i + 1) == rr)
    if l != r:
        return match
    # run parity: count consecutive l's immediately before i
    last_non = F.coalesce(
        F.array_max(F.filter(F.sequence(F.lit(1), i - 1), lambda j: el(j) != ll)),
        F.lit(0),
    )
    parity_ok = F.when(i == 1, F.lit(True)).otherwise(
        ((i - 1 - last_non) % 2) == 0
    )
    return match & parity_ok


def apply_merge(s: Column, l: str, r: str) -> Column:
    """One BPE merge over a symbol array — pure array expression."""

    def el(j):
        return F.get(s, j - 1)

    out = F.transform(
        F.sequence(F.lit(1), F.size(s)),
        lambda i: F.when(_merged_at(s, i, l, r), F.lit(l + r))
        .when((i > 1) & _merged_at(s, i - 1, l, r), F.lit(None))
        .otherwise(el(i)),
    )
    return F.filter(out, lambda x: x.isNotNull())


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, c) — the single corpus-sized pass."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )


def train_bpe(
    spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merge list, final
    ``(term, c, syms)`` DataFrame for encoding).

    Per iteration: one vocab-sized aggregate + ONE 1-row driver sync
    (the argmax pair — BPE's argmax is inherently a global decision).
    The words table is cached; each merge rewrites ``syms`` with a pure
    array expression, and lineage is truncated periodically so the plan
    never deepens past a few merges.
    """
    words = word_counts(docs).withColumn(
        "syms",
        F.transform(
            F.sequence(F.lit(1), F.length("term")),
            lambda i: F.col("term").substr(i, F.lit(1)),
        ),
    )
    words = words.persist()
    merges: list[tuple[int, str, str, str, int]] = []
    for k in range(n_merges):
        pair = F.struct(
            F.get("syms", F.col("i") - 1).alias("l"),
            F.get("syms", F.col("i")).alias("r"),
        )
        best = (
            words.where(F.size("syms") >= 2)
            .select(
                "c",
                F.explode(
                    F.sequence(F.lit(1), F.size("syms") - 1)
                ).alias("i"),
                "syms",
            )
            .select("c", pair.alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((k, l, r, l + r, cnt))
        new_words = words.withColumn("syms", apply_merge(F.col("syms"), l, r))
        # localCheckpoint: keep the iteration plan shallow (same pattern
        # as operators/components.py); vocab-sized, so cheap
        new_words = new_words.localCheckpoint(eager=True)
        words.unpersist()
        words = new_words
    return merges, words


MAX_VOCAB_DEFAULT = 1_000_000  # driver-pull bound (VERDICT r3 item 5)


def train_bpe_local(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = N_MERGES,
    max_vocab: int | None = MAX_VOCAB_DEFAULT,
) -> tuple[list[tuple[int, str, str, str, int]], dict[str, list[str]]]:
    """Exact sequential BPE with ONE driver sync: collect the bounded
    word-count dict, then run the incremental-pair-count algorithm
    locally (only words containing the merged pair are touched per
    iteration — the subword-nmt shape). Returns (merges, term → syms).

    Bit-identical to ``train_bpe`` / the DuckDB chain-CTE twin for the
    same vocabulary: same greedy scan, same (count desc, l asc, r asc)
    tie-break. ``max_vocab`` (top-V words by count, ties by term) bounds
    the driver pull at open-vocabulary scale — ON by default at 10⁶ so
    an unbounded pull requires the explicit ``max_vocab=None`` opt-out
    (a pathological vocabulary must not OOM the driver by accident)."""
    wc = word_counts(docs)
    if max_vocab is not None:
        wc = wc.orderBy(F.desc("c"), F.asc("term")).limit(max_vocab)
    rows = wc.collect()  # bounded: vocab-sized (capped by max_vocab)

    words: list[tuple[list[str], int]] = [(list(r["term"]), int(r["c"])) for r in rows]
    from collections import Counter, defaultdict

    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[int]] = defaultdict(set)

    def _index(wi: int) -> None:
        syms, c = words[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            where[(a, b)].add(wi)

    def _deindex(wi: int) -> None:
        syms, c = words[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] -= c
            if pair_counts[(a, b)] <= 0:
                del pair_counts[(a, b)]
            where[(a, b)].discard(wi)

    for wi in range(len(words)):
        _index(wi)

    merges: list[tuple[int, str, str, str, int]] = []
    for k in range(n_merges):
        if not pair_counts:
            break
        (l, r), cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, l, r, l + r, int(cnt)))
        for wi in list(where[(l, r)]):
            _deindex(wi)
            syms, c = words[wi]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, c)
            _index(wi)
    return merges, {"".join(s): s for s, _ in words}


def bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = N_MERGES,
    max_vocab: int | None = MAX_VOCAB_DEFAULT,
) -> DataFrame:
    """Gate surface: the learned merge table (local exact trainer —
    one driver sync)."""
    merges, _ = train_bpe_local(spark, docs, n_merges, max_vocab)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_encode(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = N_MERGES,
    max_vocab: int | None = MAX_VOCAB_DEFAULT,
) -> DataFrame:
    """Per-doc subword stats after ``n_merges`` merges: (doc_id,
    n_tokens, n_subwords). The trained ``term → syms`` map is
    vocab-sized → broadcast join against the exploded corpus; at scale
    this is the tokenize-for-training pass of the pipeline."""
    _, vocab = train_bpe_local(spark, docs, n_merges, max_vocab)
    enc = spark.createDataFrame(
        [(t, len(s)) for t, s in vocab.items()], "term string, n_syms long"
    )
    toks = docs.select(
        "doc_id", F.explode(tokens_col("text")).alias("term")
    )
    return (
        toks.join(F.broadcast(enc), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("n_syms").cast("long").alias("n_subwords"),
        )
    )


# --------------------------------------------------------------- oracle SQL


def _merge_case_sql(i: str, syms: str, l: str, r: str) -> str:
    """merged_at(i) for the DuckDB twin — same greedy/run-parity rule,
    independently expressed. l/r are SQL column refs (strings)."""
    match = f"({i} < len({syms}) AND {syms}[{i}] = {l} AND {syms}[{i}+1] = {r})"
    parity = (
        f"({l} <> {r} OR {i} = 1 OR "
        f"(({i} - 1 - coalesce(list_max(list_filter(range(1, {i}), "
        f"j -> {syms}[j] <> {l})), 0)) % 2 = 0))"
    )
    return f"({match} AND {parity})"


def oracle_sql_bpe(n_merges: int = N_MERGES) -> dict[str, str]:
    """DuckDB twins for bpe_merges / bpe_encode: re-learn the merges in
    SQL via materialized chain CTEs (one pair-count + argmax + rewrite
    per iteration — non-materialized CTEs would re-inline the whole
    chain exponentially, same lesson as the HITS oracle)."""
    toks = duck_tokens("text")
    ctes = [
        f"""words0 AS MATERIALIZED (
  SELECT term, CAST(count(*) AS BIGINT) AS c,
         list_transform(range(1, length(term) + 1),
                        i -> substring(term, i, 1)) AS syms
  FROM (SELECT unnest({toks}) AS term FROM documents)
  GROUP BY term
)"""
    ]
    for k in range(n_merges):
        merged_i = _merge_case_sql("i", "syms", "b.l", "b.r")
        merged_im1 = _merge_case_sql("(i-1)", "syms", "b.l", "b.r")
        ctes.append(f"""pairs{k} AS MATERIALIZED (
  SELECT syms[u.i] AS l, syms[u.i + 1] AS r, sum(c) AS cnt
  FROM words{k}, unnest(range(1, len(syms))) AS u(i)
  WHERE len(syms) >= 2
  GROUP BY 1, 2
)""")
        ctes.append(f"""best{k} AS MATERIALIZED (
  SELECT {k} AS rank, l, r, l || r AS merged, CAST(cnt AS BIGINT) AS cnt
  FROM pairs{k} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
)""")
        # LEFT JOIN ON TRUE (not a cross join): when merges exhaust
        # before n_merges, best{k} is empty — Spark breaks its loop and
        # keeps the current vocab, so the twin must degrade to a no-op
        # rewrite (b.l IS NULL → every CASE arm is NULL-false → ELSE
        # syms[i]) instead of emptying the whole chain (ADVICE r02).
        ctes.append(f"""words{k + 1} AS MATERIALIZED (
  SELECT term, c,
    list_filter(
      list_transform(range(1, len(syms) + 1), i ->
        CASE WHEN b.l IS NOT NULL AND {merged_i} THEN b.l || b.r
             WHEN b.l IS NOT NULL AND i > 1 AND {merged_im1} THEN NULL
             ELSE syms[i] END),
      x -> x IS NOT NULL) AS syms
  FROM words{k} LEFT JOIN best{k} b ON TRUE
)""")
    chain = ",\n".join(ctes)
    merges_sql = (
        f"WITH {chain}\n"
        + "\nUNION ALL\n".join(
            f"SELECT CAST(rank AS INTEGER) AS rank, l AS lhs, r AS rhs, "
            f"merged, cnt AS pair_count FROM best{k}"
            for k in range(n_merges)
        )
    )
    encode_sql = f"""WITH {chain},
enc AS (SELECT term, CAST(len(syms) AS BIGINT) AS n_syms FROM words{n_merges}),
toks AS (SELECT doc_id, unnest({toks}) AS term FROM documents)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(e.n_syms) AS BIGINT) AS n_subwords
FROM toks t JOIN enc e USING (term)
GROUP BY t.doc_id
"""
    return {"bpe_merges": merges_sql, "bpe_encode": encode_sql}

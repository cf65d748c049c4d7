"""Text-analysis operators for a training-data pipeline.

All pure JVM-side column expressions over the ``documents`` table
(doc_id, text, lang, source, n_chars) — no Python UDFs, so the hot path
stays inside whole-stage codegen and scales linearly with input splits
(no shuffle at all: every op here is a narrow map).

Ops: token counting (whitespace + BPE-ish regex), quality scoring
(length/punct/stopword ratios), language-ID (stopword-list heuristic),
document fingerprinting (rolling polynomial hash), repetition signals
(duplicate-line fraction + top-bigram share, cf. the Gopher repetition
rules), and PII scrubbing (email/phone redaction, cf. C4-style
pretraining cleanup).

``repetition_stats`` is the one op here with a shuffle: per-(doc,
bigram) counts need a groupBy, but partial aggregation (map-side
combine) keeps the exchange proportional to *distinct* bigrams per doc,
not tokens — the scalable alternative to an O(tokens²) per-row array
self-scan, which would blow up on 10k-token source files.

Each Spark op has a DuckDB oracle twin in ``ORACLE_SQL`` (same math,
4-dp rounding on all floats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.sqltwin import (
    MERSENNE31,
    duck_term_hash31,
    duck_tokens,
    term_hash31,
    tokens_col,
)

BPE_RE = r"\w+|[^\w\s]"  # BPE-ish pre-tokenizer: word pieces + punct singles

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "en", "que", "un", "es"],
    "fr": ["le", "la", "de", "et", "en", "que", "un", "est"],
    "de": ["der", "die", "das", "und", "in", "zu", "ist", "ein"],
}
LANGS = sorted(STOPWORDS)  # deterministic tie-break order: de,en,es,fr


def _stop_ratio(toks: Column, words: list[str]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counts: frozen-tokenizer terms, whitespace tokens,
    BPE-ish regex tokens, distinct terms, mean term length."""
    toks = tokens_col("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_terms"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_terms"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, t: acc + F.length(t)).cast("double")
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mean_term_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality in micro-points [0, 1e6]: blend of length band,
    low punctuation, and English-stopword presence — the usual
    pretraining-filter shape (cf. C4/Gopher rules). All arithmetic is
    INTEGER fixed-point (×10^6, truncating division) so the score is
    bit-identical across engines — float rounding of ratio blends is
    exactly the kind of tie (0.86875 → 4dp) that diverges between
    round-half modes."""
    toks = tokens_col("text")
    sized = docs.select(
        "doc_id",
        F.size(toks).alias("n_terms"),
        F.length("text").alias("n_chars"),
        (F.length("text") - F.length(F.regexp_replace("text", r"[^\w\s]", "")))
        .alias("n_punct"),
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"]))).alias("n_stop"),
    )
    e6 = 1_000_000
    punct_e6 = F.when(
        F.col("n_chars") > 0,
        F.expr(f"({e6}::bigint * n_punct) div n_chars"),
    ).otherwise(F.lit(0).cast("long"))
    stop_e6 = F.when(
        F.col("n_terms") > 0,
        F.expr(f"({e6}::bigint * n_stop) div n_terms"),
    ).otherwise(F.lit(0).cast("long"))
    len_e6 = (
        F.when(F.col("n_terms").between(20, 1000), F.lit(400_000))
        .when(F.col("n_terms") > 0, F.lit(200_000))
        .otherwise(F.lit(0))
    ).cast("long")
    quality_e6 = (
        len_e6
        + (F.lit(300_000).cast("long")
           - F.when(F.col("n_chars") > 0,
                    F.expr("(300000::bigint * n_punct) div n_chars"))
           .otherwise(F.lit(0).cast("long")))
        + F.least(F.lit(300_000).cast("long"),
                  F.when(F.col("n_terms") > 0,
                         F.expr("(1500000::bigint * n_stop) div n_terms"))
                  .otherwise(F.lit(0).cast("long")))
    )
    return sized.select(
        "doc_id",
        "n_terms",
        punct_e6.alias("punct_ratio_e6"),
        stop_e6.alias("stopword_ratio_e6"),
        quality_e6.alias("quality_e6"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-list language-ID: per-language hit ratio, argmax with
    alphabetical tie-break; abstains to 'und' when all ratios are 0."""
    toks = tokens_col("text")
    out = docs.select("doc_id", "lang", toks.alias("toks"))
    for lg in LANGS:
        out = out.withColumn(f"r_{lg}", F.round(_stop_ratio(F.col("toks"), STOPWORDS[lg]), 4))
    best = F.greatest(*[F.col(f"r_{lg}") for lg in LANGS])
    pred = F.lit("und")
    for lg in reversed(LANGS):  # earlier alphabetical wins ties
        pred = F.when((best > 0) & (F.col(f"r_{lg}") == best), F.lit(lg)).otherwise(pred)
    return out.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        *[F.col(f"r_{lg}") for lg in LANGS],
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: rolling polynomial hash
    h = (31*h + term_hash31(t)) mod 2^31-1 over the token stream.
    Integer-exact on both engines; detects exact token-stream dups
    (whitespace/punct-insensitive, unlike raw-text md5)."""
    toks = tokens_col("text")
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + term_hash31(t)) % F.lit(MERSENNE31),
    )
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.md5("text").alias("text_md5"),
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals, integer fixed-point (×10^6):
    duplicate-line fraction and the token share of the single most
    frequent bigram. High values flag boilerplate/templated docs that
    pretraining filters drop (Rae et al. 2021, §A.1.1).

    Bigram counting goes through explode → groupBy so Spark's partial
    aggregation bounds the shuffle by distinct bigrams; docs with <2
    tokens join back as NULL → 0."""
    toks = tokens_col("text")
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    staged = docs.select("doc_id", toks.alias("toks"),
                         F.size(lines).alias("n_lines"),
                         F.size(F.array_distinct(lines)).alias("n_distinct_lines"))
    staged = staged.withColumn(
        "bigrams",
        F.when(
            F.size("toks") >= 2,
            F.expr("transform(sequence(0, size(toks) - 2), "
                   "i -> concat(toks[i], ' ', toks[i+1]))"),
        ).otherwise(F.array().cast("array<string>")),
    )
    tops = (
        staged.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg").agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_bg"), F.sum("cnt").alias("n_bg"))
    )
    return (
        staged.join(tops, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("int").alias("n_lines"),
            F.when(
                F.col("n_lines") > 0,
                F.expr("((n_lines - n_distinct_lines)::bigint * 1000000) div n_lines"),
            ).otherwise(F.lit(0).cast("long")).alias("dup_line_frac_e6"),
            F.when(
                F.col("n_bg") > 0,
                F.expr("(top_bg::bigint * 1000000) div n_bg"),
            ).otherwise(F.lit(0).cast("long")).alias("top_bigram_share_e6"),
        )
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """C4-style PII cleanup: redact email addresses then phone-shaped
    digit runs (≥8 chars of digits/space/dash/parens), count both, and
    emit the scrubbed text's md5 + length so downstream stages (and the
    oracle) can verify the redaction without shipping the text.

    Pure JVM expressions; both regexes are dialect-portable (Java ⇄ RE2
    agree on leftmost-first greedy here). Phones are counted on the
    email-scrubbed text so the two redactions compose deterministically."""
    no_email = F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0)))
        .cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), F.lit(0)))
        .cast("int").alias("n_phones"),
        F.length(scrubbed).cast("int").alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# --------------------------------------------------------------- oracle SQL

_T = duck_tokens("text")
_STOP = {lg: "[" + ", ".join(f"'{w}'" for w in ws) + "]" for lg, ws in STOPWORDS.items()}


def unigram_loglik(docs: DataFrame) -> DataFrame:
    """Per-doc average token log-likelihood under the corpus unigram
    LM — the CCNet-style fluency/quality signal (docs scoring far from
    the corpus mode are boilerplate or noise). Two aggregations:
    corpus term frequencies (one term-keyed shuffle, the same key
    family as the postings build so at scale it co-partitions with the
    index pipeline), then a per-doc weighted sum over the postings.

    Output (doc_id, dl, avg_ll): avg_ll = Σ_t tf_t·ln(ctf_t/T) / dl
    rounded 4dp — identical float path on both engines."""
    post = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    ctf = post.groupBy("term").agg(F.sum("tf").cast("long").alias("ctf"))
    total = ctf.agg(F.sum("ctf").cast("double").alias("t_tokens"))
    per = post.join(ctf, "term").crossJoin(F.broadcast(total))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("dl"),
            F.round(
                F.sum(F.col("tf") * F.log(F.col("ctf") / F.col("t_tokens")))
                / F.sum("tf"),
                4,
            ).alias("avg_ll"),
        )
    )


def bigram_loglik(docs: DataFrame) -> DataFrame:
    """Per-doc average bigram log-likelihood under a Laplace-smoothed
    corpus bigram LM — the order-sensitive upgrade of
    :func:`unigram_loglik` (CCNet trains a KenLM n-gram model for the
    same purpose; the add-one-smoothed bigram flavor keeps the whole
    train+score loop inside two DataFrame aggregations, no model
    artifact). Word-salad and shuffled boilerplate score near the
    smoothing floor even when their unigram profile looks fluent.

    P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V), V = corpus vocabulary
    size; per doc: avg_ll = Σ ln P over its token bigrams / #bigrams,
    ppl = exp(−avg_ll). Docs with < 2 tokens have no bigrams and are
    omitted (the caller's length filter owns them).

    Plan shape: bigrams come from one array expression over the
    projected token column (zip of the array with its own shift — no
    posexplode self-join); the count tables are (w1,w2)- and w1-keyed
    aggregations with map-side partial combine, the same key-skew
    family as the postings build; V is a 1-row broadcast. Floats
    follow the cross-engine protocol (identical integer-derived
    doubles into ln, final round 4dp — cf. unigram_loglik)."""
    toks = docs.select("doc_id", tokens_col("text").alias("toks"))
    vocab = (
        toks.select(F.explode("toks").alias("term"))
        .agg(F.countDistinct("term").cast("long").alias("v"))
    )
    big = (
        toks.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    occ = big.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("long").alias("n")
    ).persist()  # reused 2× (count tables + the score join): persist so
    # the tokenize + bigram explode pass runs once, not three times
    cbg = occ.groupBy("w1", "w2").agg(F.sum("n").cast("long").alias("c2"))
    ctx = cbg.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    per = (
        occ.join(cbg, ["w1", "w2"]).join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "ll",
            F.col("n")
            * F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))),
        )
    )
    return per.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.round(F.sum("ll") / F.sum("n"), 4).alias("avg_ll"),
        F.round(F.exp(-F.sum("ll") / F.sum("n")), 4).alias("ppl"),
    )


KW_TOP_K = 5  # keywords reported per document


def keywords_tfidf(docs: DataFrame, k: int = KW_TOP_K) -> DataFrame:
    """Per-doc top-k keywords by tf·idf (smoothed idf = ln((N+1)/(df+1)),
    always ≥ 0) — the keyword-extraction feature a training-data
    pipeline attaches to each document, and the batch generalization of
    the MoreLikeThis seed-term derivation (search_sql.more_like_this
    ranks ONE doc's terms the same way).

    Plan shape: the postings aggregate is the same term-keyed shuffle
    the index build uses; df rides a second aggregate of that result
    (vocab-sized); the per-doc top-k is a doc_id-partitioned window —
    at scale the row_number cutoff pushes below the exchange
    (WindowGroupLimit), so only k rows per doc reach the final stage.
    Ranking is on the 6-dp-rounded weight with a term tie-break, the
    established cross-engine float protocol (cf. more_like_this)."""
    post = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dft = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n"))
    from pyspark.sql.window import Window

    scored = (
        post.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "w",
            F.round(F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= k)
        .select(
            "doc_id",
            F.col("rk").cast("int").alias("rk"),
            "term",
            F.round("w", 4).alias("score"),
        )
    )


PMI_TOP_V = 30   # co-occurrence vocabulary: top-V terms by df
PMI_TOP_K = 50   # reported pairs


def cooccur_pmi(docs: DataFrame, top_v: int = PMI_TOP_V,
                k: int = PMI_TOP_K) -> DataFrame:
    """Term co-occurrence PMI over the top-``top_v``
    document-frequency vocabulary — the classic word-association /
    collocation signal (Church & Hanks, CL 1990), used in pipelines for
    collocation mining and corpus drift diagnostics.
    ``pmi(a,b) = ln(N·c_ab / (df_a·df_b))`` at document granularity:
    ``c_ab`` = #docs containing both terms.

    Scale shape: the vocabulary cut makes the quadratic part row-local
    and bounded — the V-row vocab broadcasts, each doc keeps ≤V
    distinct terms, and pairs are generated from a per-doc sorted array
    (``transform``+``slice`` comprehension, no corpus self-join), so
    the exchange into the pair groupBy carries ≤ V(V−1)/2 rows per doc
    with map-side partial aggregation. All counts are document counts
    (exact integers on both engines); the one float is the final ln.
    """
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_col("text"))).alias("term"),
    )
    dfq = dt.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    vocab = dfq.orderBy(F.desc("df"), F.asc("term")).limit(top_v)
    per_doc = (
        dt.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("term")).alias("ts"))
    )
    pairs = per_doc.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (a, i) -> "
                "transform(slice(ts, i + 2, size(ts)), b -> struct(a, b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
    cab = pairs.groupBy("term_a", "term_b").agg(
        F.count("*").cast("long").alias("c_ab")
    )
    n = docs.agg(F.count("*").cast("double").alias("n"))
    dfa = vocab.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    dfb = vocab.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return (
        cab.join(F.broadcast(dfa), "term_a")
        .join(F.broadcast(dfb), "term_b")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "pmi",
            F.round(
                F.log(F.col("n") * F.col("c_ab") / (F.col("df_a") * F.col("df_b"))),
                4,
            ),
        )
        .orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
        .limit(k)
        .select("term_a", "term_b", "c_ab", "df_a", "df_b", "pmi")
    )


ZIPF_TOP = 500  # rank-frequency ranks entering the regression


def zipf_slope(docs: DataFrame, top: int = ZIPF_TOP) -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency curve: OLS slope
    of ln(df) on ln(rank) for the ``top`` most-frequent terms — the
    one-number corpus-health diagnostic (natural text sits near −1;
    boilerplate-heavy or templated corpora flatten, synthetic noise
    steepens). Cf. the Gopher/CCNet corpus-audit statistics.

    Output one row (n_terms, slope, intercept), 4dp. Determinism: the
    rank order is (df desc, term asc) — fully tied down; sums are the
    closed-form OLS integer-count formulation over ``top`` doubles
    (house 4dp float protocol, cf. :func:`unigram_loglik`).

    Scale shape: one term-keyed aggregate (the df table every other op
    shares), a ``top``-row TakeOrderedAndProject, and a single-row
    aggregate over those ``top`` rows — the regression itself never
    touches the corpus."""
    dft = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .distinct()
        .groupBy("term").agg(F.count("*").cast("long").alias("df"))
    )
    ranked = (
        dft.orderBy(F.desc("df"), F.asc("term"))
        .limit(top)
        .withColumn(
            "r",
            F.row_number().over(
                Window.orderBy(F.desc("df"), F.asc("term"))
            ),
        )
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("df").cast("double"))
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"),
    )
    slope = (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n_terms")
    return agg.select(
        "n_terms",
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    )


_ZIPF_SQL = f"""
WITH dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, unnest({_T}) AS term FROM documents)
  GROUP BY term
),
ranked AS (
  SELECT df, row_number() OVER (ORDER BY df DESC, term ASC) AS r
  FROM dft ORDER BY df DESC, term ASC LIMIT {ZIPF_TOP}
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         sum(ln(CAST(r AS DOUBLE))) AS sx,
         sum(ln(CAST(df AS DOUBLE))) AS sy,
         sum(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx,
         sum(ln(CAST(r AS DOUBLE)) * ln(CAST(df AS DOUBLE))) AS sxy
  FROM ranked
)
SELECT n_terms,
       round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 4) AS slope,
       round((sy - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) * sx)
             / n_terms, 4) AS intercept
FROM s
"""


_UNIGRAM_SQL = f"""
WITH post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_T}) AS term FROM documents)
  GROUP BY doc_id, term
),
ctf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM post GROUP BY term),
tot AS (SELECT CAST(sum(ctf) AS DOUBLE) AS t_tokens FROM ctf)
SELECT p.doc_id,
       CAST(sum(p.tf) AS BIGINT) AS dl,
       round(sum(p.tf * ln(ctf.ctf / tot.t_tokens)) / sum(p.tf), 4) AS avg_ll
FROM post p JOIN ctf USING (term) CROSS JOIN tot
GROUP BY p.doc_id
"""


def _duck_stop_ratio(toks: str, lst: str) -> str:
    return (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_filter({toks}, t -> list_contains({lst}, t))) AS DOUBLE)"
        f" / len({toks}) ELSE 0.0 END)"
    )


_COOCCUR_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest({_T}) AS term FROM documents)
),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY term),
vocab AS (SELECT term, df FROM dfq ORDER BY df DESC, term ASC LIMIT {PMI_TOP_V}),
dv AS (SELECT dt.doc_id, dt.term FROM dt JOIN vocab USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b
  FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.term < b.term
),
cab AS (
  SELECT term_a, term_b, CAST(count(*) AS BIGINT) AS c_ab
  FROM pairs GROUP BY term_a, term_b
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT c.term_a, c.term_b, c.c_ab, va.df AS df_a, vb.df AS df_b,
       round(ln(n.n * c.c_ab / (va.df * vb.df)), 4) AS pmi
FROM cab c
JOIN vocab va ON va.term = c.term_a
JOIN vocab vb ON vb.term = c.term_b
CROSS JOIN n
ORDER BY pmi DESC, term_a ASC, term_b ASC
LIMIT {PMI_TOP_K}
"""


_BIGRAM_SQL = f"""
WITH toks AS (SELECT doc_id, {_T} AS t FROM documents),
vocab AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v
  FROM (SELECT unnest(t) AS term FROM toks)
),
big AS (
  SELECT doc_id,
         unnest(t[1:len(t) - 1]) AS w1,
         unnest(t[2:len(t)]) AS w2
  FROM toks WHERE len(t) >= 2
),
occ AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n
  FROM big GROUP BY doc_id, w1, w2
),
cbg AS (SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c2 FROM occ GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM cbg GROUP BY w1)
SELECT o.doc_id,
       CAST(sum(o.n) AS BIGINT) AS n_bigrams,
       round(sum(o.n * ln((cbg.c2 + 1.0) / (ctx.c1 + vocab.v))) / sum(o.n), 4)
         AS avg_ll,
       round(exp(-sum(o.n * ln((cbg.c2 + 1.0) / (ctx.c1 + vocab.v))) / sum(o.n)), 4)
         AS ppl
FROM occ o
JOIN cbg USING (w1, w2)
JOIN ctx USING (w1)
CROSS JOIN vocab
GROUP BY o.doc_id
"""


ORACLE_SQL = {
    "text_zipf_slope": _ZIPF_SQL,
    "text_unigram_ll": _UNIGRAM_SQL,
    "text_bigram_ll": _BIGRAM_SQL,
    "text_keywords": f"""
WITH post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_T}) AS term FROM documents)
  GROUP BY doc_id, term
), dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
s AS (
  SELECT p.doc_id, p.term,
         round(p.tf * ln((nn.n + 1.0) / (d.df + 1.0)), 6) AS w
  FROM post p JOIN dft d ON p.term = d.term, nn
)
SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, round(w, 4) AS score
FROM (
  SELECT doc_id, term, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term ASC) AS rk
  FROM s
)
WHERE rk <= {KW_TOP_K}
""",
    "text_cooccur_pmi": _COOCCUR_SQL,
    "text_token_stats": f"""
WITH d AS (SELECT doc_id, text, {_T} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_terms,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe_tokens,
       len(list_distinct(toks)) AS n_distinct_terms,
       round(CASE WHEN len(toks) > 0 THEN
         CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks)
         ELSE 0.0 END, 4) AS mean_term_len
FROM d
""",
    "text_quality_score": f"""
WITH d AS (
  SELECT doc_id, {_T} AS toks,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM documents
), r AS (
  SELECT doc_id, len(toks) AS n_terms, n_chars, n_punct,
         len(list_filter(toks, t -> list_contains({_STOP['en']}, t))) AS n_stop
  FROM d
)
SELECT doc_id, n_terms,
       CASE WHEN n_chars > 0 THEN (1000000::BIGINT * n_punct) // n_chars ELSE 0 END AS punct_ratio_e6,
       CASE WHEN n_terms > 0 THEN (1000000::BIGINT * n_stop) // n_terms ELSE 0 END AS stopword_ratio_e6,
       (CASE WHEN n_terms BETWEEN 20 AND 1000 THEN 400000
             WHEN n_terms > 0 THEN 200000 ELSE 0 END)::BIGINT
       + (300000 - CASE WHEN n_chars > 0 THEN (300000::BIGINT * n_punct) // n_chars ELSE 0 END)
       + least(300000::BIGINT,
               CASE WHEN n_terms > 0 THEN (1500000::BIGINT * n_stop) // n_terms ELSE 0 END)
       AS quality_e6
FROM r
""",
    "text_lang_id": f"""
WITH d AS (SELECT doc_id, lang, {_T} AS toks FROM documents),
r AS (
  SELECT doc_id, lang,
         {', '.join(f"round({_duck_stop_ratio('toks', _STOP[lg])}, 4) AS r_{lg}" for lg in LANGS)}
  FROM d
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN greatest({', '.join('r_' + lg for lg in LANGS)}) = 0 THEN 'und'
            {' '.join(f"WHEN r_{lg} = greatest({', '.join('r_' + l2 for l2 in LANGS)}) THEN '{lg}'" for lg in LANGS)}
            ELSE 'und' END AS pred_lang,
       {', '.join('r_' + lg for lg in LANGS)}
FROM r
""",
    # DuckDB lists are 1-based: range(1, len) + toks[i]/toks[i+1] mirrors
    # Spark's 0-based sequence(0, size-2) exactly.
    "text_repetition": f"""
WITH d AS (
  SELECT doc_id, {_T} AS toks,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> l <> '') AS lines
  FROM documents
), b AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM d WHERE len(toks) >= 2
), c AS (
  SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY doc_id, bg
), t AS (
  SELECT doc_id, max(cnt) AS top_bg, sum(cnt) AS n_bg FROM c GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(lines) AS INTEGER) AS n_lines,
       CASE WHEN len(lines) > 0 THEN
         ((len(lines) - len(list_distinct(lines)))::BIGINT * 1000000) // len(lines)
       ELSE 0 END AS dup_line_frac_e6,
       -- n_bg is sum(BIGINT) = HUGEINT in DuckDB; without the outer CAST
       -- the // result is HUGEINT too, which the driver hashes as float64
       CAST(CASE WHEN t.n_bg > 0 THEN (t.top_bg::BIGINT * 1000000) // t.n_bg
       ELSE 0 END AS BIGINT) AS top_bigram_share_e6
FROM d LEFT JOIN t ON d.doc_id = t.doc_id
""",
    "text_pii_scrub": f"""
WITH s AS (
  SELECT doc_id, text,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS no_email
  FROM documents
), r AS (
  SELECT doc_id, text, no_email,
         regexp_replace(no_email, '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed
  FROM s
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(no_email, '{PHONE_RE}')) AS INTEGER) AS n_phones,
       CAST(length(scrubbed) AS INTEGER) AS scrubbed_len,
       md5(scrubbed) AS scrubbed_md5
FROM r
""",
    "text_fingerprint": f"""
WITH d AS (SELECT doc_id, text, {_T} AS toks FROM documents)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                                list_transform(toks, t -> {duck_term_hash31('t')})),
                   (acc, h) -> (acc * 31 + h) % {MERSENNE31}) AS fingerprint,
       md5(text) AS text_md5
FROM d
""",
}

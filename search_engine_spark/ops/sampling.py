"""Deterministic sampling for training-data curation over ``documents``.

A 100 TB pipeline rarely trains on everything it crawls: it Bernoulli-
samples for ablations, draws fixed per-group quotas for eval sets, and
resamples sources to a target language/domain *mixture*. All three ops
here are deterministic functions of (doc_id, seed) — no RNG state, so
reruns, resumed jobs and the DuckDB oracle all agree bit-for-bit — and
all selection decisions ride on the portable 31-bit md5 hash from
ops/sqltwin.py reduced to a millionth-scale bucket.

Reference provenance: the reference engine has no sampling surface (its
corpus is whatever the spider fetched); this module is part of the
training-data-pipeline layer the brief adds on top of SURVEY §2.

Scale shape (what survives 100×):
- ``bernoulli_sample`` and ``mixture_sample`` are pure scan-side
  filters — a deterministic hash threshold per row, NO shuffle, no
  sort; the mixture variant adds one tiny counts aggregate broadcast
  back. This is the only sane shape at 10^12 rows.
- ``stratified_quota`` / ``stratified_split`` need an exact global
  rank within each stratum. A `row_number() OVER (PARTITION BY lang)`
  sorts each stratum in ONE task — at 100 TB with a dominant lang that
  single task is the job (VERDICT r02 item 5). Both ops instead rank
  via the two-phase distributed scan from ops/packing.py: range-
  partition on (lang, bucket, doc_id), rank locally per (lang,
  partition), then add broadcast per-(lang, partition) base offsets —
  the per-task sort is bounded by partition size, never stratum size,
  and the result is bit-identical to the single-window semantics the
  DuckDB twins express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.sqltwin import MERSENNE31, duck_term_hash31, term_hash31

STRAT_PARTITIONS = 32  # ordered ranges for the two-phase rank; raise at scale

SEED = "seed42"          # sampling namespace; change → independent sample
BUCKETS_E6 = 1_000_000   # hash buckets; rate_e6 is a count of kept buckets
RATE_E6 = 250_000        # bernoulli gate keeps ~25%
QUOTA = 40               # stratified gate: docs per lang
# mixture gate: resample langs to these relative weights, total budget
# ~40% of the corpus. Langs missing from the map are dropped (the
# "filter out the tail" posture of a training mix).
MIXTURE_WEIGHTS = {"en": 0.5, "es": 0.3, "de": 0.2}
MIXTURE_BUDGET_PCT = 40


def sample_bucket(doc_id_col) -> F.Column:
    """Deterministic per-doc bucket in [0, 1e6): portable md5-31bit hash
    of ``doc_id:SEED``, folded to a millionth. Namespacing by SEED makes
    independent samples (different seed → uncorrelated buckets)."""
    key = F.concat(doc_id_col.cast("string"), F.lit(":" + SEED))
    return (term_hash31(key) % BUCKETS_E6).cast("int")


def _duck_bucket(doc_id_sql: str = "doc_id") -> str:
    key = f"concat(CAST({doc_id_sql} AS VARCHAR), ':{SEED}')"
    return f"CAST({duck_term_hash31(key)} % {BUCKETS_E6} AS INTEGER)"


def bernoulli_sample(docs: DataFrame, rate_e6: int = RATE_E6) -> DataFrame:
    """Keep a deterministic ~``rate_e6``/1e6 fraction of docs.

    One scan, zero shuffles: the hash threshold is a plain filter
    predicate, so Catalyst keeps column pruning + whole-stage codegen
    and the sample of a 10^12-row table costs exactly one pass (less,
    if the filter lands after partition pruning). The kept set is a
    fixed function of doc_id — growing the corpus never unsamples an
    old doc, which is what makes downstream caches/dedup stable.
    """
    return (
        docs.select("doc_id", "lang", sample_bucket(F.col("doc_id")).alias("bucket"))
        .where(F.col("bucket") < rate_e6)
    )


WEIGHTED_K = 50          # weighted-sample gate size


def weighted_sample(docs: DataFrame, k: int = WEIGHTED_K,
                    weight_col: str = "n_chars") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    IPL 2006 — re-derived): each doc draws a deterministic uniform
    u ∈ (0,1] from its hash bucket and takes key = ln(u)/w; the top-k
    docs by key form an exact weighted sample — inclusion probability
    proportional to weight, no replacement, no sequential pass. The
    training-data use: quality- or length-weighted corpus subsetting
    where plain Bernoulli over/under-samples the tails.

    Deterministic end-to-end (the hash IS the randomness, namespaced
    by SEED like every sampling op here), so reruns and the DuckDB
    twin agree exactly. One scan + TakeOrderedAndProject — the sample
    of a 10^12-row table is one pass, no shuffle beyond the top-k.
    Weights must be ≥ 0; rows with w = 0 use w+1's floor of 1 via the
    +1 shift (so empty docs are merely unlikely, not divide-by-zero).
    Key rounded 6dp with a doc_id tie-break — the cross-engine float
    protocol."""
    u = (sample_bucket(F.col("doc_id")) + F.lit(1).cast("double")) / F.lit(
        float(BUCKETS_E6 + 1)
    )
    w = (F.col(weight_col).cast("double") + F.lit(1.0))
    key = F.round(F.log(u) / w, 6)
    return (
        docs.select(
            "doc_id", "lang",
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(k)
    )


def _stratified_rank(docs: DataFrame, n_parts: int = STRAT_PARTITIONS) -> DataFrame:
    """(doc_id, lang, bucket, rk, n): exact global rank within each
    lang by (bucket, doc_id), and the stratum size — computed with the
    two-phase distributed scan so a dominant stratum never serializes
    into one task:

      1. range-repartition on the composite key (lang, bucket, doc_id):
         within a lang, partition id increases with (bucket, doc_id);
      2. local rank per (lang, partition) — parallel, bounded sorts;
      3. per-(lang, partition) counts (≤ n_parts·n_langs rows) get an
         exclusive prefix sum per lang and come back as broadcast base
         offsets; stratum totals ride the same tiny table.
    """
    tagged = docs.select(
        "doc_id", "lang", sample_bucket(F.col("doc_id")).alias("bucket")
    )
    parts = (
        tagged.repartitionByRange(n_parts, "lang", "bucket", "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    w = Window.partitionBy("lang", "pid").orderBy(F.asc("bucket"), F.asc("doc_id"))
    local = parts.withColumn("local_rk", F.row_number().over(w).cast("long"))
    counts = parts.groupBy("lang", "pid").agg(F.count("*").alias("cnt"))
    w_excl = (
        Window.partitionBy("lang").orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = counts.select(
        "lang",
        "pid",
        F.coalesce(F.sum("cnt").over(w_excl), F.lit(0)).alias("base"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n"),
    )
    return local.join(F.broadcast(bases), ["lang", "pid"]).select(
        "doc_id", "lang", "bucket",
        (F.col("base") + F.col("local_rk")).alias("rk"),
        "n",
    )


def stratified_quota(docs: DataFrame, quota: int = QUOTA) -> DataFrame:
    """Exactly ``min(quota, |group|)`` docs per lang, chosen in hash
    order — the deterministic eval-set draw.

    Plan: two-phase per-stratum rank (``_stratified_rank``) — the
    per-task sort is bounded by partition size even when one lang holds
    half the corpus. The quota filter is applied to the distributed
    rank; survivors are ≤ quota·n_langs rows.
    """
    return (
        _stratified_rank(docs)
        .where(F.col("rk") <= quota)
        .select("doc_id", "lang", F.col("rk").cast("int").alias("rk"))
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    budget_pct: int = MIXTURE_BUDGET_PCT,
) -> DataFrame:
    """Resample the corpus toward a target lang *mixture* — the
    training-mix op (e.g. "40% of the corpus, split 50/30/20 over
    en/es/de").

    Per-lang keep rate = min(1, target_share·budget / group_count),
    materialized as an integer hash threshold, so selection stays a
    scan-side filter: the only aggregation is the per-lang count
    (grouped on a low-cardinality key, partial-agg absorbed map-side)
    whose result is broadcast back. Counts are hash-binomial around the
    target (±√n), the standard trade for a shuffle-free mix at 10^12
    rows; ``stratified_quota`` is the exact-count alternative.

    Integer math everywhere (rates in e6 fixed point, floor division)
    so the DuckDB twin reproduces thresholds bit-for-bit.
    """
    weights = MIXTURE_WEIGHTS if weights is None else weights
    total_w = sum(weights.values())
    tagged = docs.select(
        "doc_id", "lang", sample_bucket(F.col("doc_id")).alias("bucket")
    )
    counts = tagged.groupBy("lang").agg(F.count("*").alias("n_lang"))
    n_total = tagged.agg(F.count("*").alias("n_total"))
    # weight_e6 per lang as a literal lookup (tiny, driver-side constants)
    wmap = F.create_map(
        *[x for lang, wt in sorted(weights.items())
          for x in (F.lit(lang), F.lit(int(round(wt / total_w * 1_000_000))))]
    )
    rates = (
        counts.crossJoin(F.broadcast(n_total))
        .withColumn("share_e6", wmap[F.col("lang")])
        .where(F.col("share_e6").isNotNull())
        # target docs for this lang: share · (budget% of corpus)
        .withColumn(
            "target",
            (F.col("share_e6") * F.col("n_total") * budget_pct)
            / F.lit(100) / F.lit(1_000_000),
        )
        .withColumn(
            "rate_e6",
            F.least(
                F.lit(BUCKETS_E6),
                F.floor(F.col("target") * BUCKETS_E6 / F.col("n_lang")).cast("int"),
            ),
        )
        .select("lang", "rate_e6")
    )
    return (
        tagged.join(F.broadcast(rates), "lang")
        .where(F.col("bucket") < F.col("rate_e6"))
        .select("doc_id", "lang", "bucket", "rate_e6")
    )


TEMP_ALPHA_E2 = 30   # α = 0.30 — mT5's temperature exponent (T = 1/α)
TEMP_BUDGET_PCT = 40


def temperature_sample(
    docs: DataFrame,
    alpha_e2: int = TEMP_ALPHA_E2,
    budget_pct: int = TEMP_BUDGET_PCT,
) -> DataFrame:
    """Temperature-scaled language mixture (mT5 / UNIMAX multilingual
    training mix): per-lang target share ∝ n_lang^α with α < 1, so
    low-resource languages are up-weighted relative to their corpus
    share — the standard fix for English swamping a multilingual run
    (Xue et al., mT5, NAACL'21 — re-derived from the published
    sampling rule). α=1 degrades to proportional sampling; α=0 to
    uniform-over-langs.

    The DATA-DERIVED twin of :func:`mixture_sample` (whose shares are
    caller-fixed literals): shares come from the observed per-lang
    counts through one pow + one e6 round — the only float step; the
    rate arithmetic after it is pure int64 (floor divisions), so both
    engines derive bit-identical thresholds. Scale note: the
    share·n_total·pct product is int64-safe to ~10^10 docs; beyond
    that reorder into decimal(38) on both engines — a types-only
    change.

    Plan shape: identical to mixture_sample — one low-cardinality
    count aggregate, rates broadcast back, selection stays a
    scan-side hash-threshold filter (zero data shuffles)."""
    tagged = docs.select(
        "doc_id", "lang", sample_bucket(F.col("doc_id")).alias("bucket")
    )
    counts = tagged.groupBy("lang").agg(F.count("*").alias("n_lang"))
    powed = counts.withColumn(
        "p", F.pow(F.col("n_lang").cast("double"), F.lit(alpha_e2 / 100.0))
    )
    tot = powed.agg(
        F.sum("p").alias("sp"), F.sum("n_lang").alias("n_total")
    )
    rates = (
        powed.crossJoin(F.broadcast(tot))
        .withColumn(
            "share_e6",
            F.round(F.lit(1_000_000.0) * F.col("p") / F.col("sp")).cast("long"),
        )
        .withColumn(
            "rate_e6",
            F.least(
                F.lit(BUCKETS_E6).cast("long"),
                F.expr(
                    f"(share_e6 * n_total * {budget_pct})"
                    " div (100 * n_lang)"
                ),
            ).cast("int"),
        )
        .select("lang", "rate_e6")
    )
    return (
        tagged.join(F.broadcast(rates), "lang")
        .where(F.col("bucket") < F.col("rate_e6"))
        .select("doc_id", "lang", "bucket", "rate_e6")
    )


TRAIN_PCT = 80
VAL_PCT = 10


def stratified_split(
    docs: DataFrame, train_pct: int = TRAIN_PCT, val_pct: int = VAL_PCT
) -> DataFrame:
    """Deterministic exact-quota train/val/test assignment, stratified
    by lang — the split you freeze before training so eval rows never
    leak across reruns or corpus growth *within a stratum snapshot*.

    Within each lang, docs are ranked by (hash bucket, doc_id) — the
    same namespaced hash as the other sampling ops, so splits from
    different SEEDs are independent — and the first floor(n·train%)
    become train, the next floor(n·val%) val, the rest test. Exact
    integer quotas (no binomial wobble): a 1000-doc lang at 80/10
    yields exactly 800/100/100.

    Plan: two-phase per-stratum rank (``_stratified_rank``) — rank and
    stratum total both come off the same bounded counts table, so the
    split of a 10^12-row corpus with one dominant lang still runs as
    parallel partition-bounded sorts.
    """
    return (
        _stratified_rank(docs)
        .withColumn(
            "split",
            F.when(
                F.col("rk") <= F.expr(f"(n * {train_pct}) div 100"),
                F.lit("train"),
            )
            .when(
                F.col("rk")
                <= F.expr(f"(n * {train_pct}) div 100 + (n * {val_pct}) div 100"),
                F.lit("val"),
            )
            .otherwise(F.lit("test")),
        )
        .select("doc_id", "lang", "split")
    )


# --------------------------------------------------------------- oracle SQL

_BKT = _duck_bucket("doc_id")

ORACLE_SQL = {
    "samp_weighted": f"""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
       round(ln(({_BKT} + 1.0) / {BUCKETS_E6 + 1}.0)
             / (CAST(n_chars AS DOUBLE) + 1.0), 6) AS es_key
FROM documents
ORDER BY es_key DESC, doc_id ASC
LIMIT {WEIGHTED_K}
""",
    "samp_bernoulli": f"""
SELECT doc_id, lang, {_BKT} AS bucket
FROM documents
WHERE {_BKT} < {RATE_E6}
""",
    "samp_stratified_quota": f"""
WITH tagged AS (SELECT doc_id, lang, {_BKT} AS bucket FROM documents)
SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY bucket ASC, doc_id ASC) AS rk
  FROM tagged
) WHERE rk <= {QUOTA}
""",
    "samp_mixture": f"""
WITH tagged AS (SELECT doc_id, lang, {_BKT} AS bucket FROM documents),
counts AS (SELECT lang, count(*) AS n_lang FROM tagged GROUP BY lang),
tot AS (SELECT count(*) AS n_total FROM tagged),
shares(lang, share_e6) AS (VALUES {", ".join(
    f"('{lang}', {int(round(wt / sum(MIXTURE_WEIGHTS.values()) * 1_000_000))})"
    for lang, wt in sorted(MIXTURE_WEIGHTS.items())
)}),
rates AS (
  SELECT c.lang,
         least({BUCKETS_E6}, CAST(floor(
             (s.share_e6 * t.n_total * {MIXTURE_BUDGET_PCT} / 100.0 / 1000000.0)
             * {BUCKETS_E6} / c.n_lang) AS INTEGER)) AS rate_e6
  FROM counts c JOIN shares s USING (lang) CROSS JOIN tot t
)
SELECT g.doc_id, g.lang, g.bucket, r.rate_e6
FROM tagged g JOIN rates r USING (lang)
WHERE g.bucket < r.rate_e6
""",
    "samp_temperature": f"""
WITH tagged AS (SELECT doc_id, lang, {_BKT} AS bucket FROM documents),
counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM tagged GROUP BY lang),
powed AS (
  SELECT lang, n_lang,
         pow(CAST(n_lang AS DOUBLE), {TEMP_ALPHA_E2 / 100.0}) AS p
  FROM counts
),
tot AS (
  SELECT sum(p) AS sp, CAST(sum(n_lang) AS BIGINT) AS n_total FROM powed
),
rates AS (
  SELECT lang,
         CAST(least(CAST({BUCKETS_E6} AS BIGINT),
              (CAST(round(1000000.0 * p / t.sp) AS BIGINT)
               * t.n_total * {TEMP_BUDGET_PCT}) // (100 * n_lang))
           AS INTEGER) AS rate_e6
  FROM powed CROSS JOIN tot t
)
SELECT g.doc_id, g.lang, g.bucket, r.rate_e6
FROM tagged g JOIN rates r USING (lang)
WHERE g.bucket < r.rate_e6
""",
    "samp_stratified_split": f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_BKT}, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN rk <= (n * {TRAIN_PCT}) // 100 THEN 'train'
            WHEN rk <= (n * {TRAIN_PCT}) // 100 + (n * {VAL_PCT}) // 100
                 THEN 'val'
            ELSE 'test' END AS split
FROM ranked
""",
}

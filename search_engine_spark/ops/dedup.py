"""Deduplication operators for a training-data pipeline.

Four families over ``documents(doc_id, text, ...)``:

- **exact**      — md5(text) hash-groupBy; one shuffle on the digest,
  uniform keys (cryptographic hash) so no skew handling needed.
- **MinHash+LSH**— distinct terms → 16 universal-hash minima →
  4 bands × 4 rows → band-bucket self-join → candidate pairs with
  estimated Jaccard. The band join is the scale path: at 100 TB only
  near-duplicate docs collide, so the self-join output is ~linear in
  true-duplicate count, never O(n²).
- **SimHash**    — 16-bit tf-weighted bit-majority signature; Hamming
  buckets give another near-dup signal. Integer-exact.
- **n-gram Jaccard** — ordered 3-token shingles, exact pairwise Jaccard
  over candidate pairs. Kept exact here (small SF); at scale it runs
  AFTER the LSH prefilter as the verify stage of the usual
  LSH→verify pipeline.

Everything is JVM-side column algebra (no UDFs): md5/conv for portable
hashing, higher-order array functions for shingles. DuckDB oracle twins
in ``ORACLE_SQL`` are integer-exact except Jaccard ratios (rounded 4dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.sqltwin import (
    duck_minhash_perm,
    duck_term_hash31,
    duck_term_hash60,
    duck_tokens,
    minhash_perm,
    term_hash31,
    term_hash60,
    tokens_col,
)

N_PERMS = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERMS // N_BANDS
SIMHASH_BITS = 16
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.8
# Verify-stage prefilter: candidates whose MinHash-estimated Jaccard is
# hopeless for JACCARD_THRESHOLD skip the exact shingle intersection.
# 6/16 ≈ est 0.375: P(a true J=0.8 pair scores ≤5 of 16) ≈ 1e-6 —
# recall loss is negligible next to the banding miss rate itself
# (1-(1-J^4)^4 ≈ 0.88 at J=0.8), while the expensive exact-verify input
# shrinks from "every pair sharing one band" to near-threshold pairs.
EST_PREFILTER_MIN = 6
# Skew guard: band buckets larger than this are excluded from pairing.
# Identical docs never reach LSH (exact-dedup canonicalization runs
# first), so an oversized residual bucket is a hash pile-up, not signal;
# per-bucket pair cost is bounded by CAP²/2 instead of m²/2.
LSH_BUCKET_CAP = 64


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group by content digest; canonical doc = min doc_id per group."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def _distinct_term_hashes(docs: DataFrame) -> DataFrame:
    toks = F.array_distinct(tokens_col("text"))
    return (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .withColumn("h", term_hash31(F.col("term")))
        .select("doc_id", "h")
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """Wide 16-column MinHash signature per doc (sig_0..sig_15).

    One explode + one groupBy(doc_id) shuffle; the 16 permutations are
    column expressions over the same 31-bit term hash, so the explode
    is materialized once, not 16×.
    """
    th = _distinct_term_hashes(docs)
    aggs = [
        F.min(minhash_perm(F.col("h"), j)).alias(f"sig_{j}") for j in range(N_PERMS)
    ]
    return th.groupBy("doc_id").agg(*aggs)


def exact_representatives(docs: DataFrame) -> DataFrame:
    """One representative doc per exact-duplicate group (min doc_id per
    md5 digest). The scale pipeline runs LSH over these, never raw docs:
    a cluster of m byte-identical docs collapses to 1 row *before* the
    band join, so identical-content skew can't create a mega-bucket."""
    reps = (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(reps, "doc_id", "left_semi")


def lsh_candidate_pairs(
    docs: DataFrame,
    bucket_cap: int | None = LSH_BUCKET_CAP,
    canonicalize: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: docs sharing ≥1 band bucket, with
    estimated Jaccard = matching-signature fraction.

    Scale guards (on by default, both oracle-expressible):

    - ``canonicalize``: pair over exact-dedup representatives only —
      byte-identical duplicates are already resolved by ``exact_dedup``
      and would otherwise blow the band join up quadratically.
    - ``bucket_cap``: drop band buckets with more than ``bucket_cap``
      members from pairing (deterministic: per-``bkey`` count). Bounds
      worst-case pair output at buckets·cap²/2 instead of m²/2.
    """
    from pyspark.sql import Window

    if canonicalize:
        docs = exact_representatives(docs)
    sigs = minhash_signatures(docs)
    band_cols = [
        F.concat_ws(
            "-",
            F.lit(b),
            *[F.col(f"sig_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
        ).alias(f"band_{b}")
        for b in range(N_BANDS)
    ]
    # Carry the whole signature as an array THROUGH the band join
    # instead of joining it back per side afterwards: the minhash
    # pipeline (tokenize → distinct → 16-way min agg) is then planned
    # once, and both self-join sides + the cap filter hang off a single
    # exchange on bkey (AQE ReusedExchange). The wider shuffle rows
    # (16 ints) cost far less than two extra signature join shuffles.
    sig_arr = F.array(*[F.col(f"sig_{j}") for j in range(N_PERMS)])
    keys = sigs.select(
        "doc_id",
        sig_arr.alias("sig"),
        F.explode(F.array(*band_cols)).alias("bkey"),
    )
    if bucket_cap is not None:
        # window count instead of groupBy+semi-join: same bkey shuffle
        # the self-join needs anyway, zero extra scans of the pipeline
        keys = (
            keys.withColumn(
                "bsz", F.count("*").over(Window.partitionBy("bkey"))
            )
            .where(F.col("bsz") <= bucket_cap)
            .drop("bsz")
        )
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        keys.alias("a")
        .join(keys.alias("b"), on="bkey")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        # dedupe pairs colliding in >1 band; sig_a/sig_b are
        # functionally dependent on the doc ids, so first() is exact
        .groupBy("doc_a", "doc_b")
        .agg(F.first("sig_a").alias("sig_a"), F.first("sig_b").alias("sig_b"))
        .select(
            "doc_a",
            "doc_b",
            matches.cast("int").alias("sig_matches"),
            F.round(matches / F.lit(float(N_PERMS)), 4).alias("est_jaccard"),
        )
    )


def simhash(docs: DataFrame) -> DataFrame:
    """16-bit tf-weighted SimHash per doc (integer-exact)."""
    toks = tokens_col("text")
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("h", term_hash31(F.col("term")))
    )
    bit_aggs = [
        F.sum(
            F.col("tf") * (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"w_{b}")
        for b in range(SIMHASH_BITS)
    ]
    w = tf.groupBy("doc_id").agg(*bit_aggs)
    sim = sum(
        F.when(F.col(f"w_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    )
    return w.select("doc_id", sim.cast("long").alias("simhash"))


# Manku-style Hamming-ball near-dup search (WWW'07 §3): 60-bit signature
# split into HAM_BLOCKS exact-match blocks. Pigeonhole: a pair within
# Hamming distance HAM_MAX_HD (< HAM_BLOCKS) agrees on >= 1 full block,
# so the block-bucket equi-join is a COMPLETE candidate generator and
# the bit_count(xor) verify is exact — never an all-pairs comparison.
SIMHASH64_BITS = 60          # fits int64 (bit 59 max); md5-derived, portable
HAM_BLOCKS = 4
HAM_BLOCK_BITS = SIMHASH64_BITS // HAM_BLOCKS   # 15 bits -> 32768 values
HAM_MAX_HD = 3


def simhash60(docs: DataFrame) -> DataFrame:
    """60-bit tf-weighted SimHash per doc (integer-exact, JVM-only).

    Same bit-majority construction as :func:`simhash` but over the full
    60-bit portable term hash — wide enough that block buckets
    (15 bits) stay selective at corpus scale. One tokenize pass + one
    (doc_id, term) shuffle; the 60 per-bit weights are columns of a
    single aggregate, not 60 passes.
    """
    toks = tokens_col("text")
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("h", term_hash60(F.col("term")))
    )
    bit_aggs = [
        F.sum(
            F.col("tf") * (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"w_{b}")
        for b in range(SIMHASH64_BITS)
    ]
    w = tf.groupBy("doc_id").agg(*bit_aggs)
    sim = sum(
        F.when(F.col(f"w_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH64_BITS)
    )
    return w.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_hamming_pairs(
    docs: DataFrame,
    max_hd: int = HAM_MAX_HD,
    bucket_cap: int | None = LSH_BUCKET_CAP,
    canonicalize: bool = True,
) -> DataFrame:
    """Near-dup pairs within Hamming distance ``max_hd`` of the 60-bit
    SimHash — the third member of the near-dup family (MinHash-LSH sees
    set overlap, SimHash sees weighted-profile proximity).

    Scale shape mirrors :func:`lsh_candidate_pairs`: exact-dedup
    canonicalization first (identical docs can't pile into one block
    bucket), block-bucket self-join as the ONLY pair generator
    (complete for ``max_hd`` < ``HAM_BLOCKS`` by pigeonhole), window
    ``bucket_cap`` on the same exchange for hash-pile-up skew, then the
    exact ``bit_count(xor)`` verify on candidates only.
    """
    from pyspark.sql import Window

    if canonicalize:
        docs = exact_representatives(docs)
    sigs = simhash60(docs)
    mask = (1 << HAM_BLOCK_BITS) - 1
    block_cols = [
        F.concat_ws(
            "-",
            F.lit(b),
            F.shiftright(F.col("simhash"), b * HAM_BLOCK_BITS)
            .bitwiseAND(F.lit(mask)),
        )
        for b in range(HAM_BLOCKS)
    ]
    keys = sigs.select(
        "doc_id", "simhash", F.explode(F.array(*block_cols)).alias("bkey")
    )
    if bucket_cap is not None:
        keys = (
            keys.withColumn("bsz", F.count("*").over(Window.partitionBy("bkey")))
            .where(F.col("bsz") <= bucket_cap)
            .drop("bsz")
        )
    hd = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        keys.alias("a")
        .join(keys.alias("b"), on="bkey")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.first("sim_a").alias("sim_a"), F.first("sim_b").alias("sim_b"))
        .where(hd <= max_hd)
        .select("doc_a", "doc_b", hd.cast("int").alias("hamming"))
    )


def _shingle_sets(docs: DataFrame) -> DataFrame:
    # tokens are projected as a REAL column before the shingle
    # transform: an expression captured inside a higher-order-function
    # lambda is re-evaluated per element (no CSE across the lambda
    # boundary), so referencing the tokenizer split there re-tokenizes
    # the doc once per shingle — quadratic in doc length. A bound
    # column attribute is evaluated once per row.
    staged = docs.select("doc_id", tokens_col("text").alias("__toks"))
    shingles = F.expr(
        f"CASE WHEN size(__toks) >= {SHINGLE_N} THEN array_distinct("
        f"transform(sequence(1, size(__toks) - {SHINGLE_N} + 1), "
        f"i -> array_join(slice(__toks, i, {SHINGLE_N}), ' '))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    return staged.select("doc_id", shingles.alias("sh"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    prefilter: bool = True,
) -> DataFrame:
    """Exact 3-token-shingle Jaccard — the verify stage of the
    LSH→verify pipeline.

    Default path (``prefilter=True``): take candidate pairs from
    :func:`lsh_candidate_pairs`, drop those whose minhash-estimated
    Jaccard is hopeless (``sig_matches < EST_PREFILTER_MIN`` — the
    signature comparison is already computed by the band join, so this
    costs one filter), and compute exact Jaccard *only for surviving
    pairs* via ``array_intersect`` on the per-doc shingle sets — two
    equi-joins on doc_id, output linear in candidate count. The shingle
    sets themselves are built ONLY for docs referenced by a surviving
    pair (left-semi prune before the tokenize+shingle expression), so
    verify CPU is candidate-bound, not corpus-bound — at sf0.1 this cut
    the stage 48k pairs → near-threshold pairs and ~37 s → ~4 s. No raw
    shingle self-join anywhere, so a stop-shingle shared by 1% of the
    corpus can't go quadratic.

    ``prefilter=False`` keeps the standalone all-pairs-by-shared-shingle
    plan for small inputs / ad-hoc exactness checks.
    """
    if prefilter:
        pairs = (
            lsh_candidate_pairs(docs)
            .where(F.col("sig_matches") >= EST_PREFILTER_MIN)
            .select("doc_a", "doc_b")
            # reused 3×: both semi-prune legs + the verify join; tiny
            # (near-threshold candidates only) so persist, never recompute
            # the whole minhash pipeline per reference
            .persist()
        )
        cand = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .union(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sets = _shingle_sets(docs.join(cand, "doc_id", "left_semi"))
        sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        jac = F.round(inter / union, 4)
        return (
            pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .where(union > 0)
            .select(
                "doc_a", "doc_b",
                inter.cast("long").alias("inter"),
                jac.alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold)
        )
    sets = _shingle_sets(docs)
    sizes = sets.select("doc_id", F.size("sh").alias("n_sh"))
    ex = sets.select("doc_id", F.explode("sh").alias("sh"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), on="sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(
        F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4
    )
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", "inter", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def near_dup_edges(docs: DataFrame) -> DataFrame:
    """(src, dst) duplicate-relation edges feeding the clustering stage:

    - exact edges: every non-canonical member of an md5 group links to
      its canonical (min) doc_id — star-shaped, |group|-1 edges per
      group, never quadratic;
    - near edges: LSH-verified pairs (``ngram_jaccard_pairs`` prefilter
      path — canonicalized, bucket-capped, Jaccard ≥ threshold), which
      relate exact-group *representatives* to each other.

    The union is linear in true-duplicate count by construction.
    """
    digests = docs.select("doc_id", F.md5("text").alias("text_md5"))
    canon = digests.groupBy("text_md5").agg(F.min("doc_id").alias("src"))
    exact_e = (
        digests.join(canon, "text_md5")
        .where(F.col("doc_id") != F.col("src"))
        .select("src", F.col("doc_id").alias("dst"))
    )
    near_e = ngram_jaccard_pairs(docs).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return exact_e.union(near_e)


def dedup_survivors_by_quality(docs: DataFrame) -> DataFrame:
    """One survivor per duplicate cluster, chosen by QUALITY instead of
    min doc_id → (doc_id, cluster_id, quality_e6). The production
    survivor rule for training data: when near-dups differ (boilerplate
    variants, truncations), keep the best-scoring copy, not the
    accidental id-order winner. Composes :func:`dedup_clusters` with
    ``textstats.quality_score`` — one extra broadcast-scale join and a
    per-cluster window; ties break on doc_id asc so the pick is total."""
    from pyspark.sql import Window

    from search_engine_spark.ops.textstats import quality_score

    cl = dedup_clusters(docs)
    q = quality_score(docs).select("doc_id", "quality_e6")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_e6"), F.asc("doc_id")
    )
    return (
        cl.join(q, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", "cluster_id", "quality_e6")
    )


def dedup_clusters(docs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id) for EVERY doc — transitive closure of the
    exact+near duplicate relation via
    :func:`operators.components.connected_components_star` (alternating
    large-star/small-star, log-round convergence — robust to drift
    chains A≈B≈C≈…, not just clique-shaped dup families); docs with no
    duplicate edge form singleton clusters. ``cluster_id`` is the min
    doc_id of the cluster, so ``doc_id == cluster_id`` selects the
    survivor set (one canonical doc per duplicate class)."""
    from search_engine_spark.operators.components import (
        connected_components_star,
    )

    cc = connected_components_star(
        near_dup_edges(docs), nodes=docs.select(F.col("doc_id").alias("id"))
    )
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# --------------------------------------------------------------- oracle SQL

_T = duck_tokens("text")
_TH = duck_term_hash31("term")


def _distinct_terms_sql(src: str) -> str:
    return f"""
th AS (
  SELECT doc_id, {_TH} AS h
  FROM (SELECT doc_id, unnest(list_distinct({_T})) AS term FROM {src})
)"""


_DISTINCT_TERMS = _distinct_terms_sql("documents")

# exact-dedup canonicalization: one representative per md5 group
_REPS = """
reps AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, md5(text) AS m FROM documents) GROUP BY m
),
docs_r AS (SELECT d.doc_id, d.text FROM documents d JOIN reps USING (doc_id))"""

_SIGS = (
    "sigs AS (\n  SELECT doc_id, "
    + ", ".join(
        f"min({duck_minhash_perm('h', j)}) AS sig_{j}" for j in range(N_PERMS)
    )
    + "\n  FROM th GROUP BY doc_id\n)"
)

_BAND_KEYS = "\nUNION ALL\n".join(
    "SELECT doc_id, concat_ws('-', '"
    + str(b)
    + "', "
    + ", ".join(f"sig_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    + ") AS bkey FROM sigs"
    for b in range(N_BANDS)
)

# band keys with oversized buckets dropped (the Spark bucket_cap guard)
_CAPPED_PAIRS = f"""
keys AS ({_BAND_KEYS}),
okk AS (SELECT bkey FROM keys GROUP BY bkey HAVING count(*) <= {LSH_BUCKET_CAP}),
keys2 AS (SELECT k.doc_id, k.bkey FROM keys k JOIN okk USING (bkey)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keys2 a JOIN keys2 b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
)"""

def _sig_matches_sql(a: str, b: str) -> str:
    return " + ".join(
        f"(CASE WHEN {a}.sig_{j} = {b}.sig_{j} THEN 1 ELSE 0 END)"
        for j in range(N_PERMS)
    )


_SIG_MATCHES = _sig_matches_sql("sa", "sb")

# twin of the Spark verify prefilter: candidates below the estimated-
# Jaccard floor never reach the exact shingle intersection
_VPAIRS = f"""
vpairs AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN sigs qa ON qa.doc_id = p.doc_a
  JOIN sigs qb ON qb.doc_id = p.doc_b
  WHERE {_sig_matches_sql("qa", "qb")} >= {EST_PREFILTER_MIN}
)"""


def _shingles_sql(src: str) -> str:
    return f"""
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {SHINGLE_N} THEN
           list_distinct(list_transform(
             generate_series(1, len(toks) - {SHINGLE_N - 1}),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE [] END AS sh
  FROM (SELECT doc_id, {_T} AS toks FROM {src})
)"""


_SHINGLES = _shingles_sql("documents")

def _survivors_quality_sql() -> str:
    """Composes the recursive-closure clusters oracle with the
    textstats quality oracle (imported lazily to avoid a cycle)."""
    from search_engine_spark.ops.textstats import ORACLE_SQL as TS

    return f"""
WITH cl AS ({ORACLE_SQL['dedup_clusters']}),
q AS ({TS['text_quality_score']}),
j AS (
  SELECT cl.doc_id, cl.cluster_id, q.quality_e6
  FROM cl JOIN q USING (doc_id)
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY quality_e6 DESC, doc_id ASC) AS rk
  FROM j
)
SELECT doc_id, cluster_id, quality_e6 FROM r WHERE rk = 1
"""


ORACLE_SQL = {
    "dedup_exact": """
SELECT md5(text) AS text_md5,
       count(*) AS n_docs,
       min(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1
""",
    "dedup_minhash_signatures": f"""
WITH {_DISTINCT_TERMS}, {_SIGS}
SELECT * FROM sigs
""",
    "dedup_lsh_pairs": f"""
WITH {_REPS}, {_distinct_terms_sql("docs_r")}, {_SIGS},
{_CAPPED_PAIRS}
SELECT p.doc_a, p.doc_b,
       {_SIG_MATCHES} AS sig_matches,
       round(({_SIG_MATCHES}) / {float(N_PERMS)}, 4) AS est_jaccard
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.doc_a
JOIN sigs sb ON sb.doc_id = p.doc_b
""",
    "dedup_simhash": f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf, {_TH} AS h
  FROM (SELECT doc_id, unnest({_T}) AS term FROM documents)
  GROUP BY doc_id, term
), w AS (
  SELECT doc_id,
         {', '.join(f"sum(tf * (((h >> {b}) & 1) * 2 - 1)) AS w_{b}" for b in range(SIMHASH_BITS))}
  FROM tf GROUP BY doc_id
)
SELECT doc_id,
       CAST({' + '.join(f"(CASE WHEN w_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS))} AS BIGINT) AS simhash
FROM w
""",
    # verify stage of the LSH→verify pipeline: exact Jaccard computed
    # ONLY over the (canonicalized, bucket-capped) LSH candidate pairs.
    "dedup_ngram_jaccard": f"""
WITH {_REPS}, {_distinct_terms_sql("docs_r")}, {_SIGS},
{_CAPPED_PAIRS}, {_VPAIRS}, {_shingles_sql("docs_r")},
j AS (
  SELECT p.doc_a, p.doc_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS un
  FROM vpairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b
  WHERE len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) > 0
)
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
       round(CAST(inter AS DOUBLE) / un, 4) AS jaccard
FROM j
WHERE round(CAST(inter AS DOUBLE) / un, 4) >= {JACCARD_THRESHOLD}
""",
    # Hamming-ball near-dup pairs: 60-bit simhash over exact-dedup
    # representatives, 4x15-bit block buckets (capped), bit_count(xor)
    # verify — same algorithm, independently expressed.
    "dedup_simhash_pairs": f"""
WITH {_REPS},
tf AS (
  SELECT doc_id, term, count(*) AS tf, {duck_term_hash60('term')} AS h
  FROM (SELECT doc_id, unnest({_T}) AS term FROM docs_r)
  GROUP BY doc_id, term
), w AS (
  SELECT doc_id,
         {', '.join(f"sum(tf * (((h >> {b}) & 1) * 2 - 1)) AS w_{b}" for b in range(SIMHASH64_BITS))}
  FROM tf GROUP BY doc_id
), sigs AS (
  SELECT doc_id,
         CAST({' + '.join(f"(CASE WHEN w_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH64_BITS))} AS BIGINT) AS simhash
  FROM w
), keys AS (
  SELECT doc_id, simhash,
         concat_ws('-', b.b, (simhash >> (b.b * {HAM_BLOCK_BITS})) & {(1 << HAM_BLOCK_BITS) - 1}) AS bkey
  FROM sigs, (SELECT unnest(range(0, {HAM_BLOCKS})) AS b) b
), okk AS (
  SELECT bkey FROM keys GROUP BY bkey HAVING count(*) <= {LSH_BUCKET_CAP}
), keys2 AS (
  SELECT k.doc_id, k.simhash, k.bkey FROM keys k JOIN okk USING (bkey)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM keys2 a JOIN keys2 b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= {HAM_MAX_HD}
""",
    # clustering stage: min-id connected components over the exact+near
    # duplicate relation. Independent algorithm on the oracle side —
    # recursive-CTE transitive closure (min reachable id per node) vs
    # Spark's iterative min-label propagation.
    "dedup_clusters": f"""
WITH RECURSIVE {_REPS}, {_distinct_terms_sql("docs_r")}, {_SIGS},
{_CAPPED_PAIRS}, {_VPAIRS}, {_shingles_sql("docs_r")},
near_e AS (
  SELECT p.doc_a AS src, p.doc_b AS dst
  FROM vpairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b
  WHERE len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) > 0
    AND round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
              4) >= {JACCARD_THRESHOLD}
),
exact_e AS (
  SELECT g.canonical AS src, d.doc_id AS dst
  FROM (SELECT doc_id, md5(text) AS m FROM documents) d
  JOIN (SELECT md5(text) AS m, min(doc_id) AS canonical
        FROM documents GROUP BY 1) g USING (m)
  WHERE d.doc_id <> g.canonical
),
sym AS (
  SELECT src, dst FROM exact_e UNION SELECT dst, src FROM exact_e
  UNION SELECT src, dst FROM near_e UNION SELECT dst, src FROM near_e
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.id
)
SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
""",
}


ORACLE_SQL["dedup_survivors_quality"] = _survivors_quality_sql()

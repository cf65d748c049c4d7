"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``  — brute-force exact cosine top-k per query vector:
  broadcast the (tiny) query set, dot/norm via ``zip_with`` +
  ``aggregate`` (sequential fold in float64 → deterministic and
  portable), window ``row_number`` for per-query top-k. This is the
  correctness baseline; it reads every vector once, no shuffle except
  the final per-query top-k (k rows per partition after the window —
  Spark pushes the rank filter into a partial top-k).
- ``ann_lsh_topk`` — the scale path: sign-random-projection LSH.
  Each vector gets a B-bit signature from fixed pseudo-random
  hyperplanes (deterministic small-integer coefficients, so the
  DuckDB oracle reproduces them exactly); candidates = vectors in the
  same bucket as the query; exact cosine re-rank inside the bucket.
  At 100 TB the bucket join replaces the full scan: cost ~ bucket
  size × queries, and the signature build is a single narrow pass.
- ``ann_ivf_topk`` — the trained-quantizer scale path: IVF with a
  k-means coarse quantizer. Training runs a FIXED number of Lloyd
  iterations in ×10^4 fixed-point integer arithmetic (embeddings
  quantized and offset positive so truncating and floor division
  agree), init = the first K vectors — every step is deterministic
  and chain-CTE-expressible, so the DuckDB oracle reproduces the
  centroids bit-for-bit. Query probes its nearest centroid
  (nprobe=1) and exact-cosine re-ranks inside that cluster. At scale
  the cluster assignment is the partition key: each query reads
  1/K of the corpus instead of all of it, and training is
  3 passes × (1 broadcast join + 1 groupBy) — no mutable state.

Embedding floats are cast to float64 BEFORE any arithmetic on both
engines; scores rounded to 4dp; ordering uses (rounded score DESC,
vec_id ASC) so top-k membership is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
N_QUERIES = 5  # queries = vec_id < 5 (deterministic, from the input itself)
TOPK = 10
IVF_K = 8        # coarse-quantizer cluster count (≈√N at this SF)
IVF_ITERS = 3    # fixed Lloyd iterations (engine-exact, oracle-twinned)
IVF_SCALE = 10_000
IVF_OFFSET = 100_000  # shifts e4-quantized coords positive: trunc div == floor div
DIM = 64


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def _plane_coef(i: int, j: int) -> int:
    """Deterministic pseudo-random projection coefficient in [-3, 3],
    md5-seeded (computed once in Python, embedded as literals in both
    the Spark plan and the DuckDB oracle — no runtime hashing)."""
    import hashlib

    h = hashlib.md5(f"plane-{j}-dim-{i}".encode()).digest()
    return (h[0] % 7) - 3


def _signature(vec: Column, dim: int) -> Column:
    """B-bit sign signature: bit j = [Σ_i coef(i,j)·vec[i] > 0]."""
    bits = []
    for j in range(N_PLANES):
        proj = sum(
            F.element_at(vec, i + 1).cast("double") * F.lit(_plane_coef(i, j))
            for i in range(dim)
            if _plane_coef(i, j) != 0
        )
        bits.append(F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return sum(bits).cast("int")


def cosine_topk(emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector."""
    qs = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    cands = emb.select("vec_id", "embedding")
    joined = cands.crossJoin(F.broadcast(qs)).where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    scored = joined.select(
        "query_id", "vec_id", F.round(cos, 4).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def filtered_cosine_topk(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES
) -> DataFrame:
    """Metadata-filtered exact kNN — the "same lang/repo/tenant only"
    vector search every production ANN store exposes (ES kNN ``filter``,
    FAISS IDSelector, pgvector WHERE): candidates are restricted to the
    query's own ``label`` class BEFORE the top-k cut (pre-filter
    semantics — always k true neighbors from the allowed set, where
    post-filtering a plain top-k can starve below k).

    Plan shape: the filter lands in the crossJoin condition, so the
    distance expression evaluates only on allowed pairs — at scale the
    same predicate pushes into the IVF/LSH candidate scan (partition
    prune on a label-partitioned vector table) and the distance-eval
    count drops by the filter's selectivity, the whole point of
    pre-filtered ANN."""
    qs = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("label").alias("qlabel"),
    )
    cands = emb.select("vec_id", "embedding", "label")
    joined = cands.join(
        F.broadcast(qs),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") == F.col("qlabel")),
    )
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    scored = joined.select(
        "query_id", "vec_id", "label", F.round(cos, 4).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "label", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


MMR_LAMBDA = 0.7       # relevance weight; diversity weight written as the
MMR_DIV = 0.3          # LITERAL 0.3 on both engines (1.0-0.7 in IEEE is
#                        0.30000000000000004 — a cross-engine hash hazard)
MMR_POOL = 20          # candidate pool the greedy re-ranks


def mmr_topk(emb: DataFrame, k: int = TOPK, pool: int = MMR_POOL,
             query_id: int = 0) -> DataFrame:
    """Maximal Marginal Relevance result diversification (Carbonell &
    Goldstein, SIGIR'98 — re-derived): greedily re-rank the top-``pool``
    cosine candidates of one query so each pick maximizes
    ``λ·rel − (1−λ)·max_sim_to_already_selected`` — near-duplicate hits
    stop crowding the page (the retrieval-side complement of the dedup
    pipeline). Output: (rank, vec_id, rel, mmr) for the k picks; the
    first pick is pure relevance.

    Distribution shape: the corpus-sized work is exactly the brute
    cosine scan (one pass, broadcast query); everything after operates
    on the pool (≤ ``pool`` rows — pool² pairwise sims, persisted) with
    k chained argmax steps of DataFrame algebra, each a pure function
    of the last so the unrolled DuckDB CTE twin reproduces the greedy
    bit-exactly (4dp sims / 6dp scores, vec_id tie-breaks — the
    established float protocol). At 100 TB only the scan scales; the
    greedy stays O(pool²) regardless of corpus size."""
    q = emb.where(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q")
    )
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    rel = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_id)
        .select("vec_id", F.round(cos, 4).alias("rel"), "embedding")
    )
    pool_df = rel.orderBy(F.desc("rel"), F.asc("vec_id")).limit(pool).persist()
    pa = pool_df.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    pb = pool_df.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    pcos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    sims = (
        pa.crossJoin(pb).where(F.col("a") != F.col("b"))
        .select("a", "b", F.round(pcos, 4).alias("sim"))
        .persist()
    )
    sel = (
        pool_df.orderBy(F.desc("rel"), F.asc("vec_id")).limit(1)
        .select(
            "vec_id", "rel",
            F.round(F.lit(MMR_LAMBDA) * F.col("rel"), 6).alias("mmr"),
            F.lit(1).cast("int").alias("rank"),
        )
        .localCheckpoint()
    )
    for i in range(2, k + 1):
        sel_ids = sel.select("vec_id")
        ms = (
            sims.join(sel_ids.withColumnRenamed("vec_id", "b"), "b")
            .groupBy(F.col("a").alias("vec_id"))
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            pool_df.join(sel_ids, "vec_id", "left_anti")
            .join(ms, "vec_id")
            .select(
                "vec_id", "rel",
                F.round(
                    F.lit(MMR_LAMBDA) * F.col("rel")
                    - F.lit(MMR_DIV) * F.col("maxsim"), 6
                ).alias("mmr"),
                F.lit(i).cast("int").alias("rank"),
            )
            .orderBy(F.desc("mmr"), F.asc("vec_id"))
            .limit(1)
        )
        sel = sel.unionByName(pick).localCheckpoint()
    return sel.select("rank", "vec_id", "rel", "mmr")


def oracle_sql_mmr(k: int = TOPK, pool: int = MMR_POOL,
                   query_id: int = 0) -> str:
    """DuckDB twin of :func:`mmr_topk`: the greedy unrolled as one CTE
    pair (pick + running selection) per step."""
    pcos = (
        _DUCK_DOT.format(a="p1.embedding", b="p2.embedding")
        + " / ("
        + _DUCK_NORM.format(a="p1.embedding")
        + " * "
        + _DUCK_NORM.format(a="p2.embedding")
        + ")"
    )
    ctes = [
        f"q AS MATERIALIZED (SELECT embedding AS q FROM embeddings WHERE vec_id = {query_id})",
        f"""rel AS MATERIALIZED (
  SELECT c.vec_id, round({_COS}, 4) AS rel, c.embedding
  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> {query_id}
)""",
        f"pool AS MATERIALIZED (SELECT * FROM rel ORDER BY rel DESC, vec_id ASC LIMIT {pool})",
        f"""sims AS MATERIALIZED (
  SELECT p1.vec_id AS a, p2.vec_id AS b, round({pcos}, 4) AS sim
  FROM pool p1 JOIN pool p2 ON p1.vec_id <> p2.vec_id
)""",
        f"""sel1 AS MATERIALIZED (
  SELECT vec_id, rel, round({MMR_LAMBDA} * rel, 6) AS mmr, 1 AS rank
  FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1
)""",
    ]
    for i in range(2, k + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT c.vec_id, c.rel,
         round({MMR_LAMBDA} * c.rel - {MMR_DIV} * ms.maxsim, 6) AS mmr,
         {i} AS rank
  FROM pool c
  JOIN (
    SELECT s.a AS vec_id, max(s.sim) AS maxsim FROM sims s
    WHERE s.b IN (SELECT vec_id FROM sel{i - 1}) GROUP BY s.a
  ) ms ON ms.vec_id = c.vec_id
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  ORDER BY mmr DESC, c.vec_id ASC LIMIT {1}
)"""
        )
        ctes.append(
            f"sel{i} AS MATERIALIZED (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM p{i})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(rank AS INTEGER) AS rank, vec_id, rel, mmr FROM sel{k}"
    )


def lsh_signatures(emb: DataFrame, dim: int = 64) -> DataFrame:
    """Per-vector LSH bucket id (the index-build side of ANN)."""
    return emb.select("vec_id", _signature(F.col("embedding"), dim).alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES, dim: int = 64
) -> DataFrame:
    """ANN: restrict exact cosine to the query's LSH bucket."""
    sigs = lsh_signatures(emb, dim)
    base = emb.join(sigs, "vec_id")
    qs = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("bucket").alias("qbucket"),
    )
    joined = (
        base.join(F.broadcast(qs), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    scored = joined.select("query_id", "vec_id", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def ivfpq_recall(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES
) -> DataFrame:
    """Recall@k of the composed IVF-PQ path vs the exact brute-force
    baseline — the quality ledger for the PRODUCTION ANN layout (the
    LSH flavor below has its own). Losses decompose into the nprobe=1
    coarse miss (true neighbor lives in an unprobed cluster) and PQ
    quantization error; the ledger measures their combined effect."""
    exact = cosine_topk(emb, k, n_queries).select("query_id", "vec_id")
    ann = ivfpq_topk(emb, k, n_queries).select("query_id", "vec_id")
    hits = exact.join(ann, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_hits")
    )
    per_q = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return per_q.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("hits_at_k"),
        F.col("n_exact").cast("long").alias("k_exact"),
    )


def ann_recall(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES
) -> DataFrame:
    """Recall@k of the LSH-ANN path vs the exact brute-force baseline,
    per query (integer-exact: hit count + exact-k denominator). The
    quality ledger for the approximate path — at scale this runs on a
    sampled query set as a monitoring job."""
    exact = cosine_topk(emb, k, n_queries).select("query_id", "vec_id")
    ann = ann_lsh_topk(emb, k, n_queries).select("query_id", "vec_id")
    hits = exact.join(ann, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_hits")
    )
    per_q = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return per_q.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("hits_at_k"),
        F.col("n_exact").cast("long").alias("k_exact"),
    )


# Near-dup threshold is corpus-dependent; the driver's synthetic
# embeddings are near-orthogonal (max in-bucket cosine ≈0.45), so the
# gate exercises the operator at 0.3 — a real dedup run would use ~0.9.
DUP_COSINE_THRESHOLD = 0.3


def embedding_dup_pairs(
    emb: DataFrame, threshold: float = DUP_COSINE_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the embedding member of
    the dedup family (exact/MinHash/SimHash/ngram live in ops/dedup.py).

    Same LSH→verify shape as the text pipeline: candidates = pairs
    sharing a sign-random-projection bucket (never an all-pairs join),
    verify = exact cosine ≥ threshold. At 10^9+ vectors the bucket
    count (2^planes) is raised so buckets stay small; the verify cost
    is linear in candidate count."""
    sigs = lsh_signatures(emb)
    base = emb.join(sigs, "vec_id").select("vec_id", "embedding", "bucket")
    a = base.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
    )
    b = base.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
    )
    pairs = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        pairs.select("vec_a", "vec_b", F.round(cos, 4).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, qe): ×10^4 fixed-point, offset positive (int64)."""
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: (F.round(x.cast("double") * IVF_SCALE) + IVF_OFFSET).cast("long"),
        ).alias("qe"),
    )


def _assign(qe: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per vector (squared-L2 in int64, cid tie-break).
    cent is K rows — broadcast, so assignment is a narrow map pass."""
    dist = F.aggregate(
        F.zip_with("qe", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    j = qe.crossJoin(F.broadcast(cent)).select("vec_id", "qe", "cid", dist.alias("dist"))
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "qe", "cid")
    )


def ivf_centroids(emb: DataFrame, k: int = IVF_K, iters: int = IVF_ITERS) -> DataFrame:
    """Fixed-point k-means coarse quantizer → (cid, cvec array<long>).

    Init: the first k vectors by vec_id. Update: element-wise integer
    mean (sum div count — positive by construction, so Spark's
    truncating div ≡ DuckDB's floor div). Empty clusters keep their
    previous centroid. Every iteration is one broadcast join + one
    groupBy — the same shape at 10^9 vectors."""
    return _kmeans(_quantized(emb), k, iters)


def _kmeans(qe: DataFrame, k: int, iters: int) -> DataFrame:
    """Fixed-point Lloyd iterations over a (vec_id, qe array<long>)
    relation (the :func:`ivf_centroids` kernel, reused per PQ
    subspace)."""
    cent = qe.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("qe").alias("cvec")
    )
    for _ in range(iters):
        a = _assign(qe, cent)
        upd = (
            a.select("cid", F.posexplode("qe").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .withColumn("m", F.expr("s div n"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda x: x["m"],
                ).alias("newvec")
            )
        )
        # both sides are K rows, but only the optimizer's statistics
        # know that — an explicit broadcast stops the K×K update join
        # from planning as a SortMergeJoin with its two exchanges
        cent = cent.join(F.broadcast(upd), "cid", "left").select(
            "cid", F.coalesce("newvec", "cvec").alias("cvec")
        )
    return cent


def ivf_assignments(emb: DataFrame) -> DataFrame:
    """Final cluster assignment (the IVF partition key at scale)."""
    return _assign(_quantized(emb), ivf_centroids(emb)).select(
        "vec_id", F.col("cid").cast("int").alias("cid")
    )


SEM_TAU_4DP = "0.3"  # 4dp cosine threshold compared as a rounded literal


def semantic_dedup_survivors(emb: DataFrame, tau_4dp: str = SEM_TAU_4DP) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540 — re-derived from the
    published method): semantic deduplication INSIDE k-means clusters —
    pairwise cosine is computed only among members of the same coarse
    cluster, and of every pair above the threshold the lower vec_id
    survives (the paper keeps one arbitrary member; lowest-id is the
    deterministic choice). Output: the surviving (vec_id, cid) set.

    Why clusters: all-pairs cosine is O(n²); SemDeDup's observation is
    that semantic near-dups co-locate under a coarse quantizer, so the
    pair work is Σ |cluster|² — bounded by the cluster granularity (at
    10^9 vectors raise IVF_K so clusters stay ~10³; the same knob the
    IVF index already owns). Reuses :func:`ivf_assignments` — the dedup
    rides the retrieval index's own clustering, as in the paper.

    Cross-engine: the comparison is on the 4dp-ROUNDED cosine against
    a literal threshold — both engines round the same double, then
    compare equal integers-in-decimal."""
    asg = ivf_assignments(emb)
    # base feeds three legs (pair sides a/b and the final anti-join);
    # without materialization each leg re-runs the iterative k-means
    # assignment chain (ADVICE r3). localCheckpoint stores the
    # assignment once; blocks are GC'd when the result is dropped.
    base = (
        emb.select("vec_id", "embedding")
        .join(asg, "vec_id")
        .localCheckpoint(eager=True)
    )
    a = base.select(
        "cid", F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    b = base.select(
        F.col("cid").alias("cid2"), F.col("vec_id").alias("b"),
        F.col("embedding").alias("eb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (
        _norm(F.col("ea")) * _norm(F.col("eb"))
    )
    dominated = (
        a.join(b, (F.col("cid") == F.col("cid2")) & (F.col("a") < F.col("b")))
        .where(F.round(cos, 4) >= F.lit(float(tau_4dp)))
        .select(F.col("b").alias("vec_id"))
        .distinct()
    )
    return (
        base.join(dominated, "vec_id", "left_anti")
        .select("vec_id", "cid")
    )


PQ_M = 4       # subspaces (DIM/PQ_M dims each)
PQ_K = 4       # codebook size per subspace
PQ_ITERS = 2   # fixed Lloyd iterations per sub-codebook (oracle-twinned)


def pq_codes(emb: DataFrame, m: int = PQ_M, k: int = PQ_K,
             iters: int = PQ_ITERS) -> DataFrame:
    """Product quantization (Jégou et al., TPAMI 2011 "Product
    quantization for nearest neighbor search" — method from the paper):
    split each vector into ``m`` subvectors, learn an independent
    fixed-point k-means codebook per subspace (:func:`_kmeans`, same
    integer-exact kernel as IVF), and emit each vector's code word —
    (vec_id, codes array<int> of length m, err = Σ squared-L2 to the
    chosen codewords). codes compress a vector to m·log2(k) bits; err
    is the exact integer reconstruction error, the quality number a
    pipeline monitors when picking m/k.

    Scale shape: training is m driver-looped k-means (at 100 TB you
    train on a sample — the loop is over m=4, not over data); encoding
    is ONE pass — slices explode to (vec_id, sub, sqe), the m·k
    codebook rows broadcast, nearest-per-(vec,sub) is a window, and
    codes reassemble in a single groupBy."""
    ds = DIM // m
    qe = _quantized(emb)
    books = [
        _kmeans(
            qe.select("vec_id", F.slice("qe", j * ds + 1, ds).alias("qe")),
            k, iters,
        ).select(F.lit(j).alias("sub"), "cid", "cvec")
        for j in range(m)
    ]
    allbooks = books[0]
    for b in books[1:]:
        allbooks = allbooks.unionByName(b)
    subs = qe.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("qe", j * ds + 1, ds) for j in range(m)])
        ).alias("sub", "sqe"),
    )
    dist = F.aggregate(
        F.zip_with("sqe", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    j = subs.join(F.broadcast(allbooks), "sub").select(
        "vec_id", "sub", "cid", dist.alias("dist")
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("dist"), F.asc("cid"))
    chosen = j.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return chosen.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cid"))),
            lambda x: x["cid"].cast("int"),
        ).alias("codes"),
        F.sum("dist").cast("long").alias("err"),
    )


def pq_codes_flat(emb: DataFrame, m: int = PQ_M, k: int = PQ_K,
                  iters: int = PQ_ITERS) -> DataFrame:
    """Gate-shaped :func:`pq_codes`: ``codes`` flattened to a
    '-'-joined string so every output column is a scalar the driver's
    canonicalizer can hash (its pandas lexsort cannot factorize array
    cells). Values are byte-for-byte the same codes — only the column
    type changes; the composition paths (:func:`ivfpq_topk`,
    :func:`semantic_dedup_survivors`) keep the array form."""
    return pq_codes(emb, m=m, k=k, iters=iters).select(
        "vec_id",
        F.concat_ws(
            "-", F.transform("codes", lambda c: c.cast("string"))
        ).alias("codes"),
        "err",
    )


def pq_adc_topk(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES,
    m: int = PQ_M, kc: int = PQ_K, iters: int = PQ_ITERS,
) -> DataFrame:
    """PQ asymmetric distance computation (ADC, Jégou TPAMI 2011 §III):
    rank the database by Σ_j ‖q_subj − codeword(j, codes_v[j])‖² — the
    query stays exact, database vectors are read ONLY through their
    m·log2(k)-bit codes. This is the query path of a PQ index: at
    100 TB the scan side touches codes (4 bytes/vec here), never the
    raw vectors.

    Plan shape: the per-query distance table (n_queries·m·k rows —
    constant-sized) is built by one broadcast cross join and broadcast
    back; the database side explodes codes to (vec_id, sub, cid), joins
    the table, and aggregates — one narrow pass + one groupBy shuffle
    on (query_id, vec_id), then window top-k. Integer-exact, so ranks
    are deterministic."""
    ds = DIM // m
    qe = _quantized(emb)
    books = [
        _kmeans(
            qe.select("vec_id", F.slice("qe", j * ds + 1, ds).alias("qe")),
            kc, iters,
        ).select(F.lit(j).alias("sub"), "cid", "cvec")
        for j in range(m)
    ]
    allbooks = books[0]
    for b in books[1:]:
        allbooks = allbooks.unionByName(b)
    qsubs = qe.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(
            F.array(*[F.slice("qe", j * ds + 1, ds) for j in range(m)])
        ).alias("sub", "sqe"),
    )
    dist = F.aggregate(
        F.zip_with("sqe", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dtable = qsubs.join(F.broadcast(allbooks), "sub").select(
        "query_id", "sub", "cid", dist.alias("d")
    )
    vcodes = pq_codes(emb, m=m, k=kc, iters=iters).select(
        "vec_id", F.posexplode("codes").alias("sub", "cid")
    )
    adc = (
        vcodes.join(F.broadcast(dtable), ["sub", "cid"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist",
                F.col("rank").cast("int").alias("rank"))
    )


def _adc_rank(
    emb: DataFrame, cand: DataFrame, k: int, n_queries: int,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Rank candidate (query_id, vec_id[, *keep]) pairs by PQ
    asymmetric distance: per-query distance table built from the
    per-subspace codebooks (broadcast, constant-sized), candidates'
    codes joined against it, summed per pair, window top-k. Shared by
    :func:`ivfpq_topk` and :func:`filtered_ann_topk` — the candidate
    generator is the only thing that differs between probe flavors."""
    ds = DIM // PQ_M
    qe = _quantized(emb)
    books = [
        _kmeans(
            qe.select("vec_id", F.slice("qe", j * ds + 1, ds).alias("qe")),
            PQ_K, PQ_ITERS,
        ).select(F.lit(j).alias("sub"), "cid", "cvec")
        for j in range(PQ_M)
    ]
    allbooks = books[0]
    for b in books[1:]:
        allbooks = allbooks.unionByName(b)
    qsubs = qe.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(
            F.array(*[F.slice("qe", j * ds + 1, ds) for j in range(PQ_M)])
        ).alias("sub", "sqe"),
    )
    dist = F.aggregate(
        F.zip_with("sqe", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dtable = qsubs.join(F.broadcast(allbooks), "sub").select(
        "query_id", "sub", "cid", dist.alias("d")
    )
    vcodes = pq_codes(emb).select(
        "vec_id", F.posexplode("codes").alias("sub", "cid")
    )
    adc = (
        cand.join(vcodes, "vec_id")
        .join(F.broadcast(dtable), ["query_id", "sub", "cid"])
        .groupBy("query_id", "vec_id", *keep)
        .agg(F.sum("d").cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", *keep, "adc_dist",
                F.col("rank").cast("int").alias("rank"))
    )


def ivfpq_topk(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES,
) -> DataFrame:
    """IVF-PQ (the production 100 TB ANN layout): coarse IVF probe
    (nprobe=1 — scan 1/K of the corpus) then PQ asymmetric-distance
    ranking INSIDE the probed cluster — the scan side reads each
    candidate's cluster id + m·log2(k)-bit code, never raw vectors.
    Simplification vs Jégou §IV: codes quantize raw vectors, not
    coarse residuals (residual encoding is the production refinement;
    raw-vector codes keep every stage integer-exact and
    oracle-checkable). Composes :func:`ivf_assignments` and the
    :func:`_adc_rank` machinery — one broadcast distance table, one
    (query_id, vec_id) groupBy, window top-k."""
    assign = ivf_assignments(emb)
    qclus = assign.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("cid").alias("qcid")
    )
    # prune to the probed cluster FIRST (candidates = 1/K of the corpus
    # per query), THEN join the broadcast distance table — order matters
    # at scale: distance rows are only materialized for survivors
    cand = (
        assign.join(F.broadcast(qclus), F.col("cid") == F.col("qcid"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    return _adc_rank(emb, cand, k, n_queries)


def filtered_ann_topk(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES,
) -> DataFrame:
    """Metadata-PRE-filtered IVF-PQ ANN — the scale path for
    :func:`filtered_cosine_topk` (ES kNN ``filter`` / FAISS IDSelector
    semantics on the production index layout): probe the query's coarse
    cluster (nprobe=1), restrict candidates to the query's ``label``
    class BEFORE the ADC top-k cut, then rank survivors through their
    m·log2(k)-bit codes. Pre-filter ordering is the point: the label
    predicate lands on the (cid, label) candidate scan — at scale a
    partition prune on a label-partitioned codes table — so distance
    rows only materialize for allowed pairs, and the cut always returns
    k in-class neighbors where post-filtering could starve below k.
    Exactness stand-in retired; :func:`filtered_ann_recall` is the
    quality ledger vs the exact path."""
    assign = ivf_assignments(emb)
    labels = emb.select("vec_id", "label")
    qmeta = (
        assign.join(labels, "vec_id")
        .where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"),
                F.col("cid").alias("qcid"),
                F.col("label").alias("qlabel"))
    )
    cand = (
        assign.join(labels, "vec_id")
        .join(
            F.broadcast(qmeta),
            (F.col("cid") == F.col("qcid"))
            & (F.col("label") == F.col("qlabel"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "label")
    )
    return _adc_rank(emb, cand, k, n_queries, keep=("label",))


def filtered_ann_recall(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES
) -> DataFrame:
    """Recall@k of the pre-filtered IVF-PQ path vs the exact filtered
    kNN baseline, per query — the ledger quantifying what swapping the
    exactness stand-in for the ANN leg costs (losses = nprobe=1 coarse
    miss within the label class + PQ quantization error)."""
    exact = filtered_cosine_topk(emb, k, n_queries).select("query_id", "vec_id")
    ann = filtered_ann_topk(emb, k, n_queries).select("query_id", "vec_id")
    hits = exact.join(ann, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_hits")
    )
    per_q = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return per_q.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("hits_at_k"),
        F.col("n_exact").cast("long").alias("k_exact"),
    )


def ann_ivf_topk(
    emb: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES
) -> DataFrame:
    """IVF ANN: probe the query's cluster (nprobe=1), exact cosine
    re-rank inside it — reads 1/K of the corpus per query at scale."""
    base = emb.join(ivf_assignments(emb), "vec_id")
    qs = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("cid").alias("qcid"),
    )
    joined = base.join(F.broadcast(qs), F.col("cid") == F.col("qcid")).where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    scored = joined.select("query_id", "vec_id", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


# --------------------------------------------------------------- oracle SQL

_DUCK_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_DUCK_NORM = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def _duck_signature(vec: str, dim: int = 64) -> str:
    bits = []
    for j in range(N_PLANES):
        terms = [
            f"CAST({vec}[{i + 1}] AS DOUBLE) * ({_plane_coef(i, j)})"
            for i in range(dim)
            if _plane_coef(i, j) != 0
        ]
        bits.append(f"(CASE WHEN ({' + '.join(terms)}) > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


_COS = (
    _DUCK_DOT.format(a="c.embedding", b="q.q")
    + " / ("
    + _DUCK_NORM.format(a="c.embedding")
    + " * "
    + _DUCK_NORM.format(a="q.q")
    + ")"
)

def _duck_ivf_ctes(iters: int = IVF_ITERS, k: int = IVF_K) -> str:
    """Chained-CTE twin of the fixed-point k-means: qe → c0 →
    (a_i → u_i → c_{i+1})×iters. All integer arithmetic; positive by
    construction so // matches Spark's div."""
    sq = (
        "list_sum(list_transform(generate_series(1, {d}), "
        "i -> (q.qe[i] - c.cvec[i]) * (q.qe[i] - c.cvec[i])))"
    ).format(d=DIM)
    ctes = [
        f"""qe AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * {IVF_SCALE}) AS BIGINT) + {IVF_OFFSET}) AS qe
  FROM embeddings
)""",
        f"c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, qe AS cvec FROM qe WHERE vec_id < {k})",
    ]
    for i in range(iters):
        ctes.append(
            f"""a{i} AS (
  SELECT vec_id, qe, cid FROM (
    SELECT q.vec_id, q.qe, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {sq} ASC, c.cid ASC) AS rn
    FROM qe q CROSS JOIN c{i} c
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""u{i} AS (
  SELECT cid, list(m ORDER BY pos) AS newvec FROM (
    SELECT cid, pos, CAST(CAST(sum(val) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS m
    FROM (SELECT cid, unnest(qe) AS val,
                 unnest(generate_series(1, len(qe))) AS pos FROM a{i})
    GROUP BY cid, pos
  ) GROUP BY cid
)"""
        )
        ctes.append(
            f"""c{i + 1} AS (
  SELECT c.cid, coalesce(u.newvec, c.cvec) AS cvec
  FROM c{i} c LEFT JOIN u{i} u USING (cid)
)"""
        )
    # final assignment against the trained centroids
    ctes.append(
        f"""afin AS (
  SELECT vec_id, cid FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {sq} ASC, c.cid ASC) AS rn
    FROM qe q CROSS JOIN c{iters} c
  ) WHERE rn = 1
)"""
    )
    return ",\n".join(ctes)


def _duck_pq_ctes(m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS,
                  skip_qe: bool = False) -> str:
    """Chained-CTE twin of :func:`pq_codes`: one independent fixed-point
    k-means per subspace over the sliced quantized vectors (prefixed
    CTE names p{j}_*), final assignment keeps the chosen distance so
    the reconstruction error is checkable too. ``skip_qe`` omits the
    shared ``qe`` CTE when composing with :func:`_duck_ivf_ctes`
    (which emits an identical one)."""
    ds = DIM // m
    ctes = [] if skip_qe else [
        f"""qe AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * {IVF_SCALE}) AS BIGINT) + {IVF_OFFSET}) AS qe
  FROM embeddings
)"""
    ]
    for j in range(m):
        p = f"p{j}"
        lo, hi = j * ds + 1, (j + 1) * ds
        sq = (
            f"list_sum(list_transform(generate_series(1, {ds}), "
            f"i -> (q.qe[i] - c.cvec[i]) * (q.qe[i] - c.cvec[i])))"
        )
        ctes.append(
            f"{p}_qe AS (SELECT vec_id, qe[{lo}:{hi}] AS qe FROM qe)"
        )
        ctes.append(
            f"{p}_c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, qe AS cvec "
            f"FROM {p}_qe WHERE vec_id < {k})"
        )
        for i in range(iters):
            ctes.append(
                f"""{p}_a{i} AS (
  SELECT vec_id, qe, cid FROM (
    SELECT q.vec_id, q.qe, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {sq} ASC, c.cid ASC) AS rn
    FROM {p}_qe q CROSS JOIN {p}_c{i} c
  ) WHERE rn = 1
)"""
            )
            ctes.append(
                f"""{p}_u{i} AS (
  SELECT cid, list(mval ORDER BY pos) AS newvec FROM (
    SELECT cid, pos, CAST(CAST(sum(val) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mval
    FROM (SELECT cid, unnest(qe) AS val,
                 unnest(generate_series(1, len(qe))) AS pos FROM {p}_a{i})
    GROUP BY cid, pos
  ) GROUP BY cid
)"""
            )
            ctes.append(
                f"""{p}_c{i + 1} AS (
  SELECT c.cid, coalesce(u.newvec, c.cvec) AS cvec
  FROM {p}_c{i} c LEFT JOIN {p}_u{i} u USING (cid)
)"""
            )
        ctes.append(
            f"""{p}_fin AS (
  SELECT vec_id, cid, dist FROM (
    SELECT q.vec_id, c.cid, {sq} AS dist,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {sq} ASC, c.cid ASC) AS rn
    FROM {p}_qe q CROSS JOIN {p}_c{iters} c
  ) WHERE rn = 1
)"""
        )
    return ",\n".join(ctes)


_PQ_SQL = (
    "WITH "
    + _duck_pq_ctes()
    + f"""
SELECT p0.vec_id,
       concat_ws('-', {", ".join(f"CAST(p{j}.cid AS VARCHAR)" for j in range(PQ_M))}) AS codes,
       CAST({" + ".join(f"p{j}.dist" for j in range(PQ_M))} AS BIGINT) AS err
FROM {" JOIN ".join(["p0_fin p0"] + [f"p{j}_fin p{j} USING (vec_id)" for j in range(1, PQ_M)])}
"""
)


def _duck_dt_ctes(m: int = PQ_M, iters: int = PQ_ITERS) -> list[str]:
    """Per-query × per-codeword ADC distance-table CTEs (dt0..dt{m-1}),
    shared by the ADC and IVF-PQ twins."""
    ds = DIM // m
    out = []
    for j in range(m):
        lo, hi = j * ds + 1, (j + 1) * ds
        sq = (
            f"list_sum(list_transform(generate_series(1, {ds}), "
            f"i -> (q.sq[i] - c.cvec[i]) * (q.sq[i] - c.cvec[i])))"
        )
        out.append(
            f"""dt{j} AS (
  SELECT q.query_id, c.cid, {sq} AS d
  FROM (SELECT vec_id AS query_id, qe[{lo}:{hi}] AS sq FROM qe
        WHERE vec_id < {N_QUERIES}) q
  CROSS JOIN p{j}_c{iters} c
)"""
        )
    return out


def _duck_adc_sql(m: int = PQ_M, iters: int = PQ_ITERS) -> str:
    """ADC twin: per-query × per-codeword distance tables from the same
    per-subspace codebook CTEs, summed over the database's chosen
    codes."""
    parts = [_duck_pq_ctes(m=m, iters=iters)] + _duck_dt_ctes(m, iters)
    dsum = " + ".join(f"d{j}.d" for j in range(m))
    joins = "\n  ".join(
        f"JOIN dt{j} d{j} ON d{j}.query_id = q.query_id AND d{j}.cid = p{j}.cid"
        for j in range(m)
    )
    vjoins = " JOIN ".join(
        ["p0_fin p0"] + [f"p{j}_fin p{j} USING (vec_id)" for j in range(1, m)]
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
adc AS (
  SELECT q.query_id, p0.vec_id, CAST({dsum} AS BIGINT) AS adc_dist
  FROM {vjoins}
  CROSS JOIN (SELECT DISTINCT query_id FROM dt0) q
  {joins}
  WHERE p0.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, vec_id ASC) AS rank
  FROM adc
)
SELECT query_id, vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
"""
    )


def _duck_ivfpq_sql(m: int = PQ_M, iters: int = PQ_ITERS,
                    n_queries: int = N_QUERIES, topk: int = TOPK,
                    filtered: bool = False) -> str:
    """IVF-PQ twin: coarse k-means assignment (afin, from
    :func:`_duck_ivf_ctes`) restricts candidates to the query's cluster;
    ADC distance tables rank them through their codes. ``n_queries`` /
    ``topk`` parameterize the query set and cut (the hybrid-RRF ANN leg
    uses a single query at pool depth). ``filtered`` adds the label
    pre-filter (twin of :func:`filtered_ann_topk`): candidates must
    share the query's label BEFORE the cut, and ``label`` rides the
    output."""
    parts = (
        [_duck_ivf_ctes(), _duck_pq_ctes(m=m, iters=iters, skip_qe=True)]
        + _duck_dt_ctes(m, iters)
    )
    dsum = " + ".join(f"d{j}.d" for j in range(m))
    joins = "\n  ".join(
        f"JOIN dt{j} d{j} ON d{j}.query_id = q.query_id AND d{j}.cid = p{j}.cid"
        for j in range(m)
    )
    vjoins = " JOIN ".join(
        ["p0_fin p0"] + [f"p{j}_fin p{j} USING (vec_id)" for j in range(1, m)]
    )
    if filtered:
        qmeta = f"""qclus AS (
  SELECT a.vec_id AS query_id, a.cid AS qcid, e.label AS qlabel
  FROM afin a JOIN embeddings e ON a.vec_id = e.vec_id
  WHERE a.vec_id < {n_queries})"""
        label_join = "JOIN embeddings el ON el.vec_id = p0.vec_id"
        label_pred = " AND el.label = q.qlabel"
        label_col = "el.label, "
        label_out = "label, "
    else:
        qmeta = (f"qclus AS (SELECT vec_id AS query_id, cid AS qcid FROM afin\n"
                 f"          WHERE vec_id < {n_queries})")
        label_join = ""
        label_pred = ""
        label_col = ""
        label_out = ""
    return (
        "WITH "
        + ",\n".join(p for p in parts if p)
        + f""",
{qmeta},
adc AS (
  SELECT q.query_id, p0.vec_id, {label_col}CAST({dsum} AS BIGINT) AS adc_dist
  FROM {vjoins}
  JOIN afin a USING (vec_id)
  {label_join}
  JOIN qclus q ON a.cid = q.qcid AND p0.vec_id <> q.query_id{label_pred}
  {joins}
),
ranked AS (
  SELECT query_id, vec_id, {label_out}adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, vec_id ASC) AS rank
  FROM adc
)
SELECT query_id, vec_id, {label_out}adc_dist, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {topk}
"""
    )


ORACLE_SQL = {
    "sim_pq_codes": _PQ_SQL,
    "sim_pq_adc_topk": _duck_adc_sql(),
    "sim_ivfpq_topk": _duck_ivfpq_sql(),
    "sim_cosine_topk": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id, round({_COS}, 4) AS cosine
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
""",
    "sim_filtered_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q, label AS qlabel
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, c.vec_id, c.label, round({_COS}, 4) AS cosine
  FROM embeddings c JOIN q
    ON c.vec_id <> q.query_id AND c.label = q.qlabel
), ranked AS (
  SELECT query_id, vec_id, label, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, label, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
""",
    "sim_lsh_signatures": f"""
SELECT vec_id, CAST({_duck_signature('embedding')} AS INTEGER) AS bucket
FROM embeddings
""",
    "sim_ann_lsh_topk": f"""
WITH sigs AS (
  SELECT vec_id, {_duck_signature('embedding')} AS bucket FROM embeddings
),
base AS (
  SELECT e.vec_id, e.embedding, s.bucket
  FROM embeddings e JOIN sigs s ON e.vec_id = s.vec_id
),
q AS (SELECT vec_id AS query_id, embedding AS q, bucket AS qbucket
      FROM base WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id, round({_COS}, 4) AS cosine
  FROM base c JOIN q ON c.bucket = q.qbucket
  WHERE c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
""",
    "sim_ann_recall": "", # filled below (composes the two top-k oracles)
    "dedup_embedding_pairs": f"""
WITH sigs AS (
  SELECT vec_id, {_duck_signature('embedding')} AS bucket FROM embeddings
),
base AS (
  SELECT e.vec_id, e.embedding, s.bucket
  FROM embeddings e JOIN sigs s ON e.vec_id = s.vec_id
),
pairs AS (
  SELECT a.vec_id AS vec_a, a.embedding AS ea,
         b.vec_id AS vec_b, b.embedding AS eb
  FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       round({_DUCK_DOT.format(a='ea', b='eb')}
             / ({_DUCK_NORM.format(a='ea')} * {_DUCK_NORM.format(a='eb')}), 4) AS cosine
FROM pairs
WHERE round({_DUCK_DOT.format(a='ea', b='eb')}
            / ({_DUCK_NORM.format(a='ea')} * {_DUCK_NORM.format(a='eb')}), 4) >= {DUP_COSINE_THRESHOLD}
""",
    "sim_ivf_assignments": f"""
WITH {_duck_ivf_ctes()}
SELECT vec_id, CAST(cid AS INTEGER) AS cid FROM afin
""",
    "dedup_semantic_survivors": f"""
WITH {_duck_ivf_ctes()},
base AS (
  SELECT e.vec_id, e.embedding, CAST(a.cid AS INTEGER) AS cid
  FROM embeddings e JOIN afin a USING (vec_id)
),
dominated AS (
  SELECT DISTINCT p2.vec_id
  FROM base p1 JOIN base p2 ON p1.cid = p2.cid AND p1.vec_id < p2.vec_id
  WHERE round({_DUCK_DOT.format(a="p1.embedding", b="p2.embedding")}
        / ({_DUCK_NORM.format(a="p1.embedding")}
           * {_DUCK_NORM.format(a="p2.embedding")}), 4) >= {SEM_TAU_4DP}
)
SELECT b.vec_id, b.cid FROM base b
ANTI JOIN dominated d ON d.vec_id = b.vec_id
""",
    "sim_ann_ivf_topk": f"""
WITH {_duck_ivf_ctes()},
base AS (
  SELECT e.vec_id, e.embedding, a.cid
  FROM embeddings e JOIN afin a ON e.vec_id = a.vec_id
),
q AS (SELECT vec_id AS query_id, embedding AS q, cid AS qcid
      FROM base WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id, round({_COS}, 4) AS cosine
  FROM base c JOIN q ON c.cid = q.qcid
  WHERE c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TOPK}
""",
}

ORACLE_SQL["sim_mmr_topk"] = oracle_sql_mmr()

ORACLE_SQL["sim_ivfpq_recall"] = f"""
WITH exact AS ({ORACLE_SQL['sim_cosine_topk']}),
ann AS ({ORACLE_SQL['sim_ivfpq_topk']}),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN ann a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
  GROUP BY e.query_id
),
per_q AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id)
SELECT p.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS hits_at_k,
       CAST(p.n_exact AS BIGINT) AS k_exact
FROM per_q p LEFT JOIN hits h USING (query_id)
"""

ORACLE_SQL["sim_filtered_ann_topk"] = _duck_ivfpq_sql(filtered=True)

ORACLE_SQL["sim_filtered_ann_recall"] = f"""
WITH exact AS ({ORACLE_SQL['sim_filtered_topk']}),
ann AS ({ORACLE_SQL['sim_filtered_ann_topk']}),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN ann a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
  GROUP BY e.query_id
),
per_q AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id)
SELECT p.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS hits_at_k,
       CAST(p.n_exact AS BIGINT) AS k_exact
FROM per_q p LEFT JOIN hits h USING (query_id)
"""

ORACLE_SQL["sim_ann_recall"] = f"""
WITH exact AS ({ORACLE_SQL['sim_cosine_topk']}),
ann AS ({ORACLE_SQL['sim_ann_lsh_topk']}),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN ann a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
  GROUP BY e.query_id
),
per_q AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id)
SELECT p.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS hits_at_k,
       CAST(p.n_exact AS BIGINT) AS k_exact
FROM per_q p LEFT JOIN hits h USING (query_id)
"""

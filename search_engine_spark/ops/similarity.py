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
  (An IVF variant — k-means coarse quantizer — would need iterative
  centroid training; LSH gives the same read-reduction without
  training state, which is why it's the default here.)

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

ORACLE_SQL = {
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
}

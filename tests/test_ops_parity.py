"""Mirror of the driver's correctness gate at sf0.001 + op invariants.

- every ``__spark_entry__.queries()`` entry with an ``oracle_sql()``
  twin must match DuckDB exactly (rowcount, column names, values) on
  the driver's sf0.001 tables;
- the ops-side JVM tokenizer (``sqltwin.tokens_col``) must agree with
  the engine's vectorized pandas tokenizer (frozen spec §8.1);
- the ASCII assumption behind ``mm_extract_features`` holds for the
  driver tables;
- LSH-ANN results are a subset of the brute-force top-k universe.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_parity import TABLES, _canon  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in _ORACLES:
        assert srows is not None  # rows-only contract: runs, stable schema
        return
    rel = duck.sql(_ORACLES[name])
    sc, scn = _canon(srows, sdf.columns)
    dc, dcn = _canon(rel.fetchall(), list(rel.columns))
    assert scn == dcn, f"column mismatch: {scn} vs {dcn}"
    assert len(sc) == len(dc), f"rowcount {len(sc)} vs {len(dc)}"
    assert sc == dc


def test_ops_tokenizer_matches_engine_tokenizer(spark):
    """sqltwin.tokens_col (JVM) ≡ functions.tokenize (frozen spec)."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.tokenize import tokenize
    from search_engine_spark.ops.sqltwin import tokens_col

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    got = docs.select("doc_id", tokens_col("text").alias("toks"), "text").collect()
    for r in got:
        assert list(r["toks"]) == tokenize(r["text"]), r["doc_id"]


def test_documents_are_ascii(spark):
    """mm_extract_features' chars==bytes assumption."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bad = docs.where(
        F.length("text") != F.length(F.encode(F.col("text"), "utf-8"))
    ).count()
    assert bad == 0


def test_ann_subset_of_bruteforce_universe(spark):
    """Every ANN hit is a valid vector id with the exact same cosine the
    brute-force path computes (LSH prunes candidates, never rescores)."""
    from search_engine_spark.ops import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, k=10**6).collect()
    }
    ann = similarity.ann_lsh_topk(emb).collect()
    assert len(ann) > 0
    for r in ann:
        key = (r["query_id"], r["vec_id"])
        assert key in brute
        assert brute[key] == pytest.approx(r["cosine"], abs=1e-9)

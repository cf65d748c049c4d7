"""Checkpoint/resume: a build killed mid-way and resumed must produce an
identical index, and lineage must show the completed partitions were
skipped (north_rule; FIXTURES.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.build import build_index


def _index_fingerprint(spark, ix: str) -> dict:
    """Order-independent content digests of every index table."""
    out = {}
    for name, keycols in [
        ("postings", ["part_id", "term", "doc_id", "tf", "dl"]),
        ("docs", ["doc_id", "repo", "path", "commit", "lang", "content_sha"]),
        ("terms", ["term", "df", "idf"]),
        ("blocks", ["bucket", "term", "salt", "block_id", "n", "first_doc",
                    "last_doc", "doc_gaps", "tfs", "dls", "max_tf", "min_dl"]),
        ("edges", ["src", "dst"]),
    ]:
        df = spark.read.parquet(f"{ix}/{name}")
        row = df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*keycols)).alias("digest"),
        ).collect()[0]
        out[name] = (row["n"], row["digest"])
    return out


def test_kill_and_resume_identical(spark, fixture_dir, tmp_path_factory):
    corpus = str(fixture_dir / "corpus.parquet")
    cfg = EngineConfig(build_partitions=8, build_waves=4)

    clean = tmp_path_factory.mktemp("ix_clean")
    build_index(spark, corpus, str(clean), cfg)

    killed = tmp_path_factory.mktemp("ix_killed")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus, str(killed), cfg, fail_after_waves=2)

    # after the kill: some postings partitions done, no final index yet
    ckpt = spark.read.parquet(f"{killed}/_checkpoint")
    done_parts = {
        r["partition_id"]
        for r in ckpt.where(
            (F.col("stage") == "postings") & (F.col("status") == "done")
        ).collect()
    }
    assert 0 < len(done_parts) < cfg.build_partitions

    summary = build_index(spark, corpus, str(killed), cfg, resume=True)
    assert summary["partitions_skipped"] == len(done_parts)
    assert summary["partitions_built"] == cfg.build_partitions - len(done_parts)

    assert _index_fingerprint(spark, str(killed)) == _index_fingerprint(spark, str(clean))

    # lineage: resumed partitions recorded under a later attempt
    latest = spark.read.parquet(f"{killed}/_checkpoint")
    attempts = {r["attempt"] for r in latest.where(F.col("stage") == "postings").collect()}
    assert len(attempts) == 2


def test_resume_noop_when_complete(spark, fixture_dir, tmp_path_factory):
    corpus = str(fixture_dir / "corpus.parquet")
    cfg = EngineConfig(build_partitions=8, build_waves=4)
    ix = tmp_path_factory.mktemp("ix_noop")
    build_index(spark, corpus, str(ix), cfg)
    before = _index_fingerprint(spark, str(ix))
    summary = build_index(spark, corpus, str(ix), cfg, resume=True)
    assert summary["partitions_built"] == 0
    assert summary["partitions_skipped"] == cfg.build_partitions
    assert _index_fingerprint(spark, str(ix)) == before

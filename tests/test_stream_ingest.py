"""Continuous ingest: a file-source stream feeding the segmented
incremental build must (a) bootstrap the base generation from the first
batch, (b) ingest later files as new generations, (c) never re-ingest
files the stream checkpoint already consumed, and (d) end up
query-identical to a batch build over the union corpus.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.build import build_index, read_stats
from search_engine_spark.plans.query import QueryEngine
from search_engine_spark.streaming.ingest import stream_ingest

REL_TOL = 1e-9
TIMEOUT_S = 600


def _drop_file(spark, df, tmp: Path, corpus_dir: Path, name: str) -> None:
    """Write df as ONE parquet file named ``name`` inside corpus_dir
    (file-source streams watch files, not Spark output directories)."""
    staging = tmp / f"_staging_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = next(staging.glob("part-*.parquet"))
    shutil.copy(part, corpus_dir / name)


@pytest.fixture(scope="module")
def stream_env(spark, fixture_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_ingest")
    corpus_dir = root / "corpus"
    corpus_dir.mkdir()
    full = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    paths = sorted(r["path"] for r in full.select("path").collect())
    base = full.where(F.col("path").isin(paths[:120]))
    delta = full.where(F.col("path").isin(paths[120:]))
    return root, corpus_dir, full, base, delta


def _run_drain(spark, corpus_dir, ix):
    q = stream_ingest(spark, str(corpus_dir), ix)
    assert q.awaitTermination(TIMEOUT_S), "stream did not drain in time"
    return q


def test_stream_ingest_end_to_end(spark, stream_env, fixture_queries):
    root, corpus_dir, full, base, delta = stream_env
    ix = str(root / "ix")

    # batch 0 bootstraps the base build
    _drop_file(spark, base, root, corpus_dir, "batch0.parquet")
    _run_drain(spark, corpus_dir, ix)
    assert read_stats(spark, ix)["n_docs"] == 120

    # batch 1 lands later -> its own generation; batch 0 not re-read
    _drop_file(spark, delta, root, corpus_dir, "batch1.parquet")
    _run_drain(spark, corpus_dir, ix)
    assert read_stats(spark, ix)["n_docs"] == 200
    gens = {r["gen"] for r in spark.read.parquet(f"{ix}/blocks")
            .select("gen").distinct().collect()}
    assert gens == {0, 1}

    # no new files -> no-op drain (checkpoint holds)
    docs_before = spark.read.parquet(f"{ix}/docs").count()
    _run_drain(spark, corpus_dir, ix)
    assert spark.read.parquet(f"{ix}/docs").count() == docs_before
    assert read_stats(spark, ix)["n_docs"] == 200

    # query-identical to a batch build over the union corpus
    ix_full = str(root / "ix_full")
    full.write.parquet(str(root / "union"))
    build_index(spark, str(root / "union"), ix_full)
    es, ef = QueryEngine(spark, ix), QueryEngine(spark, ix_full)
    sf_s, sf_f = read_stats(spark, ix), read_stats(spark, ix_full)
    assert sf_s["n_docs"] == sf_f["n_docs"]
    assert sf_s["avgdl"] == pytest.approx(sf_f["avgdl"], rel=REL_TOL)
    for q in fixture_queries[:4]:
        rs = es.bm25(q, k=10).collect()
        rf = ef.bm25(q, k=10).collect()
        assert [r["doc_id"] for r in rs] == [r["doc_id"] for r in rf], q
        for a, b in zip(rs, rf):
            assert a["score"] == pytest.approx(b["score"], rel=REL_TOL)


def test_ingest_batch_replay_is_idempotent(spark, stream_env):
    """If an epoch retries after a fully-committed ingest (driver died
    between the engine's commit and the stream's), the replay must
    degenerate to an empty extend: same docs, same stats, no dup gens
    with content."""
    from search_engine_spark.streaming.ingest import ingest_batch

    root, corpus_dir, full, base, delta = stream_env
    ix = str(root / "ix_replay")
    s1 = ingest_batch(spark, base, ix)
    assert s1["n_docs"] == 120
    s2 = ingest_batch(spark, base, ix)  # full replay of the same batch
    assert s2["docs_added"] == 0
    assert read_stats(spark, ix)["n_docs"] == 120
    docs = spark.read.parquet(f"{ix}/docs")
    assert docs.count() == docs.select("doc_id").distinct().count() == 120


def _prior_map(spark, ix):
    return {r["doc_id"]: r["score"]
            for r in spark.read.parquet(f"{ix}/prior").collect()}


def test_deferred_prior_extend_and_refresh(spark, stream_env, fixture_queries):
    """prior_refresh='defer' keeps extends O(delta): the landed prior is
    byte-identical to before the extend (stale-but-valid — queries
    left-join it and floor missing docs at 0.0), and refresh_prior()
    then converges to exactly what an always-refresh extend computes."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.build import refresh_prior
    from search_engine_spark.streaming.ingest import ingest_batch

    root, corpus_dir, full, base, delta = stream_env
    ix = str(root / "ix_defer")
    ingest_batch(spark, base, ix)  # bootstrap always builds the prior
    prior_before = _prior_map(spark, ix)
    assert prior_before

    s = ingest_batch(spark, delta, ix, EngineConfig(prior_refresh="defer"))
    assert s["docs_added"] == 80
    assert _prior_map(spark, ix) == prior_before  # untouched by the extend

    # queries still serve across all 200 docs while the prior is stale
    es = QueryEngine(spark, ix)
    assert es.bm25(fixture_queries[0], k=5).count() > 0

    out = refresh_prior(spark, ix)
    assert out["n_docs"] == 200
    caught_up = _prior_map(spark, ix)

    # ground truth: the same two batches with always-refresh extends
    ix_a = str(root / "ix_always")
    ingest_batch(spark, base, ix_a)
    ingest_batch(spark, delta, ix_a)
    expected = _prior_map(spark, ix_a)
    assert set(caught_up) == set(expected)
    for d, score in expected.items():
        assert caught_up[d] == pytest.approx(score, rel=REL_TOL)


def test_stream_prior_schedule(spark, stream_env):
    """prior_every_n_batches=3: the epoch-1 extend defers the graph pass
    (metrics record it; prior stays the bootstrap one)."""
    root, corpus_dir, full, base, delta = stream_env
    ix = str(root / "ix_sched")
    cdir = root / "corpus_sched"
    cdir.mkdir()
    _drop_file(spark, base, root, cdir, "b0.parquet")
    q = stream_ingest(spark, str(cdir), ix, prior_every_n_batches=3)
    assert q.awaitTermination(TIMEOUT_S)
    prior_boot = _prior_map(spark, ix)
    assert prior_boot  # bootstrap computes the prior regardless

    _drop_file(spark, delta, root, cdir, "b1.parquet")
    q = stream_ingest(spark, str(cdir), ix, prior_every_n_batches=3)
    assert q.awaitTermination(TIMEOUT_S)
    assert read_stats(spark, ix)["n_docs"] == 200
    assert _prior_map(spark, ix) == prior_boot  # epoch 1 deferred
    deferred = (
        spark.read.parquet(f"{ix}/_metrics")
        .where("stage = 'extend' and key = 'prior_deferred'")
        .collect()
    )
    assert [r["value"] for r in deferred] == [1.0]


def test_stream_auto_compact(spark, stream_env, fixture_queries):
    """auto_compact=True keeps a long-running ingest single-digit-
    segmented: once live generations exceed cfg.compact_max_generations
    the epoch's sink merges them back to gen 0, and queries still
    answer across the full corpus."""
    from search_engine_spark.config import EngineConfig

    root, corpus_dir, full, base, delta = stream_env
    ix = str(root / "ix_ac")
    cdir = root / "corpus_ac"
    cdir.mkdir()
    cfg = EngineConfig(compact_max_generations=1)
    _drop_file(spark, base, root, cdir, "b0.parquet")
    q = stream_ingest(spark, str(cdir), ix, cfg=cfg, auto_compact=True)
    assert q.awaitTermination(TIMEOUT_S)

    _drop_file(spark, delta, root, cdir, "b1.parquet")
    q = stream_ingest(spark, str(cdir), ix, cfg=cfg, auto_compact=True)
    assert q.awaitTermination(TIMEOUT_S)
    assert read_stats(spark, ix)["n_docs"] == 200
    gens = {r["gen"] for r in spark.read.parquet(f"{ix}/blocks")
            .select("gen").distinct().collect()}
    assert gens == {0}  # the extend's gen 1 was merged by the policy
    es = QueryEngine(spark, ix)
    assert es.bm25(fixture_queries[0], k=5).count() == 5


def test_stream_ingest_dedupes_across_batches(spark, stream_env):
    """A later file re-delivering already-indexed docs upsert-skips them
    (the reference's ON CONFLICT DO NOTHING sink on the streaming path)."""
    root, corpus_dir, full, base, delta = stream_env
    ix = str(root / "ix2")
    cdir = root / "corpus2"
    cdir.mkdir()
    _drop_file(spark, base, root, cdir, "b0.parquet")
    _run_drain(spark, cdir, ix)
    # delta + 30 docs that overlap the base batch
    overlap_paths = [r["path"] for r in base.select("path").limit(30).collect()]
    redelivery = delta.unionByName(full.where(F.col("path").isin(overlap_paths)))
    _drop_file(spark, redelivery, root, cdir, "b1.parquet")
    _run_drain(spark, cdir, ix)
    assert read_stats(spark, ix)["n_docs"] == 200
    # docs table has no duplicate doc_ids
    docs = spark.read.parquet(f"{ix}/docs")
    assert docs.count() == docs.select("doc_id").distinct().count() == 200

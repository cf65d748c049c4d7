"""Index integrity audit (plans/audit.py): a fresh build verifies
clean, tampering is detected, and delete→compact re-baselines lineage
so the audit stays a strict invariant across the index lifecycle."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.audit import verify_index
from search_engine_spark.plans.build import (
    build_index,
    compact_index,
    delete_docs,
    extend_index,
)


@pytest.fixture()
def ix(spark, fixture_dir, tmp_path):
    index_dir = str(tmp_path / "ix")
    build_index(spark, str(fixture_dir / "corpus.parquet"), index_dir)
    return index_dir


def test_fresh_build_verifies_clean(spark, ix):
    report = verify_index(spark, ix)
    assert report["ok"], report["mismatches"]
    assert all(report["checks"].values())
    assert report["n_docs"] == 200
    assert report["partitions_audited"] > 0


def test_tampered_docs_partition_detected(spark, ix):
    # drop one landed docs partition directory behind the engine's back
    docs_root = Path(ix) / "docs" / "gen=0"
    victim = sorted(p for p in docs_root.iterdir() if p.name.startswith("part_id="))[0]
    shutil.rmtree(victim)
    report = verify_index(spark, ix)
    assert not report["ok"]
    # missing docs break the count check (C2) and the digest check (C3)
    assert not report["checks"]["C2"]
    failing = {m["check"] for m in report["mismatches"]}
    assert "C2" in failing


def test_duplicated_postings_detected(spark, ix):
    # re-append one partition's postings (simulates a replayed write
    # landing in append mode instead of dynamic overwrite)
    post = spark.read.parquet(f"{ix}/postings")
    one = post.where(F.col("part_id") == post.select("part_id").first()[0])
    (
        one.write.mode("append").partitionBy("gen", "part_id")
        .parquet(f"{ix}/postings")
    )
    report = verify_index(spark, ix)
    assert not report["ok"]
    failing = {m["check"] for m in report["mismatches"]}
    assert "C4" in failing  # postings rows != lineage rows_out
    assert "C6" in failing  # blocks Σn != postings rows


def test_delete_then_compact_stays_verified(spark, ix):
    docs = spark.read.parquet(f"{ix}/docs")
    victims = [r["doc_id"] for r in docs.select("doc_id").limit(5).collect()]
    delete_docs(spark, ix, victims)
    # tombstones don't touch the tables: audit still clean
    report = verify_index(spark, ix)
    assert report["ok"], report["mismatches"]
    # compaction physically drops them AND re-baselines lineage
    summary = compact_index(spark, ix)
    assert summary["docs_deleted"] == 5
    report2 = verify_index(spark, ix)
    assert report2["ok"], report2["mismatches"]
    assert report2["n_docs"] == 195


def test_sidecar_orphans_detected_and_compact_cleans(spark, fixture_dir, tmp_path):
    from search_engine_spark.config import EngineConfig

    index_dir = str(tmp_path / "ix3")
    cfg = EngineConfig(store_positions=True, store_trigrams=True)
    build_index(spark, str(fixture_dir / "corpus.parquet"), index_dir, cfg)
    report = verify_index(spark, index_dir)
    assert report["ok"], report["mismatches"]
    assert report["checks"]["C8"]

    # delete + compact must physically rewrite BOTH sidecars: a
    # compaction that drops docs but leaves positions/trigrams rows for
    # the deleted doc_ids is exactly the orphan state C8 exists to catch
    docs = spark.read.parquet(f"{index_dir}/docs")
    victims = [r["doc_id"] for r in docs.select("doc_id").limit(3).collect()]
    delete_docs(spark, index_dir, victims)
    compact_index(spark, index_dir, cfg)
    report2 = verify_index(spark, index_dir)
    assert report2["ok"], report2["mismatches"]
    assert report2["n_docs"] == 197

    # tamper: append a trigram row for a doc_id no docs row has
    orphan = spark.createDataFrame(
        [(10**12, "zzz", 0, 0)], "doc_id long, tri string, gen int, part_id int"
    )
    (
        orphan.write.mode("append").partitionBy("gen", "part_id")
        .parquet(f"{index_dir}/trigrams")
    )
    report3 = verify_index(spark, index_dir)
    assert not report3["ok"]
    assert not report3["checks"]["C8"]
    assert any(m["check"] == "C8" and m["gen_part"] == "trigrams"
               for m in report3["mismatches"])


def test_extended_index_verifies_clean(spark, fixture_dir, tmp_path):
    index_dir = str(tmp_path / "ix2")
    full = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    paths = sorted(r["path"] for r in full.select("path").collect())
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    full.where(F.col("path").isin(paths[:120])).write.parquet(a)
    full.where(F.col("path").isin(paths[120:])).write.parquet(b)
    build_index(spark, a, index_dir)
    extend_index(spark, b, index_dir)
    report = verify_index(spark, index_dir)
    assert report["ok"], report["mismatches"]
    assert report["n_docs"] == 200


def test_index_segments_surface(spark, tmp_path):
    """ES _segments analogue: per-generation stats rows + the
    index-wide summary, consistent across build → extend → delete."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.audit import index_segments
    from search_engine_spark.plans.build import (
        build_index_df,
        delete_docs,
        extend_index_df,
    )

    rows = [
        ("r0", f"a/f{i}.py", "c0", "py", f"alpha beta doc number {i} words")
        for i in range(8)
    ]
    delta = [
        ("r1", "b/new.py", "c1", "py", "gamma delta fresh content here"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    ix = str(tmp_path / "ix")
    build_index_df(spark, corpus, ix,
                   EngineConfig(build_waves=1, build_partitions=4))
    segs = index_segments(spark, ix)
    gens = [s for s in segs if s["gen"] >= 0]
    summary = segs[-1]
    assert len(gens) == 1 and gens[0]["n_docs"] == 8
    assert gens[0]["n_postings"] == gens[0]["n_encoded_postings"] > 0
    assert summary["n_tombstones"] == 0 and summary["n_segments"] == 1

    extend_index_df(
        spark,
        spark.createDataFrame(
            delta,
            "repo string, path string, commit string, lang string, content string",
        ),
        ix,
        EngineConfig(build_waves=1, build_partitions=4),
    )
    gen0_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{ix}/docs")
        .where("gen = 0").select("doc_id").collect()
    ]
    delete_docs(spark, ix, gen0_ids)
    segs = index_segments(spark, ix)
    gens = {s["gen"]: s for s in segs if s["gen"] >= 0}
    assert set(gens) == {0, 1}
    assert gens[1]["n_docs"] == 1
    assert segs[-1]["n_segments"] == 2
    assert segs[-1]["n_tombstones"] == 8  # every alpha doc tombstoned

"""Index lifecycle semantics under interleaved extend / delete /
re-ingest / compact:

1. re-ingesting a tombstoned identity resurrects it (Lucene add-after-
   delete) — whether its rows still exist in an old generation or the
   tombstone went stale (deleted-then-compacted, or never indexed);
2. a seeded randomized op sequence must leave the index answering
   queries exactly like a fresh build over the currently-visible docs.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.build import (
    build_index,
    compact_index,
    delete_docs,
    extend_index,
    read_stats,
    read_tombstones,
)
from search_engine_spark.plans.query import QueryEngine
from search_engine_spark.sources.corpus import load_corpus, with_identity

QUERIES = ["binary search tree", "merge sort", "hash table lookup"]


@pytest.fixture(scope="module")
def corpus_meta(spark, fixture_dir):
    """path → (doc_id, row) for the 200-doc fixture corpus."""
    src = str(fixture_dir / "corpus.parquet")
    ident = with_identity(load_corpus(spark, src)).select("doc_id", "path")
    return src, {r["path"]: r["doc_id"] for r in ident.collect()}


def _write_subset(spark, src, paths, out):
    full = spark.read.parquet(src)
    full.where(F.col("path").isin(list(paths))).write.mode(
        "overwrite"
    ).parquet(out)
    return out


def _topk(eng, q, k=8):
    return [(r["doc_id"], round(r["global_score"], 9))
            for r in eng.search(q, k=k).collect()]


def test_reingest_resurrects_tombstoned_doc(spark, fixture_dir,
                                            tmp_path_factory, corpus_meta):
    src, ids = corpus_meta
    root = tmp_path_factory.mktemp("resurrect")
    ix = str(root / "ix")
    paths = sorted(ids)
    base = paths[:150]
    _write_subset(spark, src, base, str(root / "base"))
    build_index(spark, str(root / "base"), ix)

    eng = QueryEngine(spark, ix)
    victim = eng.bm25(QUERIES[0], k=1).collect()[0]
    victim_path = victim["path"]
    assert delete_docs(spark, ix, [victim["doc_id"]]) == 1
    eng = QueryEngine(spark, ix)
    assert victim["doc_id"] not in {
        r["doc_id"] for r in eng.bm25(QUERIES[0], k=5).collect()
    }

    # re-ingest the same identity (rows still live in gen 0) → the
    # extend clears the tombstone instead of re-encoding
    _write_subset(spark, src, [victim_path], str(root / "again"))
    s = extend_index(spark, str(root / "again"), ix)
    assert s["docs_resurrected"] == 1
    assert s["docs_added"] == 0  # upsert-skipped: rows already exist
    assert read_tombstones(spark, ix).count() == 0
    eng = QueryEngine(spark, ix)
    top = eng.bm25(QUERIES[0], k=1).collect()[0]
    assert top["doc_id"] == victim["doc_id"]


def test_stale_tombstone_does_not_mask_fresh_ingest(spark, fixture_dir,
                                                    tmp_path_factory,
                                                    corpus_meta):
    """Tombstone a doc that was never indexed, then ingest it — the
    stale tombstone must not keep it invisible."""
    src, ids = corpus_meta
    root = tmp_path_factory.mktemp("stale_tomb")
    ix = str(root / "ix")
    paths = sorted(ids)
    base, later = paths[:150], paths[150:]
    _write_subset(spark, src, base, str(root / "base"))
    build_index(spark, str(root / "base"), ix)

    ghost = later[0]
    delete_docs(spark, ix, [ids[ghost]])  # never indexed
    _write_subset(spark, src, later, str(root / "delta"))
    s = extend_index(spark, str(root / "delta"), ix)
    assert s["docs_resurrected"] == 1  # the stale tombstone cleared
    assert s["docs_added"] == len(later)
    eng = QueryEngine(spark, ix)
    hits = eng.docs.where(F.col("doc_id") == ids[ghost]).count()
    assert hits == 1
    assert read_tombstones(spark, ix).count() == 0


def test_randomized_lifecycle_matches_fresh_build(spark, fixture_dir,
                                                  tmp_path_factory,
                                                  corpus_meta):
    """Seeded random interleaving of extend / delete / re-ingest /
    compact ≡ fresh build over the visible set (stats + top-k on every
    query, WAND and exhaustive)."""
    src, ids = corpus_meta
    id2path = {v: k for k, v in ids.items()}
    root = tmp_path_factory.mktemp("fuzz")
    ix = str(root / "ix")
    rng = random.Random(20260818)

    paths = sorted(ids)
    batches = [paths[:80], paths[80:130], paths[130:170], paths[170:]]
    _write_subset(spark, src, batches[0], str(root / "b0"))
    build_index(spark, str(root / "b0"), ix)
    visible = set(batches[0])
    next_batch = 1

    ops_run = []
    for step in range(6):
        choice = rng.random()
        if choice < 0.4 and next_batch < len(batches):
            batch = batches[next_batch]
            # fold in a few re-ingests of previously-deleted docs
            dead = sorted(set(paths[: 80 * next_batch]) - visible)
            readd = dead[: 3] if dead else []
            _write_subset(spark, src, batch + readd,
                          str(root / f"b{next_batch}"))
            extend_index(spark, str(root / f"b{next_batch}"), ix)
            visible |= set(batch) | set(readd)
            next_batch += 1
            ops_run.append(f"extend+{len(batch)}+readd{len(readd)}")
        elif choice < 0.75 and len(visible) > 20:
            victims = rng.sample(sorted(visible), 5)
            delete_docs(spark, ix, [ids[p] for p in victims])
            visible -= set(victims)
            ops_run.append("delete5")
        else:
            compact_index(spark, ix)
            ops_run.append("compact")

    # final compact: bare deletes intentionally leave the link prior
    # stale until merge (Lucene semantics), so the state that must
    # equal a fresh build is the post-compaction one
    compact_index(spark, ix)
    ops_run.append("compact(final)")

    # reference: fresh build over exactly the visible docs
    ref = str(root / "ix_ref")
    _write_subset(spark, src, sorted(visible), str(root / "visible"))
    build_index(spark, str(root / "visible"), ref)

    eng = QueryEngine(spark, ix)
    eng_ref = QueryEngine(spark, ref)
    si, sr = read_stats(spark, ix), read_stats(spark, ref)
    # n_docs may include tombstoned rows until compaction — compare the
    # VISIBLE universe instead
    live = {r["doc_id"] for r in eng._live(eng.docs).select("doc_id").collect()}
    assert live == {ids[p] for p in visible}, ops_run
    for q in QUERIES:
        assert _topk(eng, q) == _topk(eng_ref, q), (q, ops_run)
        for wand in (True, False):
            got = [r["doc_id"] for r in eng.bm25(q, k=8, wand=wand).collect()]
            want = [r["doc_id"]
                    for r in eng_ref.bm25(q, k=8, wand=wand).collect()]
            assert got == want, (q, wand, ops_run)

"""Index integrity audit: landed tables vs per-partition lineage.

The north rule requires builds to be "resumable from checkpoint with
per-partition lineage + metrics"; this module closes the loop by making
the lineage *checkable after the fact*: ``verify_index`` re-derives the
per-(generation, partition) row counts and order-independent sha256-XOR
digests from the landed parquet tables and compares them against the
latest checkpoint attempt, then cross-checks the structural invariants
between the tables themselves. The reference has no equivalent (its
integrity story is Postgres constraints); this is the audit a 100 TB
index needs after any incident — it reads NO content, only the docs /
postings / blocks tables and the checkpoint, so it costs three
aggregates regardless of corpus size.

Checks:
  C1 lineage coverage — every landed (gen, part_id) has a latest
     'postings' lineage row with status='done', and vice versa;
  C2 docs counts     — landed docs rows per partition == lineage rows_in;
  C3 docs digests    — landed sha_xor per partition == lineage sha_xor;
  C4 postings counts — landed postings rows per partition == rows_out;
  C5 orphan postings — every postings doc_id exists in docs (the
     converse may legitimately fail: a token-free doc has no postings);
  C6 block density   — per generation, Σ blocks.n == postings rows
     (holds across deletes because compaction physically rewrites both
     sides and re-baselines lineage);
  C7 corpus stats    — stats.json n_docs == landed docs count.

Deletes: ``delete_docs`` tombstones don't touch the tables, so all
checks keep passing until ``compact_index`` rewrites them — and
compaction re-baselines the lineage (build.py::_rebaseline_lineage), so
they pass after it too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from search_engine_spark.checkpoint import CheckpointLog, fs_exists
from search_engine_spark.plans.build import _sha_prefix_col, read_stats


def verify_index(spark: SparkSession, index_dir: str) -> dict:
    """Run checks C1-C7; returns {"ok": bool, "checks": {...},
    "mismatches": [...]} with every failing (check, gen, part) listed."""
    stats = read_stats(spark, index_dir)
    P = int(stats.get("build_partitions", 16))
    ckpt = CheckpointLog(spark, f"{index_dir}/_checkpoint")

    lineage = {
        (int(r["partition_id"]) // P, int(r["partition_id"]) % P):
            (r["rows_in"], r["rows_out"], r["sha_xor"])
        for r in ckpt.latest()
        .where((F.col("stage") == "postings") & (F.col("status") == "done"))
        .collect()
    }
    docs = spark.read.parquet(f"{index_dir}/docs")
    postings = spark.read.parquet(f"{index_dir}/postings")
    landed_docs = {
        (r["gen"], r["part_id"]): (r["cnt"], r["sha_xor"])
        for r in docs.groupBy("gen", "part_id")
        .agg(
            F.count("*").alias("cnt"),
            F.bit_xor(_sha_prefix_col()).alias("sha_xor"),
        )
        .collect()
    }
    landed_post = {
        (r["gen"], r["part_id"]): r["cnt"]
        for r in postings.groupBy("gen", "part_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }

    mismatches: list[dict] = []

    def bad(check: str, key, detail: str) -> None:
        mismatches.append({"check": check, "gen_part": key, "detail": detail})

    # C1: landed ↔ lineage coverage (a lineage row recording 0 rows_in
    # legitimately has no landed partition directory)
    for key in sorted(set(landed_docs) - set(lineage)):
        bad("C1", key, "landed partition has no 'done' lineage row")
    for key in sorted(k for k, v in lineage.items()
                      if v[0] and k not in landed_docs):
        bad("C1", key, f"lineage claims rows_in={lineage[key][0]} but no "
                       "docs landed")

    # C2/C3/C4 per covered partition
    for key, (rows_in, rows_out, sha_xor) in sorted(lineage.items()):
        cnt, landed_sha = landed_docs.get(key, (0, None))
        if cnt != (rows_in or 0):
            bad("C2", key, f"docs rows {cnt} != lineage rows_in {rows_in}")
        if (landed_sha or 0) != (sha_xor or 0):
            bad("C3", key, f"docs sha_xor {landed_sha} != lineage {sha_xor}")
        pcnt = landed_post.get(key, 0)
        if pcnt != (rows_out or 0):
            bad("C4", key, f"postings rows {pcnt} != lineage rows_out {rows_out}")

    # C5: orphan postings (doc_id in postings but not in docs)
    n_orphans = (
        postings.select("doc_id").distinct()
        .join(docs.select("doc_id").distinct(), "doc_id", "left_anti")
        .count()
    )
    if n_orphans:
        bad("C5", None, f"{n_orphans} posting doc_ids missing from docs")

    # C6: per-generation block density vs postings rows
    try:
        blocks = spark.read.parquet(f"{index_dir}/blocks")
        block_n = {
            r["gen"]: r["n"]
            for r in blocks.groupBy("gen").agg(F.sum("n").alias("n")).collect()
        }
        post_n = {
            r["gen"]: r["n"]
            for r in postings.groupBy("gen").agg(F.count("*").alias("n")).collect()
        }
        for gen in sorted(set(block_n) | set(post_n)):
            if block_n.get(gen, 0) != post_n.get(gen, 0):
                bad("C6", (gen, None),
                    f"blocks Σn {block_n.get(gen, 0)} != postings rows "
                    f"{post_n.get(gen, 0)}")
    except Exception as e:  # noqa: BLE001 - blocks dir unreadable IS a failure
        bad("C6", None, f"blocks table unreadable: {e}")

    # C7: stats.json corpus count
    n_docs_landed = docs.count()
    if int(stats.get("n_docs", -1)) != n_docs_landed:
        bad("C7", None,
            f"stats.json n_docs {stats.get('n_docs')} != landed {n_docs_landed}")

    # C8: opt-in sidecars (positions/trigrams) must reference only
    # indexed docs — an orphan sidecar row means a doc was dropped
    # from docs without its sidecar partitions being rewritten
    for name in ("positions", "trigrams"):
        if not fs_exists(spark, f"{index_dir}/{name}"):
            continue  # sidecar not built (opt-in)
        side = spark.read.parquet(f"{index_dir}/{name}")
        n_orph = (
            side.select("doc_id").distinct()
            .join(docs.select("doc_id").distinct(), "doc_id", "left_anti")
            .count()
        )
        if n_orph:
            bad("C8", name, f"{n_orph} {name} doc_ids missing from docs")

    failed = sorted({m["check"] for m in mismatches})
    return {
        "ok": not mismatches,
        "partitions_audited": len(lineage),
        "n_docs": n_docs_landed,
        "checks": {c: (c not in failed)
                   for c in ["C1", "C2", "C3", "C4", "C5", "C6", "C7", "C8"]},
        "mismatches": mismatches,
    }


def index_segments(spark: SparkSession, index_dir: str) -> list[dict]:
    """ES ``_segments`` / ``_stats`` analogue: one row per landed
    generation (the Lucene-segment unit of ``extend_index``) with the
    numbers a compaction policy or an operator reads before acting —
    docs, postings rows, encoded blocks, distinct terms in the segment,
    plus index-wide rows for tombstones and the analyzer.

    Content-free and aggregate-only (three partition-pruned aggregates
    over docs/postings/blocks — cost independent of corpus bytes, like
    ``verify_index``). The reference has no equivalent; Lucene exposes
    exactly this via IndexWriter.getSegmentInfos / ES GET _segments,
    and ``maybe_compact`` already *decides* on these numbers — this
    surface makes them inspectable.
    """
    from search_engine_spark.plans.build import read_tombstones

    docs = spark.read.parquet(f"{index_dir}/docs")
    post = spark.read.parquet(f"{index_dir}/postings")
    blocks = spark.read.parquet(f"{index_dir}/blocks")

    d = {
        r["gen"]: r["n"]
        for r in docs.groupBy("gen").agg(F.count("*").alias("n")).collect()
    }
    p = {
        r["gen"]: (r["n"], r["nt"])
        for r in post.groupBy("gen")
        .agg(F.count("*").alias("n"), F.countDistinct("term").alias("nt"))
        .collect()
    }
    b = {
        r["gen"]: (r["n"], r["np"])
        for r in blocks.groupBy("gen")
        .agg(F.count("*").alias("n"), F.sum("n").alias("np"))
        .collect()
    }
    stats = read_stats(spark, index_dir)
    out = []
    for gen in sorted(set(d) | set(p) | set(b)):
        n_blocks, n_encoded = b.get(gen, (0, 0))
        out.append(
            {
                "gen": int(gen),
                "n_docs": int(d.get(gen, 0)),
                "n_postings": int(p.get(gen, (0, 0))[0]),
                "n_terms": int(p.get(gen, (0, 0))[1]),
                "n_blocks": int(n_blocks),
                "n_encoded_postings": int(n_encoded or 0),
            }
        )
    out.append(
        {
            "gen": -1,  # index-wide summary row
            "n_docs": int(stats.get("n_docs", 0)),
            "n_tombstones": read_tombstones(spark, index_dir).count(),
            "n_segments": len(set(d) | set(p) | set(b)),
            "analyzer": stats.get("analyzer", "plain"),
            "avgdl": stats.get("avgdl"),
        }
    )
    return out

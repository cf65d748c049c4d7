"""The index build plan: checkpoint-resumable, per-partition lineage,
segmented incremental ingest.

Pipeline (SURVEY §3.3 Spark shape):

  stage 1 "postings"  — per build-partition, resumable:
      corpus scan → doc_id/sha identity → vectorized tokenize
      → postings parquet partitioned by (gen, part_id)
      → refs (link extraction, same wave — no later content re-scan)
      → docs table (no content) partitioned by (gen, part_id)
      → lineage row per partition (rows_in, rows_out, sha_xor)
  stage 2 "index"     — global, idempotent:
      postings (all generations) → terms (df, idf) + stats (N, avgdl)
      → salted block encode of the TARGET generation only
      → index blocks partitioned by (gen, term bucket)
  stage 3 "prior"     — global, idempotent overwrite:
      refs (all generations) ⋈ docs → edges → PageRank → prior table

Resumability: stage 1 runs in "waves" (chunks of pending partitions);
after each wave the lineage rows land, so a kill loses at most one wave
of work and a re-run anti-joins completed partitions away (north_rule).
Stages 2-3 are idempotent: re-running them after a kill is safe.

Generations (the Lucene-segment model re-expressed as parquet layout):
``extend_index`` ingests a NEW corpus batch as generation g — it
tokenizes and block-encodes ONLY the delta (cost O(delta)), then
refreshes the global terms/stats tables (one aggregation over postings,
no content) and rebuilds the link prior (the graph is global). Older
generations' blocks stay valid because block metadata is the
avgdl-independent (max_tf, min_dl) pair (operators/compress.py) — the
analogue of the reference's incremental indexer loop, which indexes
newly crawled pages without re-parsing old ones and refreshes IDF with
one corpus-wide UPDATE (`services/ranking/src/idf.py:14-23`).

Why partition on ``part_id = pmod(doc_id, P)``: deterministic from row
identity alone, so a resumed run computes the same partitioning no
matter how the input files are split — lineage stays meaningful across
input re-layout. P is the lineage granularity; at 10^12 files you'd
raise it to O(10^4-10^5) so a lost wave is bounded, waves to O(10^2).
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import replace as _cfg_replace

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark.checkpoint import CheckpointLog, fs_exists
from search_engine_spark.config import EngineConfig
from search_engine_spark.metrics import MetricsLog
from search_engine_spark.operators.compress import encode_blocks, write_index_blocks
from search_engine_spark.operators.linkgraph import extract_refs, resolve_edges
from search_engine_spark.operators.pagerank import pagerank
from search_engine_spark.operators.postings import build_terms_with_stats
from search_engine_spark.functions.tokenize import (
    analyzer_of,
    extract_positions_jvm,
    extract_postings,
    extract_postings_jvm,
)
from search_engine_spark.sources.corpus import docs_table, load_corpus, with_identity


def _sha_prefix_col():
    # first 15 hex chars of sha256 → bigint; XOR-aggregated per partition
    return F.conv(F.substring("content_sha", 1, 15), 16, 10).cast("long")


def _chunks(seq: list, n_chunks: int) -> list[list]:
    if not seq:
        return []
    size = max(1, -(-len(seq) // n_chunks))
    return [seq[i : i + size] for i in range(0, len(seq), size)]


def _tune_scan_splits(spark: SparkSession, corpus_path: str) -> None:
    """Size parquet scan splits to the Python-tokenizer stage, not to a
    JVM scan. The default 128 MB split packs a whole small corpus into a
    handful of tasks, capping tokenize parallelism below the core count
    (measured: local[32] no faster than local[8]). A compute-bound
    Arrow/pandas stage wants ≥ ~4 concurrent splits per core; at huge
    scale the clamp returns to the 128 MB default, where scans are
    I/O-bound again and split count is ample anyway.
    """
    try:
        sc = spark.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(corpus_path)  # noqa: SLF001
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
        size = fs.getContentSummary(hpath).getLength()
    except Exception:  # noqa: BLE001 - any FS oddity → keep defaults
        return
    cores = spark.sparkContext.defaultParallelism
    split = min(128 << 20, max(2 << 20, size // (cores * 4)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(split)))


def _delete_path(spark: SparkSession, path: str) -> None:
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    fs.delete(hpath, True)


def _rename_path(spark: SparkSession, src: str, dst: str) -> None:
    sc = spark.sparkContext
    hsrc = sc._jvm.org.apache.hadoop.fs.Path(src)  # noqa: SLF001
    hdst = sc._jvm.org.apache.hadoop.fs.Path(dst)  # noqa: SLF001
    fs = hsrc.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    fs.rename(hsrc, hdst)


def _part_col(src_col: str, n_parts: int):
    return F.pmod(F.col(src_col), F.lit(n_parts)).cast("int")


def _postings_stage(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    cfg: EngineConfig,
    ckpt: CheckpointLog,
    metrics: MetricsLog,
    gen: int,
    resume: bool,
    fail_after_waves: int | None,
) -> tuple[int, int, int, int]:
    """Run the resumable stage-1 waves for one generation.

    Checkpoint rows encode (generation, partition) as
    ``gen·P + part_id`` so every generation resumes independently.
    Returns (rows_processed, n_pending, n_skipped, attempt).
    """
    P = cfg.build_partitions
    done_ids = ckpt.completed_partitions("postings") if resume else set()
    done = {d % P for d in done_ids if d // P == gen}
    pending = [p for p in range(P) if p not in done]
    attempt = ckpt.next_attempt("postings")
    waves = _chunks(pending, cfg.build_waves)

    postings_path = f"{index_dir}/postings"
    docs_path = f"{index_dir}/docs"
    refs_path = f"{index_dir}/refs"

    rows_processed = 0
    for wi, wave in enumerate(waves):
        if fail_after_waves is not None and wi >= fail_after_waves:
            raise RuntimeError(f"injected failure after wave {wi} (test hook)")
        started = time.time()
        subset = corpus.where(F.col("part_id").isin(wave))

        extractor = (
            extract_postings_jvm if cfg.tokenizer == "jvm" else extract_postings
        )
        postings = extractor(
            subset.select("doc_id", "part_id", "content"), "content",
            stem=cfg.stem,
        )
        # mapInPandas consumed (doc_id, content); re-derive part_id from
        # doc_id (deterministic) for the partitioned write.
        # repartition on part_id before the partitioned write: without it
        # every input split writes a file into every part_id directory
        # (splits × partitions small files — a real 1000-executor killer);
        # with it each directory gets ~1 compact file.
        (
            postings.withColumn("part_id", _part_col("doc_id", P))
            .withColumn("gen", F.lit(gen).cast("int"))
            .repartition(len(wave), "part_id")
            .write.mode("overwrite")
            .partitionBy("gen", "part_id")
            .parquet(postings_path)
        )

        # reference extraction rides the SAME wave (SURVEY §2.2 P6):
        # refs land partitioned like postings, so stage 3 builds the
        # link graph from this small table + the docs table. All content
        # reads are confined to the resumable stage-1 waves; a
        # prior-only rebuild is content-free.
        (
            extract_refs(subset.select("doc_id", "content"))
            .withColumn("part_id", _part_col("src_doc_id", P))
            .withColumn("gen", F.lit(gen).cast("int"))
            .repartition(len(wave), "part_id")
            .write.mode("overwrite")
            .partitionBy("gen", "part_id")
            .parquet(refs_path)
        )

        # opt-in positional sidecar (Lucene positions): same wave, same
        # resume semantics; file-sorted by term so phrase queries prune
        # parquet row groups on the term predicate
        if cfg.store_positions:
            (
                extract_positions_jvm(
                    subset.select("doc_id", "content"), stem=cfg.stem
                )
                .withColumn("part_id", _part_col("doc_id", P))
                .withColumn("gen", F.lit(gen).cast("int"))
                .repartition(len(wave), "part_id")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("gen", "part_id")
                .parquet(f"{index_dir}/positions")
            )

        # opt-in character-trigram sidecar (substring search across
        # token boundaries): same wave/resume semantics; file-sorted by
        # tri so the candidate scan prunes parquet row groups
        if cfg.store_trigrams:
            from search_engine_spark.ops.trigram import trigram_postings

            (
                trigram_postings(
                    subset.select("doc_id", "content"), text_col="content"
                )
                .withColumn("part_id", _part_col("doc_id", P))
                .withColumn("gen", F.lit(gen).cast("int"))
                .repartition(len(wave), "part_id")
                .sortWithinPartitions("tri")
                .write.mode("overwrite")
                .partitionBy("gen", "part_id")
                .parquet(f"{index_dir}/trigrams")
            )

        # per-doc metadata incl. title/description (P7/P8); part_id is
        # re-derived (deterministic in doc_id) since docs_table prunes it.
        # keywords come from the postings just written — a narrow
        # read-back (partition-pruned to this wave) instead of a second
        # content tokenize.
        spark.catalog.refreshByPath(postings_path)
        wave_postings = (
            spark.read.parquet(postings_path)
            .where((F.col("gen") == gen) & F.col("part_id").isin(wave))
            .select("doc_id", "term", "tf")
        )
        (
            docs_table(subset, postings=wave_postings)
            .withColumn("part_id", _part_col("doc_id", P))
            .withColumn("gen", F.lit(gen).cast("int"))
            .repartition(len(wave), "part_id")
            .write.mode("overwrite")
            .partitionBy("gen", "part_id")
            .parquet(docs_path)
        )

        # opt-in term-vectors sidecar (Lucene term vectors): per-doc
        # top-m (term, tf), derived from the SAME wave postings read-
        # back as keywords — never a second tokenize. File-sorted by
        # doc_id so MLT/PRF seed lookups prune row groups.
        if cfg.store_termvecs:
            w_tv = Window.partitionBy("doc_id").orderBy(
                F.desc("tf"), F.asc("term")
            )
            (
                wave_postings
                .withColumn("rk", F.row_number().over(w_tv))
                .where(F.col("rk") <= cfg.termvec_top_m)
                .drop("rk")
                .withColumn("part_id", _part_col("doc_id", P))
                .withColumn("gen", F.lit(gen).cast("int"))
                .repartition(len(wave), "part_id")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .partitionBy("gen", "part_id")
                .parquet(f"{index_dir}/termvecs")
            )

        # lineage audit: input-side row counts from an INDEPENDENT
        # column-pruned scan of the source (part_id derives from
        # doc_id = xxhash64(repo,path,commit) — content is never read,
        # so this pass is near-free at 100 TB), compared against what
        # landed in the docs parquet. A dropped/duplicated row fails the
        # build here instead of being silently checkpointed. The sha_xor
        # digest comes from the landed file — it was computed from input
        # content inside the write job itself (input-derived, first
        # materialization), and parquet page checksums guard the storage
        # hop; re-hashing all content in a third scan per wave would
        # double the build's I/O for no additional coverage.
        in_counts = {
            r["part_id"]: r["rows_in"]
            for r in subset.groupBy("part_id")
            .agg(F.count("*").alias("rows_in"))
            .collect()
        }
        landed_stats = {
            r["part_id"]: (r["rows_in"], r["sha_xor"])
            for r in spark.read.parquet(docs_path)
            .where((F.col("gen") == gen) & F.col("part_id").isin(wave))
            .groupBy("part_id")
            .agg(
                F.count("*").alias("rows_in"),
                F.bit_xor(_sha_prefix_col()).alias("sha_xor"),
            )
            .collect()
        }
        bad = {
            p for p in wave
            if in_counts.get(p, 0) != landed_stats.get(p, (0, None))[0]
        }
        if bad:
            raise RuntimeError(
                f"lineage audit failed for partitions {sorted(bad)}: "
                f"landed docs don't match the input subset "
                f"(input_rows={ {p: in_counts.get(p, 0) for p in sorted(bad)} }, "
                f"landed={ {p: landed_stats.get(p) for p in sorted(bad)} })"
            )
        in_stats = {
            p: (in_counts.get(p, 0), landed_stats.get(p, (0, None))[1])
            for p in wave
        }
        out_stats = {
            r["part_id"]: r["rows_out"]
            for r in spark.read.parquet(postings_path)
            .where((F.col("gen") == gen) & F.col("part_id").isin(wave))
            .groupBy("part_id")
            .agg(F.count("*").alias("rows_out"))
            .collect()
        }
        finished = time.time()
        ckpt.append(
            [
                {
                    "stage": "postings",
                    "partition_id": gen * P + p,
                    "status": "done",
                    "rows_in": in_stats.get(p, (0, None))[0],
                    "rows_out": out_stats.get(p, 0),
                    "sha_xor": in_stats.get(p, (0, None))[1],
                    "attempt": attempt,
                    "started_at": started,
                    "finished_at": finished,
                }
                for p in wave
            ]
        )
        rows_processed += sum(in_stats.get(p, (0, None))[0] for p in wave)
        metrics.emit(
            "postings",
            {
                f"wave_{wi}_secs": finished - started,
                f"wave_{wi}_docs": sum(in_stats.get(p, (0, None))[0] for p in wave),
            },
        )
    return rows_processed, len(pending), len(done), attempt


def _index_stage(
    spark: SparkSession,
    index_dir: str,
    cfg: EngineConfig,
    ckpt: CheckpointLog,
    metrics: MetricsLog,
    build_id: str,
    attempt: int,
    encode_gen: int | None,
) -> tuple[int, float, DataFrame]:
    """Terms + stats over ALL generations; block-encode one generation
    (``encode_gen``) or everything (None → full rebuild, blocks dir
    cleared first so stale generations can't linger).
    Returns (n_docs, avgdl, docs_df)."""
    t2 = time.time()
    docs = spark.read.parquet(f"{index_dir}/docs")
    n_docs = docs.count()
    postings_all = spark.read.parquet(f"{index_dir}/postings")

    # one fused pass: per-term (df, Σtf) → terms table AND total_dl
    # (this stage scans postings exactly twice: this agg + the encode —
    # and the encode reads only the target generation's partitions)
    terms, total_dl = build_terms_with_stats(postings_all, n_docs)
    avgdl = total_dl / n_docs if n_docs else 0.0
    t_stats = time.time()
    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "block_size": cfg.block_size,
        "term_buckets": cfg.term_buckets,
        "salt_bits": cfg.salt_bits,
        "rare_salt_df_threshold": (
            cfg.block_size if cfg.rare_salt_df_threshold is None
            else cfg.rare_salt_df_threshold
        ),
        "k1": cfg.k1,
        "b": cfg.b,
        "analyzer": analyzer_of(cfg.stem),
        "build_id": build_id,
        # lineage granularity: lets tooling map checkpoint partition_id
        # (= gen·P + part_id) back to (gen, part_id) without the cfg
        "build_partitions": cfg.build_partitions,
    }

    # range-partitioned + sorted by term → parquet min/max row-group
    # stats make the per-query idf lookup a pruned point read
    terms.drop("term_tf").repartitionByRange(8, "term").sortWithinPartitions(
        "term"
    ).write.mode("overwrite").parquet(f"{index_dir}/terms")
    terms.unpersist()

    # opt-in reversed-dictionary sidecar (Lucene ReverseStringFilter):
    # the same dictionary keyed by reverse(term), range-partitioned and
    # file-sorted on the reversed key, so suffix wildcards (*er) become
    # a pushed StartsWith range scan instead of a dictionary scan.
    # Refresh-if-present: extends/compacts that omit the flag must not
    # leave a stale sidecar behind the fresh terms table.
    if cfg.store_suffixes or fs_exists(spark, f"{index_dir}/terms_rev"):
        (
            spark.read.parquet(f"{index_dir}/terms")
            .select(F.reverse("term").alias("rterm"), "term", "df")
            .repartitionByRange(8, "rterm")
            .sortWithinPartitions("rterm")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/terms_rev")
        )
    t_terms = time.time()

    if encode_gen is None:
        # full rebuild doubles as compaction: postings from every
        # generation merge into gen-0 blocks (doc_id-sorted per group)
        _delete_path(spark, f"{index_dir}/blocks")
        to_encode, block_gen = postings_all, 0
    else:
        to_encode = postings_all.where(F.col("gen") == encode_gen)
        block_gen = encode_gen
    # df-adaptive salt map: read back the just-written terms table (no
    # recompute) — encode packs rare terms (df < threshold) unsalted
    blocks = encode_blocks(
        to_encode.select("doc_id", "term", "tf", "dl"), cfg,
        term_df=spark.read.parquet(f"{index_dir}/terms").select("term", "df"),
    )
    write_index_blocks(
        blocks.withColumn("gen", F.lit(block_gen).cast("int")),
        f"{index_dir}/blocks",
    )
    t_encode = time.time()

    _write_json(spark, f"{index_dir}/stats.json", stats)
    ckpt.append(
        [{"stage": "index", "partition_id": -1, "status": "done",
          "rows_in": None, "rows_out": None, "sha_xor": None,
          "attempt": attempt, "started_at": t2, "finished_at": time.time()}]
    )
    metrics.emit("index", {"secs": time.time() - t2, "n_docs": n_docs,
                           "avgdl": avgdl, "stats_secs": t_stats - t2,
                           "terms_secs": t_terms - t_stats,
                           "encode_secs": t_encode - t_terms})
    return n_docs, avgdl, docs


def _prior_stage(
    spark: SparkSession,
    index_dir: str,
    cfg: EngineConfig,
    ckpt: CheckpointLog,
    metrics: MetricsLog,
    attempt: int,
    docs: DataFrame,
) -> None:
    """Link graph from the refs side-table (all generations) + PageRank.
    Content-free: refs were extracted during the stage-1 waves."""
    t3 = time.time()
    try:
        if not fs_exists(spark, f"{index_dir}/refs"):
            raise FileNotFoundError(f"{index_dir}/refs")
        refs = spark.read.parquet(f"{index_dir}/refs").select(
            "src_doc_id", "ref_path"
        )
    except Exception:  # noqa: BLE001 - corpus with zero refs writes an
        # empty (fileless) partitioned dir, which schema inference rejects
        refs = spark.createDataFrame([], "src_doc_id long, ref_path string")
    edges = resolve_edges(refs, docs.select("doc_id", "path"))
    edges.write.mode("overwrite").parquet(f"{index_dir}/edges")
    t_edges = time.time()
    # warm-start from the previous prior when one exists (incremental
    # extend/compact/refresh): the old ranks are near the new fixpoint,
    # so the tol-gated loop stops after a handful of iterations instead
    # of the cold-start ~O(log(1/tol)/log(1/d)) — pagerank() reseeds
    # new docs at 1/n, drops deleted ids, and renormalizes, so the
    # result is the SAME fixpoint (test_rank_identity warm-start cases).
    init = None
    if cfg.pagerank_warm_start and fs_exists(spark, f"{index_dir}/prior"):
        try:
            init = spark.read.parquet(f"{index_dir}/prior").localCheckpoint()
        except Exception:  # noqa: BLE001 - unreadable/empty prior: cold start
            init = None
    pr_stats: dict = {}
    prior = pagerank(
        spark.read.parquet(f"{index_dir}/edges"),
        cfg.pagerank_damping, cfg.pagerank_tol, cfg.pagerank_max_iters,
        init_ranks=init, stats=pr_stats,
    )
    prior.write.mode("overwrite").parquet(f"{index_dir}/prior")
    ckpt.append(
        [{"stage": "prior", "partition_id": -1, "status": "done",
          "rows_in": None, "rows_out": None, "sha_xor": None,
          "attempt": attempt, "started_at": t3, "finished_at": time.time()}]
    )
    metrics.emit("prior", {"secs": time.time() - t3,
                           "edges_secs": t_edges - t3,
                           "pagerank_secs": time.time() - t_edges,
                           "pagerank_iters": pr_stats.get("iterations", 0),
                           "warm_start": int(init is not None)})


def build_index(
    spark: SparkSession,
    corpus_path: str,
    index_dir: str,
    cfg: EngineConfig | None = None,
    resume: bool = True,
    fail_after_waves: int | None = None,
) -> dict:
    """Build (or resume) the full index under ``index_dir``
    (generation 0; see :func:`extend_index` for incremental batches).

    ``fail_after_waves`` is a test hook simulating a mid-build kill.
    Returns a summary dict (also what the CLI prints).
    """
    cfg = cfg or EngineConfig()
    _tune_scan_splits(spark, corpus_path)
    return build_index_df(
        spark, load_corpus(spark, corpus_path), index_dir, cfg,
        resume=resume, fail_after_waves=fail_after_waves,
    )


def build_index_df(
    spark: SparkSession,
    raw_corpus: DataFrame,
    index_dir: str,
    cfg: EngineConfig | None = None,
    resume: bool = True,
    fail_after_waves: int | None = None,
) -> dict:
    """:func:`build_index` over an already-loaded corpus DataFrame —
    the entry point streaming ingest (``foreachBatch``) uses, where the
    micro-batch arrives as a DataFrame, not a path."""
    cfg = cfg or EngineConfig()
    t0 = time.time()
    build_id = uuid.uuid4().hex[:12]
    ckpt = CheckpointLog(spark, f"{index_dir}/_checkpoint")
    metrics = MetricsLog(spark, f"{index_dir}/_metrics", build_id)

    # dynamic overwrite: re-running a wave replaces only its partitions
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    cfg = _pin_analyzer(
        spark, index_dir, cfg,
        resuming=resume and bool(ckpt.completed_partitions("postings")),
    )
    corpus = with_identity(raw_corpus).withColumn(
        "part_id", _part_col("doc_id", cfg.build_partitions)
    )
    rows_processed, n_pending, n_done, attempt = _postings_stage(
        spark, corpus, index_dir, cfg, ckpt, metrics,
        gen=0, resume=resume, fail_after_waves=fail_after_waves,
    )
    n_docs, avgdl, docs = _index_stage(
        spark, index_dir, cfg, ckpt, metrics, build_id, attempt, encode_gen=None
    )
    _prior_stage(spark, index_dir, cfg, ckpt, metrics, attempt, docs)

    wall = time.time() - t0
    metrics.emit("build", {"secs": wall, "docs": n_docs,
                           "docs_per_sec": (rows_processed / wall) if wall else 0.0})
    return {
        "build_id": build_id,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "partitions_built": n_pending,
        "partitions_skipped": n_done,
        "wall_secs": wall,
    }


def extend_index(
    spark: SparkSession,
    corpus_path: str,
    index_dir: str,
    cfg: EngineConfig | None = None,
    resume: bool = True,
    generation: int | None = None,
    fail_after_waves: int | None = None,
) -> dict:
    """Ingest a NEW corpus batch into an existing index as its own
    generation — tokenize + block-encode the delta only (O(delta)),
    then refresh terms/stats (one aggregation over postings, no
    content) and rebuild the link prior.

    Upsert semantics: rows whose doc_id already exists in an earlier
    generation are skipped (the reference's ``ON CONFLICT DO NOTHING``
    page sink, `services/spider/internal/store/db.go:83-118`, and its
    claim-loop that never re-indexes an ``indexed=TRUE`` page).

    ``generation=None`` auto-selects: the top generation if its stage-1
    is incomplete (resuming an interrupted extend), else the next one.
    """
    cfg = cfg or EngineConfig()
    _tune_scan_splits(spark, corpus_path)
    return extend_index_df(
        spark, load_corpus(spark, corpus_path), index_dir, cfg,
        resume=resume, generation=generation,
        fail_after_waves=fail_after_waves,
    )


def extend_index_df(
    spark: SparkSession,
    raw_corpus: DataFrame,
    index_dir: str,
    cfg: EngineConfig | None = None,
    resume: bool = True,
    generation: int | None = None,
    fail_after_waves: int | None = None,
) -> dict:
    """:func:`extend_index` over an already-loaded delta DataFrame (the
    ``foreachBatch`` entry point for streaming ingest)."""
    cfg = cfg or EngineConfig()
    t0 = time.time()
    build_id = uuid.uuid4().hex[:12]
    ckpt = CheckpointLog(spark, f"{index_dir}/_checkpoint")
    metrics = MetricsLog(spark, f"{index_dir}/_metrics", build_id)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    P = cfg.build_partitions
    done_ids = ckpt.completed_partitions("postings")
    if not done_ids:
        raise ValueError(
            "extend_index requires an existing index (no completed "
            "postings partitions found) — use build_index first"
        )
    if generation is None:
        gmax = max(d // P for d in done_ids)
        complete = len({d % P for d in done_ids if d // P == gmax}) == P
        generation = gmax + 1 if complete else gmax
    if generation == 0:
        raise ValueError("generation 0 is the base build; got extend(gen=0)")

    # the analyzer is an index property: a delta tokenized differently
    # from the base would split posting lists — inherit it
    cfg = _inherit_analyzer(spark, index_dir, cfg)

    delta = with_identity(raw_corpus).withColumn(
        "part_id", _part_col("doc_id", cfg.build_partitions)
    )
    # Re-ingesting a tombstoned identity clears the tombstone (Lucene
    # semantics: an add after a delete makes the doc visible again).
    # doc_id = xxhash64(repo, path, commit), so the same identity IS the
    # same content — when its rows still exist in an older generation,
    # clearing the tombstone alone resurrects it (no re-encode); when
    # they don't (never indexed, or compacted away), the doc indexes
    # fresh below and a stale tombstone must not keep masking it.
    resurrected = _clear_tombstones(spark, index_dir, delta)
    # upsert: skip docs already indexed by OLDER generations (the gen
    # currently being written is excluded so its own resume still sees
    # the delta rows)
    existing = (
        spark.read.parquet(f"{index_dir}/docs")
        .where(F.col("gen") < generation)
        .select("doc_id")
    )
    delta = delta.join(existing, "doc_id", "left_anti")

    rows_processed, n_pending, n_done, attempt = _postings_stage(
        spark, delta, index_dir, cfg, ckpt, metrics,
        gen=generation, resume=resume, fail_after_waves=fail_after_waves,
    )
    n_docs, avgdl, docs = _index_stage(
        spark, index_dir, cfg, ckpt, metrics, build_id, attempt,
        encode_gen=generation,
    )
    deferred = cfg.prior_refresh == "defer"
    if not deferred:
        _prior_stage(spark, index_dir, cfg, ckpt, metrics, attempt, docs)

    wall = time.time() - t0
    metrics.emit("extend", {"secs": wall, "generation": generation,
                            "docs_added": rows_processed,
                            "docs_resurrected": resurrected,
                            "prior_deferred": int(deferred)})
    return {
        "build_id": build_id,
        "generation": generation,
        "n_docs": n_docs,
        "docs_added": rows_processed,
        "docs_resurrected": resurrected,
        "avgdl": avgdl,
        "partitions_built": n_pending,
        "partitions_skipped": n_done,
        "wall_secs": wall,
    }


def refresh_prior(
    spark: SparkSession, index_dir: str, cfg: EngineConfig | None = None
) -> dict:
    """Standalone link-prior rebuild over everything currently landed —
    the catch-up pass for ``prior_refresh='defer'`` extends (streaming
    ingest runs many O(delta) generations, then pays the O(corpus)
    graph pass once here, or on the next ``compact_index``)."""
    cfg = cfg or EngineConfig()
    t0 = time.time()
    ckpt = CheckpointLog(spark, f"{index_dir}/_checkpoint")
    metrics = MetricsLog(spark, f"{index_dir}/_metrics", uuid.uuid4().hex[:12])
    docs = spark.read.parquet(f"{index_dir}/docs")
    _prior_stage(spark, index_dir, cfg, ckpt, metrics,
                 ckpt.next_attempt("prior"), docs)
    return {"n_docs": docs.count(), "wall_secs": time.time() - t0}


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids: list[int] | DataFrame
) -> int:
    """Tombstone documents (Lucene-model deletes): the doc_ids land in
    ``{index_dir}/tombstones`` and the query engine excludes them
    immediately; the postings/blocks/stats still contain them until
    :func:`compact_index` physically drops them and refreshes
    terms/stats/prior — exactly Lucene's deleted-docs-until-merge
    semantics. Returns the total live tombstone count."""
    from search_engine_spark.functions.inline import inline_table

    if isinstance(doc_ids, DataFrame):
        df = doc_ids.select(F.col(doc_ids.columns[0]).cast("long").alias("doc_id"))
    else:
        df = inline_table(
            spark, [(int(d),) for d in doc_ids], "doc_id long"
        )
    df.coalesce(1).write.mode("append").parquet(f"{index_dir}/tombstones")
    spark.catalog.refreshByPath(f"{index_dir}/tombstones")
    return (
        spark.read.parquet(f"{index_dir}/tombstones")
        .select("doc_id").distinct().count()
    )


def _clear_tombstones(spark: SparkSession, index_dir: str,
                      delta: DataFrame) -> int:
    """Drop tombstones whose doc_id appears in ``delta`` (re-ingest =
    un-delete). Returns how many were cleared. The tombstone table is
    rewritten via tmp+rename so a crash mid-clear leaves either the old
    or the new table, never a partial one; re-running is idempotent."""
    tombs_path = f"{index_dir}/tombstones"
    if not fs_exists(spark, tombs_path):
        return 0
    tombs = spark.read.parquet(tombs_path).select("doc_id").distinct()
    survivors = tombs.join(
        delta.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    n_before = tombs.count()
    tmp = f"{tombs_path}_tmp"
    survivors.coalesce(1).write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    if n_after == n_before:
        _delete_path(spark, tmp)
        return 0
    _delete_path(spark, tombs_path)
    _rename_path(spark, tmp, tombs_path)
    # drop any cached relation over the old table (QueryEngine caches
    # tombstones; Spark's cache manager matches by logical plan, so a
    # later identical read would silently serve the stale rows)
    spark.catalog.refreshByPath(tombs_path)
    return n_before - n_after


def read_tombstones(spark: SparkSession, index_dir: str) -> DataFrame:
    """Live tombstones (empty relation if none were ever written)."""
    if not fs_exists(spark, f"{index_dir}/tombstones"):
        return spark.createDataFrame([], "doc_id long")
    return spark.read.parquet(f"{index_dir}/tombstones").select(
        "doc_id"
    ).distinct()


def _inherit_analyzer(
    spark: SparkSession, index_dir: str, cfg: EngineConfig
) -> EngineConfig:
    """Force ``cfg.stem`` to the landed index's analyzer (the
    analyzer.json marker, falling back to stats.json for pre-marker
    indexes). Extends/compactions must tokenize like the base build or
    variants split across posting lists. Only a genuinely MISSING
    marker/stats (legacy index, or an extend resuming before its first
    _index_stage) leaves cfg as-is — a transient read error on an
    existing file propagates rather than silently falling back to the
    caller's cfg and splitting the term space."""
    for path in (f"{index_dir}/analyzer.json", f"{index_dir}/stats.json"):
        if not fs_exists(spark, path):
            continue
        landed = _read_json(spark, path).get("analyzer", "plain")
        if analyzer_of(cfg.stem) == landed:
            return cfg
        return _cfg_replace(cfg, stem=False if landed == "plain" else landed)
    return cfg


def _pin_analyzer(
    spark: SparkSession, index_dir: str, cfg: EngineConfig,
    resuming: bool,
) -> EngineConfig:
    """Stage-1 analyzer pin for BASE builds: stats.json only lands at
    the end of _index_stage, so a build interrupted mid-wave and
    resumed with a different ``cfg.stem`` would mix analyzers across
    waves of the same generation. The marker is written before the
    first wave and wins over the resuming caller's cfg ONLY on a
    genuine resume (completed postings partitions exist) — a fresh or
    restarted-from-zero build honors the caller's explicit flag and
    re-pins the marker (no completed wave ⇒ every partition rewrites
    anyway, so no mixing is possible).

    On resume the lookup mirrors ``_inherit_analyzer``: analyzer.json
    first, then stats.json (a legacy pre-marker index that completed a
    prior generation recorded its analyzer there). Without the
    fallback, resuming such an index with a different ``--stem`` flag
    would pin the caller's analyzer, skip the completed (unstemmed)
    partitions, and let _index_stage rewrite stats.json claiming
    'stem' — queries would then stem terms against an unstemmed index
    and silently return wrong/empty results."""
    path = f"{index_dir}/analyzer.json"
    if resuming:
        for landed_path in (path, f"{index_dir}/stats.json"):
            if not fs_exists(spark, landed_path):
                continue
            landed = _read_json(spark, landed_path).get("analyzer", "plain")
            if analyzer_of(cfg.stem) != landed:
                cfg = _cfg_replace(
                    cfg, stem=False if landed == "plain" else landed
                )
            if landed_path != path:
                # promote the legacy stats.json analyzer into the marker
                _write_json(spark, path, {"analyzer": landed})
            return cfg
    _write_json(spark, path, {"analyzer": analyzer_of(cfg.stem)})
    return cfg


def compact_index(
    spark: SparkSession,
    index_dir: str,
    cfg: EngineConfig | None = None,
) -> dict:
    """Merge all generations' blocks into one segment (gen 0) — the
    Lucene-style segment merge. Re-encodes from the stored postings
    (never re-reads content) and refreshes terms/stats AND the link
    prior in the same pass. If tombstones exist, the deleted docs are
    physically dropped from postings/docs/refs first; docs/refs
    themselves are otherwise untouched. The prior always rebuilds:
    compaction is the designated catch-up for ``prior_refresh='defer'``
    extends (a stale prior must not survive a merge), and the graph
    pass is content-free — small next to the block re-encode it rides
    with. Run after many extends/deletes to restore single-segment
    block density and exact corpus stats.
    """
    cfg = cfg or EngineConfig()
    cfg = _inherit_analyzer(spark, index_dir, cfg)
    t0 = time.time()
    build_id = uuid.uuid4().hex[:12]
    ckpt = CheckpointLog(spark, f"{index_dir}/_checkpoint")
    metrics = MetricsLog(spark, f"{index_dir}/_metrics", build_id)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    attempt = ckpt.next_attempt("index")

    tombs = read_tombstones(spark, index_dir)
    n_deleted = tombs.count()
    if n_deleted:
        # physical delete: rewrite the three row tables minus the
        # tombstoned docs (full-table rewrite — compaction is the
        # designated moment to pay it), then drop the tombstones
        for name, key in (("postings", "doc_id"), ("docs", "doc_id"),
                          ("refs", "src_doc_id"), ("positions", "doc_id"),
                          ("trigrams", "doc_id")):
            path = f"{index_dir}/{name}"
            try:
                tbl = spark.read.parquet(path)
            except Exception:  # noqa: BLE001 - empty refs dir
                continue
            kept = tbl.join(
                F.broadcast(tombs.withColumnRenamed("doc_id", key)), key,
                "left_anti",
            )
            tmp = f"{index_dir}/_{name}_compact"
            kept.repartition("part_id").write.mode("overwrite").partitionBy(
                "gen", "part_id"
            ).parquet(tmp)
            _delete_path(spark, path)
            _rename_path(spark, tmp, path)
        _delete_path(spark, f"{index_dir}/tombstones")
        # re-baseline lineage: physical deletes changed the landed
        # per-partition counts/digests, so append fresh 'postings' rows
        # reflecting what NOW lands — keeps plans/audit.py::verify_index
        # a strict invariant (landed == latest lineage) across deletes
        _rebaseline_lineage(spark, index_dir, cfg, ckpt)

    n_docs, avgdl, docs = _index_stage(
        spark, index_dir, cfg, ckpt, metrics, build_id, attempt, encode_gen=None
    )
    _prior_stage(spark, index_dir, cfg, ckpt, metrics, attempt, docs)
    wall = time.time() - t0
    metrics.emit("compact", {"secs": wall, "docs_deleted": n_deleted})
    return {"build_id": build_id, "n_docs": n_docs, "avgdl": avgdl,
            "docs_deleted": n_deleted, "wall_secs": wall}


def maybe_compact(
    spark: SparkSession,
    index_dir: str,
    cfg: EngineConfig | None = None,
    max_generations: int | None = None,
    max_tombstone_frac: float | None = None,
) -> dict | None:
    """Tiered-merge trigger (the Lucene MergePolicy analogue): run
    :func:`compact_index` only when the index has degraded past a
    threshold — more than ``max_generations`` live segments (each
    extend adds one; every generation is an extra directory branch the
    query scan unions and an extra partial block per term), or a
    tombstone fraction above ``max_tombstone_frac`` (deleted docs still
    burn scan+score work until physically dropped). The probe itself is
    O(1) data read: segment count comes from the ``gen`` partition
    listing of ``blocks``, the tombstone count from the (tiny)
    tombstones table, n_docs from stats.json. Returns compact_index's
    summary when it fired, else None. Thresholds default from
    ``EngineConfig`` so a long-running ingest loop can call this after
    every batch."""
    cfg = cfg or EngineConfig()
    max_gens = (cfg.compact_max_generations
                if max_generations is None else max_generations)
    max_tf = (cfg.compact_max_tombstone_frac
              if max_tombstone_frac is None else max_tombstone_frac)
    n_gens = spark.read.parquet(f"{index_dir}/blocks").select(
        "gen"
    ).distinct().count()
    n_tombs = read_tombstones(spark, index_dir).count()
    n_docs = max(read_stats(spark, index_dir)["n_docs"], 1)
    if n_gens <= max_gens and n_tombs / n_docs <= max_tf:
        return None
    return compact_index(spark, index_dir, cfg)


def _rebaseline_lineage(
    spark: SparkSession, index_dir: str, cfg: EngineConfig,
    ckpt: CheckpointLog,
) -> None:
    """Append fresh 'postings' lineage rows from the landed docs and
    postings tables (one aggregate each, no content). Called after a
    physical delete so the latest attempt per partition again equals
    what is on disk."""
    P = cfg.build_partitions
    attempt = ckpt.next_attempt("postings")
    now = time.time()
    docs_stats = {
        (r["gen"], r["part_id"]): (r["rows_in"], r["sha_xor"])
        for r in spark.read.parquet(f"{index_dir}/docs")
        .groupBy("gen", "part_id")
        .agg(
            F.count("*").alias("rows_in"),
            F.bit_xor(_sha_prefix_col()).alias("sha_xor"),
        )
        .collect()
    }
    post_counts = {
        (r["gen"], r["part_id"]): r["rows_out"]
        for r in spark.read.parquet(f"{index_dir}/postings")
        .groupBy("gen", "part_id")
        .agg(F.count("*").alias("rows_out"))
        .collect()
    }
    # every partition the OLD lineage covered gets a fresh row, so a
    # fully-deleted partition re-baselines to 0 rather than lingering
    covered = ckpt.completed_partitions("postings")
    keys = {(pid // P, pid % P) for pid in covered} | set(docs_stats)
    ckpt.append(
        [
            {
                "stage": "postings",
                "partition_id": g * P + p,
                "status": "done",
                "rows_in": docs_stats.get((g, p), (0, None))[0],
                "rows_out": post_counts.get((g, p), 0),
                "sha_xor": docs_stats.get((g, p), (0, None))[1],
                "attempt": attempt,
                "started_at": now,
                "finished_at": now,
            }
            for (g, p) in sorted(keys)
        ]
    )


def _write_json(spark: SparkSession, path: str, payload: dict) -> None:
    """Write a small JSON blob through the Hadoop FS API (works for any
    scheme the cluster sees, not just local paths)."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    out = fs.create(hpath, True)
    out.write(bytearray(json.dumps(payload).encode("utf-8")))
    out.close()


def _read_json(spark: SparkSession, path: str) -> dict:
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    stream = fs.open(hpath)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def read_stats(spark: SparkSession, index_dir: str) -> dict:
    return _read_json(spark, f"{index_dir}/stats.json")

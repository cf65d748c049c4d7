"""Continuous index ingest: Structured Streaming over the corpus
directory, feeding the segmented incremental build.

The reference's spider/indexer loop polls a work queue and indexes
newly crawled pages forever (`services/indexer/src/main.rs:24-57`
claim-loop; SURVEY §2.6 I1/I3). The Spark-native shape is a file-source
stream: ``readStream`` watches the corpus directory, and every
micro-batch of NEW files is ingested as its own index generation via
``foreachBatch`` → :func:`~search_engine_spark.plans.build.extend_index_df`
(the first batch bootstraps generation 0 with ``build_index_df``).

Exactly-once story, two layers deep:
- the stream checkpoint (``checkpointLocation``) records which source
  FILES each epoch consumed — a restarted stream never re-reads them;
- if a batch retries mid-ingest (driver crash between epoch start and
  commit), the engine's OWN lineage makes the replay idempotent: the
  incomplete generation is auto-resumed (completed partitions
  anti-joined away), and doc_ids already indexed by older generations
  are upsert-skipped. A fully-replayed batch degenerates to an empty
  extend.

At 100 TB this is the production ingest path: a crawler lands parquet
files continuously; ``availableNow`` drains the backlog in bounded
batches (``maxFilesPerTrigger``), a processing-time trigger tails it
live. Query engines see each generation atomically once its terms/stats
refresh lands.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.checkpoint import CheckpointLog
from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.build import build_index_df, extend_index_df

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    cfg: EngineConfig | None = None,
) -> dict | None:
    """Ingest one corpus micro-batch: bootstrap the base build if the
    index doesn't exist yet, else extend with a new generation. Shared
    by the streaming sink and any driver-side batch loop.

    CAUTION: inside ``foreachBatch`` the micro-batch DataFrame is bound
    to a CLONED SparkSession with isolated SQL conf (Structured
    Streaming's per-query session state) — every conf the build sets
    (``partitionOverwriteMode=dynamic``!) must go to THAT session or
    each wave's overwrite silently wipes the previous waves' partitions.
    We therefore run the whole ingest on ``batch.sparkSession``."""
    if batch.isEmpty():
        return None
    session = batch.sparkSession
    ckpt = CheckpointLog(session, f"{index_dir}/_checkpoint")
    if ckpt.completed_partitions("postings"):
        return extend_index_df(session, batch, index_dir, cfg)
    return build_index_df(session, batch, index_dir, cfg)


def stream_ingest(
    spark: SparkSession,
    corpus_dir: str,
    index_dir: str,
    cfg: EngineConfig | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    processing_interval: str = "30 seconds",
    prior_every_n_batches: int = 1,
    auto_compact: bool = False,
):
    """Start the ingest stream; returns the ``StreamingQuery``.

    ``available_now=True`` drains everything currently in
    ``corpus_dir`` and stops (the batch-drain mode the tests and a
    cron-style nightly ingest use); ``False`` keeps tailing with a
    processing-time trigger. Either way the stream checkpoint under
    ``checkpoint_dir`` (default ``{index_dir}/_stream``) makes re-runs
    pick up only files not yet ingested.

    ``prior_every_n_batches``: the link-prior rebuild is O(corpus) per
    run (full edge-resolve + PageRank), so recomputing it inside every
    micro-batch makes the graph pass — not the O(delta) tokenize/encode
    — the streaming bottleneck at scale. n>1 defers it (see
    ``EngineConfig.prior_refresh``) on all but every n-th epoch; epoch
    replays keep the same epoch_id, so the schedule is stable across
    stream restarts. The drain can end on a deferred epoch — run
    ``plans.build.refresh_prior`` (or ``compact_index``) afterwards if
    an exact prior matters before the next refresh epoch.

    ``auto_compact=True`` runs the tiered-merge check
    (:func:`~search_engine_spark.plans.build.maybe_compact`) after each
    ingested batch: when live segments exceed
    ``cfg.compact_max_generations`` (or tombstones exceed
    ``cfg.compact_max_tombstone_frac``) the generations merge back into
    one — which also rebuilds the prior, so deferred epochs are caught
    up on the same cadence. The probe is O(1) when it doesn't fire.
    """
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(corpus_dir)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        c = cfg or EngineConfig()
        if prior_every_n_batches > 1 and (epoch_id + 1) % prior_every_n_batches:
            c = replace(c, prior_refresh="defer")
        if ingest_batch(spark, batch, index_dir, c) is None:
            return
        if auto_compact:
            from search_engine_spark.plans.build import maybe_compact

            maybe_compact(batch.sparkSession, index_dir, c)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir or f"{index_dir}/_stream"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()

"""Corpus source: the engine's input table.

Input shape (BASELINE.json input_hint): an Iceberg table of source-code
files ``(repo string, path string, commit string, lang string,
content string)``. This sandbox has no Iceberg catalog jars, so the
loader reads the same layout from Parquet behind one function —
swapping ``spark.read.parquet`` for ``spark.read.format("iceberg")`` is
a config detail, not an architecture change (the whole engine consumes
only the returned DataFrame).

Identity & integrity (SURVEY §1.2):
- ``doc_id = xxhash64(repo, path, commit)`` — deterministic BIGINT
  replacing the reference's UUID page ids (`migration/schema.sql:9-17`);
  sortable and shuffle-friendly, computable JVM-side at scan speed.
- ``content_sha = sha2(content, 256)`` — the per-row integrity
  invariant vs the source (input_hint; lineage stores per-partition
  XOR digests so two builds can be compared without rescanning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read the raw corpus table (Parquet stand-in for Iceberg)."""
    return spark.read.parquet(path)


def with_identity(corpus: DataFrame) -> DataFrame:
    """Attach doc_id + content_sha. Runs at scan time, JVM-side only."""
    return corpus.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha", F.sha2("content", 256))


def docs_table(corpus_with_id: DataFrame) -> DataFrame:
    """The persisted per-doc metadata table (no content — column pruned
    away as early as possible; the analogue of the reference wiping
    ``pages.html`` post-index, SURVEY §2.1 S13)."""
    return corpus_with_id.select("doc_id", "repo", "path", "commit", "lang", "content_sha")

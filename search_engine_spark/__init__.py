"""search_engine_spark — a PySpark-native inverted-index + BM25 top-k engine.

A from-scratch, Spark-first rebuild of the query/data-processing
capabilities of the reference search engine (Hassan-ach/search-engine,
surveyed in SURVEY.md): distributed inverted-index construction with
salted repartition-by-term, delta+VByte frame-of-reference posting
compression with per-block max-score metadata (block-max WAND pruning),
a backlink graph re-expressed as self-join + groupBy feeding a PageRank
static prior, and checkpoint-resumable builds with per-partition lineage.

Everything is the DataFrame/SQL API + vectorized Arrow/pandas UDFs —
no RDDs, no per-row Python.
"""

__version__ = "0.1.0"

from search_engine_spark.config import EngineConfig  # noqa: F401

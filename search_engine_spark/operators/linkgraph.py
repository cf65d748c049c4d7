"""Backlink graph: reference extraction + self-join (SURVEY §2.3 J4).

The reference crawls ``<a href>`` links into a ``graph_edges`` table
(`services/spider/internal/store/store.go:79-93`,
`migration/schema.sql:33-38`). For a source-code corpus the analogue is
import/include statements: we extract referenced paths from ``content``
with JVM-side ``regexp_extract_all`` (no UDF — this is a plain
projection), explode + distinct them, and resolve each reference
against the corpus itself with a **self-join on path** — the
north_star's "self-join + groupBy aggregation".

Scale notes: the self-join is an equi-join on ``path``; at 10^12 rows
both sides shuffle-partition on path (or the doc side is bucketed by
path at ingest). ``dropDuplicates`` before the join keeps the edge
explosion bounded by distinct (src, ref) pairs, mirroring the
reference's ``ON CONFLICT (from,to) DO NOTHING`` dedupe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# import-style refs: `import <path>`; include-style: `#include "<path>"`.
# The fixture generator plants the import form; both are matched so real
# code corpora in other languages keep working. Patterns are passed as
# Column literals (not SQL-string literals) so regex backslashes don't
# go through SQL-literal escaping.
_IMPORT_RE = r"import (\S+)"
_INCLUDE_RE = r'#include "([^"]+)"'


_CANON_PASSES = 8  # fixpoint bound: handles ./ and seg/../ chains ≤ this deep


def canonicalize_ref(col):
    """Path canonicalization — the code-corpus analogue of the
    reference's URL normalization (`services/spider/internal/utils/
    normalization.go:46-71`, SURVEY §2.2 P4): collapse ``//``, strip
    ``./`` segments, resolve ``seg/../``, strip leading ``./`` and
    trailing ``/``. Global regexp_replace only rewrites non-overlapping
    matches, so both collapses loop to a fixpoint bound
    (``_CANON_PASSES`` ≥ max realistic import depth). Root-escaping
    refs (``../a`` with nothing left to pop) pass through unchanged —
    they can't resolve inside the corpus and drop out at the resolve
    join, same as the reference's unresolvable URLs. Pure JVM
    regexp_replace chain — no UDF."""
    c = F.regexp_replace(col, r"/{2,}", "/")
    for _ in range(_CANON_PASSES):
        c = F.regexp_replace(c, r"(^|/)\./", r"$1")
        c = F.regexp_replace(c, r"(^|/)(?!\.\.)[^/]+/\.\./", r"$1")
    c = F.regexp_replace(c, r"^\./", "")
    return F.regexp_replace(c, r"/$", "")


def extract_refs(corpus_with_id: DataFrame) -> DataFrame:
    """(doc_id, content) → (src_doc_id, ref_path), distinct.

    Column-pruned to (doc_id, content) at the scan; everything here is
    whole-stage-codegen expressions.
    """
    refs = corpus_with_id.select(
        F.col("doc_id").alias("src_doc_id"),
        F.array_union(
            F.regexp_extract_all("content", F.lit(_IMPORT_RE), F.lit(1)),
            F.regexp_extract_all("content", F.lit(_INCLUDE_RE), F.lit(1)),
        ).alias("refs"),
    )
    return (
        refs.select("src_doc_id", F.explode("refs").alias("raw_ref"))
        .select(
            "src_doc_id", canonicalize_ref(F.col("raw_ref")).alias("ref_path")
        )
        .dropDuplicates(["src_doc_id", "ref_path"])
    )


def resolve_edges(refs: DataFrame, docs: DataFrame) -> DataFrame:
    """(src_doc_id, ref_path) ⋈ (doc_id, path) → edges (src, dst).

    Unresolvable refs (paths not in the corpus) drop out via the inner
    join — same net behavior as the reference's URL table resolving
    only crawled pages. Takes the already-extracted refs so the caller
    decides where the content scan happens (build stage 1 side-writes
    refs per wave; stage 3 is then content-free)."""
    targets = docs.select(
        F.col("path").alias("ref_path"), F.col("doc_id").alias("dst")
    )
    return (
        refs.join(targets, "ref_path")
        .select(F.col("src_doc_id").alias("src"), "dst")
        .dropDuplicates(["src", "dst"])
    )


def build_edges(corpus_with_id: DataFrame) -> DataFrame:
    """corpus → edges (src, dst): the backlink-graph self-join
    (single-pass convenience wrapper over extract_refs + resolve_edges)."""
    return resolve_edges(
        extract_refs(corpus_with_id),
        corpus_with_id.select("doc_id", "path"),
    )


def in_degree(edges: DataFrame) -> DataFrame:
    """groupBy aggregation over the self-join output — the backlink
    count that the reference uses as crawl priority (SURVEY §2.1 S3)."""
    return edges.groupBy("dst").agg(F.count("*").alias("in_degree"))

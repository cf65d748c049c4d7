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
    """Read the raw corpus table.

    ``table:<identifier>`` reads a catalog table by name — with an
    Iceberg catalog configured (``spark.sql.catalog.*`` — jars absent
    in this sandbox) this IS the Iceberg path, including its partition
    pruning and snapshot semantics; it also serves temp views and the
    session catalog. Anything else is a Parquet directory path, the
    sandbox stand-in with the identical column layout. Every consumer
    sees only the returned DataFrame, so the source swap is total here.
    """
    if path.startswith("table:"):
        return spark.read.table(path[len("table:"):])
    fmt = _infer_format(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "json":
        # jsonlines with the declared schema — no inference pass over
        # the data (an inference scan at 100 TB doubles the read). JSON
        # fields match BY NAME, so key order is free; fields outside
        # CORPUS_COLUMNS are dropped by the declared schema (by design:
        # passthrough would need the inference scan this avoids — use
        # parquet/orc when extra columns must survive).
        return spark.read.schema(_CORPUS_DDL).json(path)
    if fmt == "csv":
        # CSV with an explicit schema maps columns POSITIONALLY
        # (header=true only skips the header row) — a reordered file
        # would silently mismap fields (e.g. lang read as commit), so
        # fail fast unless the header is exactly CORPUS_COLUMNS in
        # order.
        _validate_csv_header(spark, path)
        return (
            spark.read.schema(_CORPUS_DDL)
            .option("header", "true")
            .option("multiLine", "true")  # content may contain newlines
            .option("escape", '"')
            .csv(path)
        )
    raise ValueError(f"unsupported corpus format {fmt!r} for {path}")


def _validate_csv_header(spark: SparkSession, path: str) -> None:
    """Reject CSV inputs whose header names/order differ from
    ``CORPUS_COLUMNS`` (explicit-schema CSV reads are positional; see
    :func:`load_corpus`). Reads ONE line via the text source — no data
    scan. On a multi-file directory this samples one file's header;
    every file must share the layout (standard CSV-directory contract).
    """
    import csv as _csv

    first = spark.read.text(path).limit(1).collect()
    if not first:
        return  # empty input: the csv read returns an empty frame
    hdr = [h.strip().lower() for h in next(_csv.reader([first[0]["value"]]))]
    if hdr != CORPUS_COLUMNS:
        raise ValueError(
            f"CSV header {hdr} must be exactly {CORPUS_COLUMNS} (in "
            "order): explicit-schema CSV reads map columns positionally, "
            "so a reordered header would silently mismap fields"
        )


_CORPUS_DDL = (
    "repo string, path string, commit string, lang string, content string"
)


def _infer_format(path: str) -> str:
    """File format from the path suffix (``.jsonl``/``.json``,
    ``.csv``, ``.orc``; anything else reads as parquet — the default
    layout every driver table uses)."""
    p = path.rstrip("/").lower()
    for fmt, sufs in (
        ("json", (".json", ".jsonl", ".ndjson")),
        ("csv", (".csv",)),
        ("orc", (".orc",)),
    ):
        if p.endswith(sufs):
            return fmt
    return "parquet"


def with_identity(corpus: DataFrame) -> DataFrame:
    """Attach doc_id + content_sha. Runs at scan time, JVM-side only."""
    return corpus.withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).withColumn("content_sha", F.sha2("content", 256))


def filter_corpus(
    corpus: DataFrame,
    langs: list[str] | None = None,
    path_prefix: str | None = None,
    path_regex: str | None = None,
    min_len: int | None = None,
    max_len: int | None = None,
    path_col: str = "path",
    len_col: str | None = None,
) -> DataFrame:
    """Ingest-time URL/lang filters (SURVEY §2.2 P5; the reference's
    crawl-side URL normalization + language gate).

    Every predicate is a plain comparison on a scan column, so Catalyst
    pushes all of them into the parquet/Iceberg scan (PushedFilters —
    lang/prefix prune partitions and row groups before any decode). The
    length bound uses a materialized length column when one exists
    (``len_col``) so the filter can prune without reading content.
    """
    out = corpus
    if langs is not None:
        out = out.where(F.col("lang").isin(list(langs)))
    if path_prefix is not None:
        out = out.where(F.col(path_col).startswith(path_prefix))
    if path_regex is not None:
        out = out.where(F.col(path_col).rlike(path_regex))
    if min_len is not None or max_len is not None:
        length = F.col(len_col) if len_col else F.length("content")
        if min_len is not None:
            out = out.where(length >= min_len)
        if max_len is not None:
            out = out.where(length <= max_len)
    return out


DESCRIPTION_LEN = 300  # reference: first 300 chars of page text (parser.go:41-48)
KEYWORDS_K = 5         # reference: meta-keywords list (entity.go:16-26)


def keywords_from_postings(postings: DataFrame, k: int = KEYWORDS_K) -> DataFrame:
    """Parse-time keywords analogue (reference metadata carries a
    keywords list captured while parsing the page, entity.go:16-26):
    per doc, the top-``k`` terms by tf, ties broken by term asc —
    derived from the (doc_id, term, tf) postings the build ALREADY
    computed, so content is never tokenized a second time.

    (A per-row expression over the token array was the round-3 first
    cut and a scale bug: Catalyst does not CSE a subtree referenced
    from inside a higher-order-function lambda, so the tokenizer split
    re-ran once per distinct term per doc, interpreted — quadratic in
    document length. Aggregating the postings is one map-side-light
    shuffle of a narrow table instead.)

    Sort trick: structs order field-wise, so sorting (-tf, term)
    ascending IS (tf desc, term asc) — no comparator lambda."""
    return postings.groupBy("doc_id").agg(
        F.transform(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("tf")).cast("int").alias("ntf"),
                            F.col("term").alias("term"),
                        )
                    )
                ),
                1,
                k,
            ),
            lambda s: s["term"],
        ).alias("keywords")
    )


def docs_table(
    corpus_with_id: DataFrame, postings: DataFrame | None = None
) -> DataFrame:
    """The persisted per-doc metadata table (no content — column pruned
    away as early as possible; the analogue of the reference wiping
    ``pages.html`` post-index, SURVEY §2.1 S13).

    Result-metadata surface (SURVEY §2.2 P7/P8, reference
    `services/spider/internal/parser/helpers.go:11-37` + the 300-char
    description fallback at `parser.go:41-48` + the metadata struct at
    `services/spider/internal/entity/entity.go:16-26` — siteName ↦
    repo, locale ↦ lang, keywords ↦ top-tf terms): ``title`` is the
    path basename (the code-corpus analogue of the page title),
    ``description`` the first 300 chars of content, ``keywords`` the
    top-5 tf terms — all derived at build time, JVM-side, so queries
    never touch raw content.

    ``postings`` — pass the wave's already-materialized (doc_id, term,
    tf) table so keywords come from it (the build does this: one narrow
    read-back instead of a second content tokenize). When omitted the
    postings are derived here from content (small/standalone callers).
    """
    base = corpus_with_id.select(
        "doc_id", "repo", "path", "commit", "lang", "content_sha",
        F.element_at(F.split("path", "/"), -1).alias("title"),
        F.substring("content", 1, DESCRIPTION_LEN).alias("description"),
    )
    if postings is None:
        from search_engine_spark.functions.tokenize import (
            extract_postings_jvm,
        )

        postings = extract_postings_jvm(
            corpus_with_id.select("doc_id", "content")
        )
    kw = keywords_from_postings(postings.select("doc_id", "term", "tf"))
    return base.join(kw, "doc_id", "left").withColumn(
        "keywords",
        F.coalesce(F.col("keywords"), F.array().cast("array<string>")),
    )

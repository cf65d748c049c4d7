"""Pure-Python XXH64 must be bit-identical to Spark's xxhash64 —
the doc_id contract between the oracle/generator and the engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.functions.xxhash import doc_id_of, spark_xxhash64_str


def test_single_and_multi_column_parity(spark):
    rows = [
        ("org0/repo0", "src/pkg0/mod0.py", "a" * 40),
        ("o", "", "deadbeef"),
        ("unicode-ünïcødé", "päth/ƒile.py", "c0ffee"),
        ("x" * 100, "y" * 3, "z"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string")
    got = df.select(
        F.xxhash64("repo").alias("h1"),
        F.xxhash64("repo", "path", "commit").alias("h3"),
    ).collect()
    for (repo, path, commit), r in zip(rows, got):
        assert spark_xxhash64_str(repo) == r["h1"]
        assert doc_id_of(repo, path, commit) == r["h3"]


def test_fixture_doc_ids_match_spark(spark, fixture_dir, fixture_expected):
    df = spark.read.parquet(str(fixture_dir / "corpus.parquet"))
    got = {
        r["path"]: r["doc_id"]
        for r in df.select(
            "path", F.xxhash64("repo", "path", "commit").alias("doc_id")
        ).collect()
    }
    for d in fixture_expected["docs"]:
        assert got[d["path"]] == d["doc_id"]


def test_canonicalize_ref(spark):
    """Path canonicalization (SURVEY §2.2 P4 analogue)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.linkgraph import canonicalize_ref

    cases = {
        "src/pkg/mod.py": "src/pkg/mod.py",
        "./src/pkg/mod.py": "src/pkg/mod.py",
        "src//pkg///mod.py": "src/pkg/mod.py",
        "src/pkg/../other/mod.py": "src/other/mod.py",
        "a/b/../../c/mod.py": "c/mod.py",
        "src/./pkg/./mod.py": "src/pkg/mod.py",
        "src/pkg/": "src/pkg",
        # ADVICE r01: './'-chains a global replace leaves behind
        "././b": "b",
        "./././././mod.py": "mod.py",
        # 4-deep ../ chain
        "a/b/c/d/../../../../e/mod.py": "e/mod.py",
        # root-escape: passes through unchanged (documented; drops at join)
        "../a/mod.py": "../a/mod.py",
    }
    df = spark.createDataFrame([(k,) for k in cases], "p string")
    got = {r["p"]: r["c"] for r in df.select("p", canonicalize_ref(F.col("p")).alias("c")).collect()}
    assert got == cases


def test_load_corpus_table_identifier(spark, fixture_dir):
    """`table:<identifier>` dispatches to the catalog reader (the
    Iceberg path once a catalog is configured) and yields the identical
    corpus + identities as the Parquet-path read."""
    from search_engine_spark.sources.corpus import load_corpus, with_identity

    via_path = with_identity(load_corpus(spark, str(fixture_dir / "corpus.parquet")))
    spark.read.parquet(str(fixture_dir / "corpus.parquet")).createOrReplaceTempView(
        "corpus_tbl"
    )
    via_table = with_identity(load_corpus(spark, "table:corpus_tbl"))
    assert via_table.columns == via_path.columns
    a = {r["doc_id"]: r["content_sha"] for r in via_path.select("doc_id", "content_sha").collect()}
    b = {r["doc_id"]: r["content_sha"] for r in via_table.select("doc_id", "content_sha").collect()}
    assert a == b and len(a) == 200


def test_load_corpus_formats_equivalent(spark, tmp_path):
    """jsonlines / csv / orc corpora load to the same rows (and hence
    the same doc_ids/shas) as the parquet layout — a build from any
    source format produces an identical index input."""
    from search_engine_spark.sources.corpus import load_corpus, with_identity

    rows = [
        ("r0", "a/x.py", "c0", "py", 'line one\nand "quoted", two'),
        ("r1", "b/y.go", "c1", "go", "plain content here"),
    ]
    ddl = "repo string, path string, commit string, lang string, content string"
    df = spark.createDataFrame(rows, ddl)

    pq = str(tmp_path / "c.parquet")
    df.write.parquet(pq)
    want = {
        (r["doc_id"], r["content_sha"])
        for r in with_identity(load_corpus(spark, pq)).collect()
    }
    assert len(want) == 2

    jl = str(tmp_path / "c.jsonl")
    df.coalesce(1).write.json(jl)
    cv = str(tmp_path / "c.csv")
    df.coalesce(1).write.option("header", "true").option(
        "escape", '"'
    ).csv(cv)
    oc = str(tmp_path / "c.orc")
    df.coalesce(1).write.orc(oc)
    for p in (jl, cv, oc):
        got = {
            (r["doc_id"], r["content_sha"])
            for r in with_identity(load_corpus(spark, p)).collect()
        }
        assert got == want, p


def test_load_corpus_csv_rejects_reordered_header(spark, tmp_path):
    """Explicit-schema CSV reads map columns POSITIONALLY, so a
    reordered header would silently mismap fields (lang read as commit);
    load_corpus must fail fast instead. JSONL is immune (fields match
    by name, any key order)."""
    import pytest as _pytest

    from search_engine_spark.sources.corpus import load_corpus

    # column ORDER swapped relative to CORPUS_COLUMNS (lang before
    # commit), values correct for their named column
    bad = spark.createDataFrame(
        [("r0", "a/x.py", "py", "c0", "content body")],
        "repo string, path string, lang string, commit string, "
        "content string",
    )
    cv = str(tmp_path / "bad.csv")
    bad.coalesce(1).write.option("header", "true").csv(cv)
    with _pytest.raises(ValueError, match="positionally"):
        load_corpus(spark, cv)

    # same swapped layout as jsonlines loads correctly (by-name match)
    jl = str(tmp_path / "swapped.jsonl")
    bad.coalesce(1).write.json(jl)
    got = load_corpus(spark, jl).collect()
    assert [(r["commit"], r["lang"]) for r in got] == [("c0", "py")]

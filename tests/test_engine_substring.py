"""Engine-level substring search over the persisted trigram sidecar:
build with store_trigrams=True, query a cross-token needle, compare
against a direct corpus scan (the independent algorithm)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.build import build_index
from search_engine_spark.plans.query import QueryEngine
from search_engine_spark.sources.corpus import load_corpus, with_identity


@pytest.fixture(scope="module")
def tri_index(spark, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("trix") / "ix"
    corpus = str(fixture_dir / "corpus.parquet")
    build_index(spark, corpus, str(out),
                cfg=EngineConfig(store_trigrams=True))
    return str(out), corpus


def _pick_needle(spark, corpus):
    """A 9-char slice spanning a whitespace boundary of some doc —
    guaranteed present, untokenizable."""
    row = (
        with_identity(load_corpus(spark, corpus))
        .orderBy("doc_id").select("content").first()
    )
    text = row["content"].lower()
    i = text.index(" ", 20)
    needle = text[i - 4 : i + 5]
    assert " " in needle and len(needle) == 9
    return needle


def test_substring_matches_direct_scan(spark, tri_index):
    ix, corpus = tri_index
    needle = _pick_needle(spark, corpus)
    eng = QueryEngine(spark, ix, cfg=EngineConfig(store_trigrams=True))
    got = {r["doc_id"]: r["n_occ"]
           for r in eng.substring(needle, corpus, k=1000).collect()}
    lt = F.lower(F.col("content"))
    n_occ = ((F.length(lt) - F.length(F.replace(lt, F.lit(needle), F.lit(""))))
             / len(needle)).cast("int")
    want = {
        r["doc_id"]: r["n_occ"]
        for r in with_identity(load_corpus(spark, corpus))
        .where(lt.contains(needle)).select("doc_id", n_occ.alias("n_occ"))
        .collect()
    }
    assert got == want and got


def test_substring_no_sidecar_raises(spark, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("trix_no") / "ix"
    corpus = str(fixture_dir / "corpus.parquet")
    build_index(spark, corpus, str(out))  # no trigram sidecar
    eng = QueryEngine(spark, str(out))
    with pytest.raises(ValueError, match="store_trigrams"):
        eng.substring("anything here", corpus).collect()


def test_substring_absent_needle_empty(spark, tri_index):
    ix, corpus = tri_index
    eng = QueryEngine(spark, ix)
    assert eng.substring("zzqqxxyy not in corpus", corpus).collect() == []

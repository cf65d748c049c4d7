"""Porter analyzer (functions/porter.py, r4): scalar rules from the
1980 paper, generated-SQL twins identical on both engines, pandas form
identical to scalar, and the engine analyzer chain (build --porter →
query-side symmetry, extend inheritance) — the test_stem_engine model
one tier up."""

from __future__ import annotations

import random

import duckdb
import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.porter import (
    porter_duck_ctes,
    porter_series,
    porter_spark_stem,
    porter_stem,
)
from search_engine_spark.plans.build import build_index_df, extend_index_df
from search_engine_spark.plans.query import QueryEngine

# Full-pipeline expectations derived from the paper's rule lists
# (step-wise examples composed through all steps).
PAPER_CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # guards + y-chain shapes
    "a": "a", "be": "be", "as": "as", "syzygy": "syzygi", "sky": "sky",
}


def _word_pool(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    sufs = [
        "sses", "ies", "ss", "s", "eed", "ed", "ing", "y", "ational",
        "tional", "enci", "anci", "izer", "abli", "alli", "entli", "eli",
        "ousli", "ization", "ation", "ator", "alism", "iveness",
        "fulness", "ousness", "aliti", "iviti", "biliti", "icate",
        "ative", "alize", "iciti", "ical", "ful", "ness", "al", "ance",
        "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
        "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
        "e", "ll",
    ]
    out = set()
    while len(out) < n:
        mode = rng.random()
        if mode < 0.4:
            ln = rng.randint(1, 25)
            out.add("".join(
                rng.choice("abcdefghilmnoprstuvyz") for _ in range(ln)
            ))
        elif mode < 0.5:
            out.add("".join(rng.choice("ye") for _ in range(rng.randint(1, 12))))
        else:
            base = "".join(
                rng.choice("abcdefgmnoprstuy") for _ in range(rng.randint(1, 8))
            )
            out.add(base + rng.choice(sufs))
    return sorted(out)


def test_scalar_paper_cases():
    for w, want in PAPER_CASES.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_duck_sql_matches_scalar():
    words = _word_pool(42, 3000) + list(PAPER_CASES)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{w}')" for w in sorted(set(words)))
        + ") v(w)"
    )
    sql = (
        "WITH " + porter_duck_ctes("SELECT w AS doc_id, w FROM t")
        + "\nSELECT doc_id, w FROM pstem"
    )
    got = dict(con.sql(sql).fetchall())
    con.close()
    bad = [(w, got[w], porter_stem(w)) for w in got if got[w] != porter_stem(w)]
    assert not bad, bad[:10]


def test_spark_sql_matches_scalar(spark):
    words = _word_pool(7, 800) + list(PAPER_CASES)
    df = spark.createDataFrame([(w,) for w in sorted(set(words))], "tok string")
    out = porter_spark_stem(df.selectExpr("tok", "tok AS w"), "w").collect()
    got = {r["tok"]: r["w"] for r in out}
    bad = [(w, got[w], porter_stem(w)) for w in got if got[w] != porter_stem(w)]
    assert not bad, bad[:10]


def test_pandas_series_matches_scalar():
    import pandas as pd

    words = _word_pool(99, 2000)
    s = pd.Series(words, dtype="object")
    assert list(porter_series(s)) == [porter_stem(w) for w in words]


# ---- engine analyzer chain (the test_stem_engine model) ----

CFG = EngineConfig(stem="porter", build_waves=1, build_partitions=4)

DOCS = [
    ("r0", "a/join.py", "c0", "py", "joining tables needs sorted keys"),
    ("r0", "a/join2.py", "c0", "py", "a join sorts one key"),
    ("r0", "b/win.py", "c0", "py", "windows open over partitions"),
    ("r0", "b/win2.py", "c0", "py", "the window partition frame"),
    ("r0", "d/filler.py", "c0", "py", "unrelated filler words here"),
]
DELTA = [
    ("r1", "e/stream.py", "c1", "py", "streaming joins the windows"),
]


def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


@pytest.fixture(scope="module")
def porter_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("porter_ix") / "ix")
    build_index_df(spark, _corpus(spark, DOCS), ix, CFG)
    return ix


def test_index_vocab_is_porter_stemmed(spark, porter_index):
    vocab = {
        r["term"]
        for r in spark.read.parquet(f"{porter_index}/terms").collect()
    }
    # derivational variants merged ('joining'+'join' → 'join';
    # 'sorted'+'sorts' → 'sort'; 'windows'+'window' → 'window')
    assert "join" in vocab and "joining" not in vocab
    assert "sort" in vocab and "sorted" not in vocab
    assert "window" in vocab and "windows" not in vocab
    from search_engine_spark.plans.build import read_stats

    assert read_stats(spark, porter_index)["analyzer"] == "porter"


def test_query_side_symmetry(spark, porter_index):
    eng = QueryEngine(spark, porter_index, cache_docs=False)
    # 'joining' and 'join' are the same query under the analyzer
    a = [(r["doc_id"], r["score"]) for r in eng.bm25("joining", k=5).collect()]
    b = [(r["doc_id"], r["score"]) for r in eng.bm25("join", k=5).collect()]
    assert a == b and a
    hits = {r["path"] for r in eng.bm25("sorted windows", k=5).collect()}
    assert {"a/join.py", "b/win.py", "b/win2.py"} <= hits


def test_extend_inherits_porter(spark, porter_index):
    extend_index_df(
        spark, _corpus(spark, DELTA), porter_index,
        EngineConfig(stem=False, build_waves=1, build_partitions=4),
    )
    vocab = {
        r["term"]
        for r in spark.read.parquet(f"{porter_index}/terms").collect()
    }
    assert "stream" in vocab and "streaming" not in vocab
    eng = QueryEngine(spark, porter_index, cache_docs=False)
    hits = {r["path"] for r in eng.bm25("streaming", k=3).collect()}
    assert "e/stream.py" in hits


def test_jvm_kernel_matches_pandas_kernel(spark):
    """Both build kernels produce identical porter postings."""
    from search_engine_spark.functions.tokenize import (
        extract_postings,
        extract_postings_jvm,
    )

    corpus = _corpus(spark, DOCS).selectExpr(
        "xxhash64(repo, path, commit) AS doc_id", "content"
    )
    a = {
        (r["doc_id"], r["term"], r["tf"], r["dl"])
        for r in extract_postings(corpus, "content", stem="porter").collect()
    }
    b = {
        (r["doc_id"], r["term"], r["tf"], r["dl"])
        for r in extract_postings_jvm(corpus, "content", stem="porter").collect()
    }
    assert a == b and a


def test_phrase_and_near_on_porter_positions(spark, tmp_path):
    """The positional sidecar stems with the porter analyzer too (the
    exploded-positions path maps through the same vocab broadcast), and
    phrase/NEAR query legs analyze symmetrically — 'joining tables'
    matches the 'join table' adjacency."""
    docs = [
        ("r0", "a/j.py", "c0", "py", "joining tables needs care"),
        ("r0", "a/j2.py", "c0", "py", "the join table path works"),
        ("r0", "b/x.py", "c0", "py", "tables without the verb nearby"),
    ]
    ix = str(tmp_path / "ixp")
    build_index_df(
        spark, _corpus(spark, docs), ix,
        EngineConfig(stem="porter", store_positions=True,
                     build_waves=1, build_partitions=4),
    )
    eng = QueryEngine(spark, ix, cache_docs=False)
    hits = {r["path"] for r in eng.phrase("joining tables", k=5).collect()}
    assert hits == {"a/j.py", "a/j2.py"}
    near = {r["path"] for r in eng.near("joins", "tabled", window=3).collect()}
    assert {"a/j.py", "a/j2.py"} <= near

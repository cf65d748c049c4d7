"""Milestone 2+: the persisted compressed index must answer queries
rank-identically to the oracle — through both the exhaustive decode
path and block-max WAND — and the §8.4 blended ranking must match the
oracle's blend. Also covers the build→query round trip via
``build_index`` / ``QueryEngine``."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest

from search_engine_spark.plans.build import build_index, read_stats
from search_engine_spark.plans.query import QueryEngine
from tests.oracle import blended_topk as oracle_blended
from tests.oracle import bm25_topk as oracle_topk
from tests.oracle import build_oracle_index, pagerank as oracle_pagerank
from tests.oracle import refcompat_blended_topk as oracle_refcompat

REL_TOL = 1e-9


@pytest.fixture(scope="module")
def index_dir(spark, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("index") / "ix"
    summary = build_index(spark, str(fixture_dir / "corpus.parquet"), str(out))
    assert summary["n_docs"] == 200
    return str(out)


@pytest.fixture(scope="module")
def engine(spark, index_dir):
    return QueryEngine(spark, index_dir)


@pytest.fixture(scope="module")
def oracle_ix(fixture_dir):
    tbl = pq.read_table(fixture_dir / "corpus.parquet").to_pylist()
    expected = json.loads((fixture_dir / "expected.json").read_text())
    by_path = {d["path"]: d["doc_id"] for d in expected["docs"]}
    docs = [
        {"doc_id": by_path[r["path"]], "path": r["path"], "content": r["content"]}
        for r in tbl
    ]
    ix = build_oracle_index(docs)
    ix.prior = oracle_pagerank([tuple(e) for e in expected["edges"]])
    return ix


def test_stats_roundtrip(spark, index_dir, oracle_ix):
    stats = read_stats(spark, index_dir)
    assert stats["n_docs"] == oracle_ix.n_docs
    assert stats["avgdl"] == pytest.approx(oracle_ix.avgdl, rel=1e-12)


def test_exhaustive_compressed_rank_identity(engine, oracle_ix, fixture_queries):
    for q in fixture_queries:
        expected = oracle_topk(oracle_ix, q, k=10)
        got = engine.bm25(q, k=10, wand=False).collect()
        assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected], q
        for r, e in zip(got, expected):
            assert r["score"] == pytest.approx(e["score"], rel=REL_TOL), (q, r["doc_id"])
            assert r["matched"] == e["matched"]


def test_wand_rank_identity(engine, oracle_ix, fixture_queries):
    for q in fixture_queries:
        expected = oracle_topk(oracle_ix, q, k=10)
        got = engine.bm25(q, k=10, wand=True).collect()
        assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected], q
        for r, e in zip(got, expected):
            assert r["score"] == pytest.approx(e["score"], rel=REL_TOL), (q, r["doc_id"])


def test_blended_rank_identity(engine, oracle_ix, fixture_queries):
    for q in fixture_queries:
        expected = oracle_blended(oracle_ix, q, k=10)
        got = engine.search(q, k=10).collect()
        assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected], q
        for r, e in zip(got, expected):
            assert r["global_score"] == pytest.approx(e["global_score"], rel=1e-6), (
                q, r["doc_id"],
            )


def test_result_metadata_surface(spark, engine, fixture_dir, fixture_queries):
    """Results carry title (path basename) + description (first 300
    content chars) — the reference's rendered metadata (helpers.go:11-37,
    parser.go:41-48 fallback)."""
    import pyarrow.parquet as pq

    content_by_path = {
        r["path"]: r["content"]
        for r in pq.read_table(fixture_dir / "corpus.parquet").to_pylist()
    }
    rows = engine.bm25(fixture_queries[0], k=5).collect()
    assert rows
    from collections import Counter

    from search_engine_spark.functions.tokenize import tokenize

    for r in rows:
        assert r["title"] == r["path"].rsplit("/", 1)[-1]
        assert r["description"] == content_by_path[r["path"]][:300]
        # r3: full reference metadata struct (entity.go:16-26 —
        # siteName↦repo, locale↦lang, + commit and keywords)
        assert r["repo"] and r["lang"] and r["commit"]
        tf = Counter(tokenize(content_by_path[r["path"]]))
        want = [t for t, _ in sorted(tf.items(), key=lambda e: (-e[1], e[0]))][:5]
        assert list(r["keywords"]) == want
    srows = engine.search(fixture_queries[0], k=5).collect()
    assert srows and all(
        r["title"] and r["description"] and r["repo"] and r["lang"]
        and r["commit"] and len(r["keywords"]) > 0
        for r in srows
    )


def test_refcompat_cosine_rank_identity(engine, oracle_ix, fixture_queries):
    """mode='cosine' runs the reference TF-IDF-cosine pipeline
    end-to-end (quirky idf → cosine → min-max → 0.5 blend with the
    prior) and must be rank-identical to the NumPy port."""
    for q in fixture_queries[:6]:
        expected = oracle_refcompat(oracle_ix, q, k=10)
        got = engine.search(q, k=10, mode="cosine").collect()
        assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected], q
        for r, e in zip(got, expected):
            assert r["global_score"] == pytest.approx(e["global_score"], rel=1e-6), (
                q, r["doc_id"],
            )
            assert r["score"] == pytest.approx(e["score"], rel=1e-6)


def test_bm25_pagination(engine, oracle_ix, fixture_queries):
    """page=1 returns exactly oracle ranks 11-20, on both score paths
    (store.go:85-98 pagination semantics applied to the BM25 ranking)."""
    q = fixture_queries[0]
    expected = oracle_topk(oracle_ix, q, k=20)[10:20]
    for wand in (True, False):
        got = engine.bm25(q, k=10, page=1, wand=wand).collect()
        assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected], wand
        for r, e in zip(got, expected):
            assert r["score"] == pytest.approx(e["score"], rel=REL_TOL)


def _collapse_expected(rows, group_fn, k):
    """Reference collapse over an already-rank-verified full result
    list: stable multi-pass sort into the frozen §8.4 order, first
    occurrence per group wins, first k groups returned."""
    ordered = sorted(rows, key=lambda r: r["doc_id"])
    ordered.sort(key=lambda r: r["path"] or "", reverse=True)
    ordered.sort(key=lambda r: (r["score"], r["matched"]), reverse=True)
    seen, out = set(), []
    for r in ordered:
        g = group_fn(r)
        if g not in seen:
            seen.add(g)
            out.append(r)
    return out[:k]


def test_collapse_one_per_repo(engine, fixture_queries):
    """collapse='repo' = ES field collapsing: at most one hit per repo,
    each group's best under the frozen rank order, groups ranked by
    their best hit. Expected derived by collapsing the (already
    rank-identity-verified) full exhaustive result list in Python."""
    for q in fixture_queries[:4]:
        full = engine.bm25(q, k=10_000, wand=False).collect()
        if not full:
            continue
        expected = _collapse_expected(full, lambda r: r["repo"], k=10)
        got = engine.bm25(q, k=10, collapse="repo").collect()
        assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected], q
        repos = [r["repo"] for r in got]
        assert len(repos) == len(set(repos))
        for r, e in zip(got, expected):
            assert r["score"] == pytest.approx(e["score"], rel=REL_TOL)


def test_collapse_composes_with_offset_page(engine, fixture_queries):
    q = fixture_queries[0]
    full = engine.bm25(q, k=10_000, wand=False).collect()
    expected = _collapse_expected(full, lambda r: r["repo"], k=10)[5:10]
    got = engine.bm25(q, k=5, page=1, collapse="repo").collect()
    assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected]


def test_collapse_rejects_cursor_and_unknown_column(engine, fixture_queries):
    q = fixture_queries[0]
    with pytest.raises(ValueError, match="collapse"):
        engine.bm25(q, k=5, collapse="repo", after=(1.0, 1, "x", 0))
    with pytest.raises(ValueError, match="not in result surface"):
        engine.bm25(q, k=5, collapse="no_such_column")


def test_blended_pagination(engine, oracle_ix, fixture_queries):
    """Candidate-window pagination: page_num=1 re-ranks the SECOND
    candidate window, exactly like the reference's LIMIT/OFFSET CTE."""
    for q in fixture_queries[:4]:
        expected = oracle_blended(oracle_ix, q, k=10, page_num=1)
        got = engine.search(q, k=10, page_num=1).collect()
        assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected], q
        for r, e in zip(got, expected):
            assert r["global_score"] == pytest.approx(e["global_score"], rel=1e-6)


def test_spell_correction_expands_and_retrieves(engine, oracle_ix, fixture_queries):
    """An ED-1 misspelling of a vocabulary term still retrieves: the
    expansion contains the correction, and the spell-corrected BM25
    ranking equals the oracle ranking over the expanded term set."""
    # pick a long, reasonably-frequent vocab term and break it
    term = max(oracle_ix.df, key=lambda t: (len(t) >= 5, oracle_ix.df[t], t))
    typo = term + "x"
    assert typo not in oracle_ix.df
    expanded = engine.expand_query_terms([typo])
    assert term in expanded
    assert len(expanded) <= 3
    got = engine.bm25(typo, k=10, spell=True).collect()
    expected = oracle_topk(oracle_ix, " ".join(expanded), k=10)
    assert [r["doc_id"] for r in got] == [e["doc_id"] for e in expected]
    for r, e in zip(got, expected):
        assert r["score"] == pytest.approx(e["score"], rel=REL_TOL)
    # in-vocab terms pass through untouched
    assert engine.expand_query_terms([term]) == [term]


def test_pagerank_personalized_matches_oracle(spark, fixture_expected):
    """Personalization vector (reference page_rank.py:57-63): teleport
    and dangling mass follow the normalized per-node weights."""
    from search_engine_spark.operators.pagerank import pagerank as spark_pagerank

    edges = [tuple(e) for e in fixture_expected["edges"]]
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    pers = {node: float(node % 5 + 1) for node in nodes}
    expected = oracle_pagerank(edges, personalization=pers)
    edf = spark.createDataFrame(edges, "src long, dst long")
    pdf = spark.createDataFrame(list(pers.items()), "id long, weight double")
    got = {
        r["doc_id"]: r["score"]
        for r in spark_pagerank(edf, personalization=pdf).collect()
    }
    assert set(got) == set(expected)
    assert sum(abs(got[d] - expected[d]) for d in expected) < 1e-6
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_check_every_batches_syncs(spark, fixture_expected):
    """check_every=5 (VERDICT r02 item 7): one residual collect per 5
    joined iterations. The batched run may overshoot the tol crossing
    by ≤4 refining iterations, so it and the per-iteration oracle are
    each within tol/(1−d) L1 of the true fixpoint — assert their
    mutual distance under twice that bound, plus mass conservation."""
    from search_engine_spark.config import PAGERANK_DAMPING, PAGERANK_TOL
    from search_engine_spark.operators.pagerank import pagerank as spark_pagerank

    edges = [tuple(e) for e in fixture_expected["edges"]]
    expected = oracle_pagerank(edges)
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["doc_id"]: r["score"]
        for r in spark_pagerank(edf, check_every=5).collect()
    }
    assert set(got) == set(expected)
    bound = 2 * PAGERANK_TOL / (1 - PAGERANK_DAMPING)
    assert sum(abs(got[d] - expected[d]) for d in expected) < bound
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_warm_start(spark, fixture_expected):
    """Warm-start (incremental prior refresh): seeding from the previous
    fixpoint converges in a handful of iterations to the SAME ranks;
    seeding from an arbitrary (unnormalized, partially-covering) vector
    still reaches the same fixpoint — power iteration converges from any
    start and pagerank() renormalizes the seed."""
    from search_engine_spark.config import PAGERANK_DAMPING, PAGERANK_TOL
    from search_engine_spark.operators.pagerank import pagerank as spark_pagerank

    edges = [tuple(e) for e in fixture_expected["edges"]]
    expected = oracle_pagerank(edges)
    edf = spark.createDataFrame(edges, "src long, dst long")

    cold_stats: dict = {}
    cold = spark_pagerank(edf, stats=cold_stats).collect()
    cold_map = {r["doc_id"]: r["score"] for r in cold}
    bound = 2 * PAGERANK_TOL / (1 - PAGERANK_DAMPING)
    assert sum(abs(cold_map[d] - expected[d]) for d in expected) < bound

    # 1) seed = the cold fixpoint → first residual is already < tol
    seed = spark.createDataFrame(
        [(d, s) for d, s in cold_map.items()], "doc_id long, score double"
    )
    warm_stats: dict = {}
    warm = {
        r["doc_id"]: r["score"]
        for r in spark_pagerank(edf, init_ranks=seed, stats=warm_stats).collect()
    }
    assert warm_stats["iterations"] <= 2
    assert warm_stats["iterations"] < cold_stats["iterations"]
    assert sum(abs(warm[d] - cold_map[d]) for d in cold_map) < bound
    assert sum(warm.values()) == pytest.approx(1.0, abs=1e-6)

    # 2) stale/partial/unnormalized seed: scale ×7, drop half the ids,
    # add a dead id — deleted ids drop out, missing ids reseed at 1/n,
    # the vector renormalizes, and the SAME fixpoint comes back
    stale_rows = [
        (d, 7.0 * s) for i, (d, s) in enumerate(sorted(cold_map.items()))
        if i % 2 == 0
    ] + [(10**9 + 7, 3.5)]
    stale = spark.createDataFrame(stale_rows, "doc_id long, score double")
    got = {
        r["doc_id"]: r["score"]
        for r in spark_pagerank(edf, init_ranks=stale).collect()
    }
    assert set(got) == set(expected)  # dead id not resurrected
    assert sum(abs(got[d] - cold_map[d]) for d in cold_map) < 2 * bound
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_matches_oracle(spark, index_dir, fixture_expected):
    prior = {
        r["doc_id"]: r["score"]
        for r in spark.read.parquet(f"{index_dir}/prior").collect()
    }
    expected = oracle_pagerank([tuple(e) for e in fixture_expected["edges"]])
    assert set(prior) == set(expected)
    l1 = sum(abs(prior[d] - expected[d]) for d in expected)
    assert l1 < 1e-6
    assert sum(prior.values()) == pytest.approx(1.0, abs=1e-6)


def test_edges_match_expected(spark, index_dir, fixture_expected):
    got = {
        (r["src"], r["dst"])
        for r in spark.read.parquet(f"{index_dir}/edges").collect()
    }
    assert got == {tuple(e) for e in fixture_expected["edges"]}


def test_sha256_integrity(spark, index_dir, fixture_expected):
    """Per-row content sha256 equality vs the source (input_hint)."""
    got = {r["doc_id"]: r["content_sha"]
           for r in spark.read.parquet(f"{index_dir}/docs").collect()}
    for d in fixture_expected["docs"]:
        assert got[d["doc_id"]] == d["sha256"]


def test_bm25_batch_matches_single(engine, fixture_queries):
    """One batched job must return exactly what Q single-query calls
    return: same doc ids in the same order, same scores (both paths are
    the exhaustive decode + float64 sum, so equality is to 1e-9 rel)."""
    queries = {f"q{i}": q for i, q in enumerate(fixture_queries[:5])}
    batch = engine.bm25_batch(queries, k=10)
    by_q: dict[str, list] = {}
    for r in batch.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in queries.items():
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rk"])
        single = engine.bm25(qtext, k=10, wand=False).collect()
        assert [r["doc_id"] for r in rows] == [s["doc_id"] for s in single], qid
        for r, s in zip(rows, single):
            assert r["score"] == pytest.approx(s["score"], rel=1e-9)
            assert r["matched"] == s["matched"]


def test_facets_match_exhaustive_scores(spark, engine, fixture_queries):
    """Engine facets over the compressed index must agree with a direct
    aggregation of the exhaustive matching set joined to the corpus
    dims: same values, same counts, same max scores."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    q = fixture_queries[0]
    # k must comfortably exceed the 200-doc fixture corpus, but stay
    # small: TakeOrderedAndProject sizes per-partition heaps by k
    scored = {
        r["doc_id"]: r["score"]
        for r in engine.bm25(q, k=1000, wand=False).collect()
    }
    assert scored, "fixture query must match something"
    dims = {
        r["doc_id"]: (r["lang"], r["repo"])
        for r in spark.read.parquet(f"{engine.index_dir}/docs")
        .select("doc_id", "lang", "repo").collect()
    }
    want = defaultdict(lambda: [0, 0.0])
    for doc_id, score in scored.items():
        lang, repo = dims[doc_id]
        for facet, value in (("lang", lang), ("repo", repo)):
            slot = want[(facet, value)]
            slot[0] += 1
            slot[1] = max(slot[1], score)
    got = engine.facets(q).collect()
    assert {(r["facet"], r["value"]): r["n_docs"] for r in got} == {
        k: v[0] for k, v in want.items()
    }
    for r in got:
        assert r["max_score"] == pytest.approx(
            round(want[(r["facet"], r["value"])][1], 4), abs=1e-4
        )


def test_facets_empty_query(engine):
    assert engine.facets("zzzunknownzzz").collect() == []


def test_huge_k_does_not_allocate_huge_heaps(engine, fixture_queries):
    """k >= corpus size must degrade to a plain sort (no limit), not a
    TakeOrderedAndProject with a k-sized per-partition heap — and the
    results must equal the bounded top-k on the shared prefix."""
    q = fixture_queries[0]
    big = engine.bm25(q, k=10**9, wand=False).collect()
    small = engine.bm25(q, k=10, wand=False).collect()
    assert [r["doc_id"] for r in big[:10]] == [r["doc_id"] for r in small]
    plan = engine.bm25(q, k=10**9, wand=False)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan


def test_batch_encoder_identical_to_grouped(spark):
    """The vectorized mapInPandas encoder must produce byte-identical
    block rows to the per-group applyInPandas spec kernel — same blocks,
    same delta+VByte bytes, same (max_tf, min_dl) metadata — on a
    synthetic corpus with hot salted terms (groups spanning many blocks
    AND many Arrow batches), rare unsalted terms (salt = -1), and
    singleton posting lists."""
    import random

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.compress import encode_blocks

    rng = random.Random(7)
    rows = []
    # hot term: 5000 postings (spans Arrow batches at the shrunken size)
    for i in range(5000):
        rows.append((rng.getrandbits(63) - (1 << 62), "hot", 1 + i % 7, 40))
    # mid terms
    for t in range(20):
        for i in range(rng.randint(2, 300)):
            rows.append(
                (rng.getrandbits(63) - (1 << 62), f"mid{t}", 1 + i % 5, 30)
            )
    # rare terms incl. singletons
    for t in range(50):
        for i in range(rng.randint(1, 3)):
            rows.append((rng.getrandbits(63) - (1 << 62), f"rare{t}", 1, 10))
    postings = spark.createDataFrame(
        rows, "doc_id long, term string, tf int, dl int"
    )
    term_df = postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )

    old_batch = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    try:
        cfg_b = EngineConfig(encode_kernel="batch", rare_salt_df_threshold=64)
        cfg_g = EngineConfig(encode_kernel="grouped", rare_salt_df_threshold=64)
        key = ["bucket", "term", "salt", "block_id"]
        got = {
            tuple(r[k] for k in key): r.asDict()
            for r in encode_blocks(postings, cfg_b, term_df=term_df).collect()
        }
        want = {
            tuple(r[k] for k in key): r.asDict()
            for r in encode_blocks(postings, cfg_g, term_df=term_df).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old_batch
        )
    assert set(got) == set(want)
    for k, g in got.items():
        w = want[k]
        assert g == w, f"block mismatch at {k}: {g} vs {w}"
    # sanity: the hot term actually fanned out salted and multi-block,
    # and rare terms actually packed unsalted
    assert any(k[1] == "hot" and k[2] >= 0 and k[3] > 0 for k in got)
    assert any(k[1].startswith("rare") and k[2] == -1 for k in got)

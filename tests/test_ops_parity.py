"""Mirror of the driver's correctness gate at sf0.001 + op invariants.

- every ``__spark_entry__.queries()`` entry with an ``oracle_sql()``
  twin must match DuckDB exactly (rowcount, column names, values) on
  the driver's sf0.001 tables;
- the ops-side JVM tokenizer (``sqltwin.tokens_col``) must agree with
  the engine's vectorized pandas tokenizer (frozen spec §8.1);
- the ASCII assumption behind ``mm_extract_features`` holds for the
  driver tables;
- LSH-ANN results are a subset of the brute-force top-k universe.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_parity import TABLES, _canon  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# `pytest -m parity` runs just this mirror (twin-drift check at commit
# time, VERDICT r3 item 7); it still runs in the default full suite.
pytestmark = pytest.mark.parity

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    from tools.check_parity import complex_cols

    sdf = _QUERIES[name](spark, SF_DIR)
    # Driver contract: its canonicalizer pandas-lexsorts the output and
    # cannot hash array/map/struct cells (sim_pq_codes, r4) — every
    # registered query must emit scalar columns only.
    assert not complex_cols(sdf.schema), (
        f"{name}: complex-typed output columns {complex_cols(sdf.schema)}"
    )
    srows = [tuple(r) for r in sdf.collect()]
    if name not in _ORACLES:
        assert srows is not None  # rows-only contract: runs, stable schema
        return
    rel = duck.sql(_ORACLES[name])
    sc, scn = _canon(srows, sdf.columns)
    dc, dcn = _canon(rel.fetchall(), list(rel.columns))
    assert scn == dcn, f"column mismatch: {scn} vs {dcn}"
    assert len(sc) == len(dc), f"rowcount {len(sc)} vs {len(dc)}"
    assert sc == dc


def test_ops_tokenizer_matches_engine_tokenizer(spark):
    """sqltwin.tokens_col (JVM) ≡ functions.tokenize (frozen spec)."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.tokenize import tokenize
    from search_engine_spark.ops.sqltwin import tokens_col

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    got = docs.select("doc_id", tokens_col("text").alias("toks"), "text").collect()
    for r in got:
        assert list(r["toks"]) == tokenize(r["text"]), r["doc_id"]


def test_documents_are_ascii(spark):
    """mm_extract_features' chars==bytes assumption."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bad = docs.where(
        F.length("text") != F.length(F.encode(F.col("text"), "utf-8"))
    ).count()
    assert bad == 0


def test_ann_subset_of_bruteforce_universe(spark):
    """Every ANN hit is a valid vector id with the exact same cosine the
    brute-force path computes (LSH prunes candidates, never rescores)."""
    from search_engine_spark.ops import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, k=10**6).collect()
    }
    ann = similarity.ann_lsh_topk(emb).collect()
    assert len(ann) > 0
    for r in ann:
        key = (r["query_id"], r["vec_id"])
        assert key in brute
        assert brute[key] == pytest.approx(r["cosine"], abs=1e-9)


def test_filtered_ann_prefilter_semantics(spark):
    """Pre-filter contract of the filtered IVF-PQ path: every hit shares
    the query's label AND lives in the query's probed coarse cluster;
    its ADC distance equals the unfiltered IVF-PQ distance for that pair
    (the filter prunes candidates, never rescores); the recall ledger's
    hit counts are consistent with the two top-k sets."""
    from search_engine_spark.ops import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in
              emb.select("vec_id", "label").collect()}
    clus = {r["vec_id"]: r["cid"] for r in
            similarity.ivf_assignments(emb).collect()}
    unfiltered = {
        (r["query_id"], r["vec_id"]): r["adc_dist"]
        for r in similarity.ivfpq_topk(emb, k=10**6).collect()
    }
    ann = similarity.filtered_ann_topk(emb).collect()
    assert len(ann) > 0
    for r in ann:
        assert r["label"] == labels[r["query_id"]]
        assert clus[r["vec_id"]] == clus[r["query_id"]]
        assert unfiltered[(r["query_id"], r["vec_id"])] == r["adc_dist"]

    exact = {(r["query_id"], r["vec_id"])
             for r in similarity.filtered_cosine_topk(emb).collect()}
    annset = {(r["query_id"], r["vec_id"]) for r in ann}
    got = {r["query_id"]: r["hits_at_k"]
           for r in similarity.filtered_ann_recall(emb).collect()}
    for qid, n in got.items():
        assert n == len({p for p in exact & annset if p[0] == qid})


def test_retrieval_mode_invariants(spark):
    """Boolean-mode algebra over the same scored set (Lucene BooleanQuery
    semantics): conj ⊆ msm ⊆ disjunctive; MUST_NOT output is disjoint
    from the excluded-term posting list; synonym-blended matches are
    exactly the docs matching any variant; explain partials sum to the
    hit's score."""
    from pyspark.sql import functions as F

    from search_engine_spark.ops import search_sql as ss

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    scored = {
        r["doc_id"]: (r["score"], r["matched"])
        for r in ss.bm25_scores(spark, docs, ss.QUERY_MAIN).collect()
    }

    # min-should-match: every hit has matched >= threshold, scores are
    # the unchanged disjunctive scores, and full-AND hits all qualify
    msm = ss.bm25_topk_msm(spark, docs, ss.QUERY_MAIN).collect()
    assert len(msm) > 0
    for r in msm:
        assert r["matched"] >= ss.MSM_MIN
        assert scored[r["doc_id"]][0] == pytest.approx(r["score"])
    conj_ids = {
        r["doc_id"] for r in ss.bm25_topk_conj(spark, docs, ss.QUERY_MAIN).collect()
    }
    msm_eligible = {d for d, (_, m) in scored.items() if m >= ss.MSM_MIN}
    assert conj_ids <= msm_eligible

    # MUST_NOT: no hit contains an excluded term
    post = ss.postings(docs)
    ex_ids = {
        r["doc_id"]
        for r in post.where(
            F.col("term").isin(sorted(set(ss.QUERY_EXCLUDE)))
        ).select("doc_id").distinct().collect()
    }
    hits_not = ss.bm25_topk_not(spark, docs, ss.QUERY_MAIN).collect()
    assert len(hits_not) > 0
    assert {r["doc_id"] for r in hits_not}.isdisjoint(ex_ids)

    # synonyms: matched counts groups (≤ len(SYN_GROUPS)) and every hit
    # contains at least one variant of some group
    variants = sorted({t for g in ss.SYN_GROUPS for t in g})
    var_ids = {
        r["doc_id"]
        for r in post.where(F.col("term").isin(variants))
        .select("doc_id").distinct().collect()
    }
    syn = ss.bm25_topk_syn(spark, docs).collect()
    assert len(syn) > 0
    for r in syn:
        assert 1 <= r["matched"] <= len(ss.SYN_GROUPS)
        assert r["doc_id"] in var_ids

    # explain: per-doc sum of partials reconstructs the BM25 score
    # (both sides rounded at 4dp, so agree within stacked rounding)
    exp = ss.bm25_explain(spark, docs, ss.QUERY_MAIN).collect()
    assert len(exp) > 0
    by_doc: dict[int, list] = {}
    for r in exp:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        total = sum(r["partial"] for r in rows)
        assert total == pytest.approx(rows[0]["score"], abs=1e-3)
        assert rows[0]["score"] == pytest.approx(scored[doc_id][0])


def test_rank_eval_matches_bruteforce(spark):
    """nDCG@k / MRR@k ledger vs an independent Python computation over
    the same scored set (grades = matched term counts)."""
    import math

    from search_engine_spark.ops import search_sql as ss

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = ss.TOPK
    got = {r["query_id"]: r for r in ss.rank_eval(spark, docs).collect()}
    batch = ss._batch_scored(spark, docs, ss.BATCH_QUERIES).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)

    for qid, terms in ss.BATCH_QUERIES.items():
        rows = by_q[qid]
        n_terms = len(set(terms))
        ranked = sorted(rows, key=lambda r: (-r["score"], r["doc_id"]))
        ideal = sorted(rows, key=lambda r: (-r["matched"], r["doc_id"]))
        dcg = sum(
            math.floor(1e9 * (2 ** r["matched"] - 1) / math.log2(i + 2))
            for i, r in enumerate(ranked[:k])
        )
        idcg = sum(
            math.floor(1e9 * (2 ** r["matched"] - 1) / math.log2(i + 2))
            for i, r in enumerate(ideal[:k])
        )
        ff = next(
            (i + 1 for i, r in enumerate(ranked[:k])
             if r["matched"] == n_terms),
            None,
        )
        g = got[qid]
        assert g["ndcg"] == pytest.approx(round(dcg / idcg, 4), abs=1e-9)
        assert g["mrr_e6"] == (1_000_000 // ff if ff else 0)
        assert g["n_full"] == sum(1 for r in rows if r["matched"] == n_terms)
    # the OOV-term query can never fully match → MRR must be 0 there
    assert got["q_mixed"]["mrr_e6"] == 0
    # single-term query: every matched doc has grade 1, so all gains are
    # equal and any order is ideal ⇒ nDCG exactly 1
    assert got["q_single"]["ndcg"] == 1.0


def test_search_after_keyset(spark):
    """Keyset pagination algebra: page1 ++ after-page == the single-shot
    top-2k (no skips, no repeats), both for the self-derived cursor
    (gate shape) and an explicit client cursor."""
    from search_engine_spark.ops import search_sql as ss

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = ss.TOPK
    both = ss.bm25_topk(spark, docs, ss.QUERY_MAIN, k=2 * k).collect()
    assert len(both) > k
    page1, want2 = both[:k], both[k:2 * k]

    got2 = ss.bm25_topk_after(spark, docs, ss.QUERY_MAIN, k=k).collect()
    assert [r["doc_id"] for r in got2] == [r["doc_id"] for r in want2]

    cur = (page1[-1]["score"], page1[-1]["doc_id"])
    got2b = ss.bm25_topk_after(
        spark, docs, ss.QUERY_MAIN, k=k, after=cur
    ).collect()
    assert [r["doc_id"] for r in got2b] == [r["doc_id"] for r in want2]


def test_dismax_percolate_histogram_invariants(spark):
    """Session-new retrieval ops, semantics beyond the oracle hash:
    dis_max is monotone in the tie-breaker with tie=0 ≡ best field and
    tie=1 ≡ field sum; percolate honors the all/any rule per stored
    query; the histogram partitions the full match set exactly."""
    from search_engine_spark.ops import search_sql as ss

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # --- dis_max: tie endpoints + monotonicity on a fixed doc set ---
    k_all = 10_000  # large enough to rank every matching doc
    by_tie = {
        t: {r["doc_id"]: r["score"]
            for r in ss.dismax_topk(spark, docs, tie=t, k=k_all).collect()}
        for t in (0.0, 0.3, 1.0)
    }
    ids = set(by_tie[0.0])
    assert ids == set(by_tie[0.3]) == set(by_tie[1.0]) and ids
    for d in ids:
        assert by_tie[0.0][d] <= by_tie[0.3][d] + 1e-4
        assert by_tie[0.3][d] <= by_tie[1.0][d] + 1e-4
    # n_fields=1 docs score identically at every tie (no other field)
    one_field = {
        r["doc_id"]
        for r in ss.dismax_topk(spark, docs, tie=0.0, k=k_all).collect()
        if r["n_fields"] == 1
    }
    assert one_field, "fixture should have single-field matches"
    for d in one_field:
        assert by_tie[0.0][d] == pytest.approx(by_tie[1.0][d], abs=1e-4)

    # --- percolate: all/any rule per stored query ---
    perc = ss.percolate(spark, docs).collect()
    assert perc
    rules = {qid: (set(terms), ra) for qid, terms, ra in ss.PERC_QUERIES}
    post = {
        (r["doc_id"], r["term"])
        for r in ss.postings(docs).select("doc_id", "term").collect()
    }
    seen_qids = set()
    for r in perc:
        terms, require_all = rules[r["qid"]]
        n_present = sum((r["doc_id"], t) in post for t in terms)
        assert n_present == r["n_hit"]
        assert n_present == len(terms) if require_all else n_present >= 1
        seen_qids.add(r["qid"])
    assert seen_qids == set(rules), "every stored query should fire"

    # --- histogram: exact partition of the match set ---
    scored = ss.bm25_scores(spark, docs, ss.QUERY_MAIN).collect()
    hist = ss.match_histogram(spark, docs).collect()
    assert sum(r["n_docs"] for r in hist) == len(scored)
    assert all(r["bucket_lo"] % ss.HIST_WIDTH == 0 for r in hist)
    assert sum(r["sum_score"] for r in hist) == pytest.approx(
        sum(r["score"] for r in scored), abs=1e-2
    )


def test_prf_expansion_invariants(spark):
    """Pseudo-relevance feedback: expansion only ADDS weighted partials,
    so every doc's expanded score dominates its plain score; expansion
    terms never include the original query; the op is deterministic."""
    from search_engine_spark.ops import search_sql as ss

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plain = {
        r["doc_id"]: r["score"]
        for r in ss.bm25_scores(spark, docs, ss.QUERY_MAIN).collect()
    }
    got = ss.prf_expanded_topk(spark, docs).collect()
    assert len(got) == 10
    for r in got:
        base = plain.get(r["doc_id"], 0.0)
        assert r["score"] >= base - 1e-3
        assert r["matched"] >= 1
    # some hit gained score or matched terms vs the plain query
    assert any(
        r["score"] > plain.get(r["doc_id"], 0.0) + 1e-3
        or r["matched"] > len(ss.QUERY_MAIN)
        for r in got
    )
    again = ss.prf_expanded_topk(spark, docs).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_top_hits_invariants(spark):
    """top_hits: per-group ranks are 1..≤n contiguous, scores are the
    unchanged disjunctive scores, each group's rows are its best by
    (score desc, doc_id asc), and rank-1 rows == the collapse op."""
    from search_engine_spark.ops import search_sql as ss

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scored = {
        r["doc_id"]: (r["score"], r["matched"])
        for r in ss.bm25_scores(spark, docs, ss.QUERY_MAIN).collect()
    }
    rows = ss.top_hits_per_group(spark, docs).collect()
    assert rows
    by_grp: dict[str, list] = {}
    for r in rows:
        assert scored[r["doc_id"]] == (r["score"], r["matched"])
        by_grp.setdefault(r["source"], []).append(r)
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= ss.TOP_HITS_N
        key = [(-r["score"], r["doc_id"]) for r in rs]
        assert key == sorted(key)
    best1 = {
        (r["source"], r["doc_id"])
        for r in ss.bm25_topk_collapse(
            spark, docs, ss.QUERY_MAIN, k=10_000
        ).collect()
    }
    got1 = {(r["source"], r["doc_id"]) for r in rows if r["rk"] == 1}
    assert got1 == best1


def test_did_you_mean_invariants(spark):
    """did_you_mean: the typo pair corrects to a real bigram; an
    already-correct query ranks ITSELF first (exact terms are lev-0
    candidates); ranking keys are integers (determinism)."""
    from search_engine_spark.ops import search_sql as ss

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = ss.did_you_mean(spark, docs).collect()
    assert got and got[0]["query"] == "join window"
    assert got[0]["bigram_n"] > 0
    ok = ss.did_you_mean(spark, docs, raw_terms=["join", "window"]).collect()
    assert ok[0]["query"] == "join window"
    again = ss.did_you_mean(spark, docs).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]

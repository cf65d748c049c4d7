"""Single-node NumPy oracle for the frozen behavioral spec (SURVEY.md §8).

Independent implementation of tokenizer → corpus stats → BM25 →
PageRank → blended final ranking, used as the rank-identity referee for
the Spark engine. PageRank follows the math in SURVEY §8.3 (mined from
the reference `services/ranking/src/page_rank.py:33-83`): damping 0.85,
L1 tolerance 1e-5, max 100 iterations, dangling mass redistributed
uniformly, node universe = distinct edge endpoints.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from search_engine_spark.config import (
    BLEND_WEIGHT_TFIDF,
    BM25_B,
    BM25_K1,
    CANDIDATE_K,
    PAGERANK_DAMPING,
    PAGERANK_MAX_ITERS,
    PAGERANK_TOL,
)
from search_engine_spark.functions.tokenize import query_terms, tokenize_tf


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    df: dict[str, int] = field(default_factory=dict)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    dl: dict[int, int] = field(default_factory=dict)
    path: dict[int, str] = field(default_factory=dict)
    prior: dict[int, float] = field(default_factory=dict)

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log((self.n_docs - d + 0.5) / (d + 0.5) + 1.0)


def build_oracle_index(docs: list[dict]) -> OracleIndex:
    """docs: [{doc_id, path, content}] → in-memory index."""
    ix = OracleIndex()
    ix.n_docs = len(docs)
    total_dl = 0
    for d in docs:
        tfmap = tokenize_tf(d["content"])
        dl = sum(tfmap.values())
        ix.dl[d["doc_id"]] = dl
        ix.path[d["doc_id"]] = d["path"]
        total_dl += dl
        for term, tf in tfmap.items():
            ix.postings.setdefault(term, {})[d["doc_id"]] = tf
    ix.df = {t: len(p) for t, p in ix.postings.items()}
    # avgdl over docs that produced ≥1 token (docs with dl=0 contribute 0
    # to the sum but are still in N) — frozen: mean over ALL corpus rows.
    ix.avgdl = total_dl / ix.n_docs if ix.n_docs else 0.0
    return ix


def bm25_score(ix: OracleIndex, terms: list[str], doc_id: int) -> tuple[float, int]:
    """(score, matched_term_count) for one doc. Terms are summed in
    sorted order — the engine does the same, pinning float order."""
    score = 0.0
    matched = 0
    dl = ix.dl.get(doc_id, 0)
    norm_len = dl / ix.avgdl if ix.avgdl else 0.0
    for t in sorted(set(terms)):
        tf = ix.postings.get(t, {}).get(doc_id)
        if tf is None:
            continue
        matched += 1
        idf = ix.idf(t)
        score += idf * (tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * norm_len))
    return score, matched


def bm25_topk(ix: OracleIndex, query: str, k: int = 10) -> list[dict]:
    """Pure BM25 disjunctive top-k (no prior blend).

    Order: score desc, matched desc, path desc, doc_id asc (§8.4 total
    order, minus the blend).
    """
    terms = query_terms(query)
    cand: set[int] = set()
    for t in terms:
        cand.update(ix.postings.get(t, {}).keys())
    scored = []
    for d in cand:
        s, m = bm25_score(ix, terms, d)
        scored.append({"doc_id": d, "score": s, "matched": m, "path": ix.path.get(d, "")})
    scored.sort(key=lambda r: (-r["score"], -r["matched"], _desc_str(r["path"]), r["doc_id"]))
    return scored[:k]


class _desc_str(str):
    """Invert string comparison for use inside an ascending sort key."""

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)

    def __gt__(self, other):  # type: ignore[override]
        return str.__lt__(self, other)


def pagerank(edges: list[tuple[int, int]],
             damping: float = PAGERANK_DAMPING,
             tol: float = PAGERANK_TOL,
             max_iters: int = PAGERANK_MAX_ITERS,
             personalization: dict[int, float] | None = None) -> dict[int, float]:
    """Power iteration per frozen spec §8.3 (reference
    services/ranking/src/page_rank.py:33-86 incl. the personalization
    branch at :57-63: p normalized to sum 1, dangling mass and teleport
    both distributed along p). Node universe = edge endpoints."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    if n == 0:
        return {}
    pos = {node: i for i, node in enumerate(nodes)}
    src = np.array([pos[u] for u, _ in edges], dtype=np.int64)
    dst = np.array([pos[v] for _, v in edges], dtype=np.int64)
    outdeg = np.zeros(n, dtype=np.float64)
    np.add.at(outdeg, src, 1.0)
    dangling = outdeg == 0
    if personalization is None:
        p = np.full(n, 1.0 / n, dtype=np.float64)
    else:
        p = np.array([personalization.get(node, 0.0) for node in nodes])
        p = p / p.sum()
    w = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(max_iters):
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, w[src] / outdeg[src])
        v = damping * contrib + (damping * w[dangling].sum() + (1.0 - damping)) * p
        if np.abs(w - v).sum() < tol:
            w = v
            break
        w = v
    return {node: float(w[pos[node]]) for node in nodes}


def blended_topk(ix: OracleIndex, query: str, k: int = 10,
                 candidate_k: int = CANDIDATE_K,
                 blend: float = BLEND_WEIGHT_TFIDF,
                 page_num: int = 0) -> list[dict]:
    """Full reference query pipeline (frozen §8.4).

    1. disjunctive candidates, pre-ranked by (matched desc, prior desc,
       doc_id asc), truncated to candidate_k (reference PAGE_SIZE=20);
    2. BM25 over the candidates, min-max normalized within the page
       (max==min → all 0, reference tf-idf.go:79-83);
    3. global = blend·norm + (1-blend)·prior;
    4. order global desc, matched desc, path desc, doc_id asc.

    Docs missing from the prior get 0.0 (documented divergence: the
    reference INNER-joins page_rank and silently drops unranked pages —
    SURVEY §7 watch item 5; we left-join with a 0 default).
    """
    terms = query_terms(query)
    cand: set[int] = set()
    for t in terms:
        cand.update(ix.postings.get(t, {}).keys())
    rows = []
    for d in cand:
        s, m = bm25_score(ix, terms, d)
        rows.append(
            {"doc_id": d, "score": s, "matched": m,
             "path": ix.path.get(d, ""), "prior": ix.prior.get(d, 0.0)}
        )
    rows.sort(key=lambda r: (-r["matched"], -r["prior"], r["doc_id"]))
    page = rows[page_num * candidate_k:(page_num + 1) * candidate_k]
    if page:
        smin = min(r["score"] for r in page)
        smax = max(r["score"] for r in page)
        rng = smax - smin
        for r in page:
            r["norm"] = (r["score"] - smin) / rng if rng > 0 else 0.0
            r["global_score"] = blend * r["norm"] + (1.0 - blend) * r["prior"]
    page.sort(key=lambda r: (-r["global_score"], -r["matched"], _desc_str(r["path"]), r["doc_id"]))
    return page[:k]


def _ref_idf(n_docs: int, df: int | None) -> float:
    """Reference idf: log10(N // (df+1)); 0 for OOV / ratio < 1
    (services/ranking/src/idf.py:14-23 + Go map default)."""
    import math

    ratio = n_docs // (df + 1) if df is not None else 0
    return math.log10(ratio) if ratio >= 1 else 0.0


def refcompat_blended_topk(ix: OracleIndex, query: str, k: int = 10,
                           candidate_k: int = CANDIDATE_K) -> list[dict]:
    """Reference-compat TF-IDF-cosine pipeline (tf-idf.go:10-44,
    util.go:41-68, math-util.go:8-37, ranking.go:23-38): cosine over
    query-word dimensions with the quirky idf, min-max within the
    candidate page, 0.5 blend with the prior."""
    import math

    terms = query_terms(query)
    idf = {t: _ref_idf(ix.n_docs, ix.df.get(t)) for t in terms}
    qmag = math.sqrt(sum(v * v for v in idf.values()))
    cand: set[int] = set()
    for t in terms:
        cand.update(ix.postings.get(t, {}).keys())
    rows = []
    for d in cand:
        tfs = {t: ix.postings.get(t, {}).get(d, 0) for t in terms}
        matched = sum(1 for t in terms if tfs[t] > 0)
        dot = sum(tfs[t] * idf[t] * idf[t] for t in terms)
        dmag = math.sqrt(sum((tfs[t] * idf[t]) ** 2 for t in terms))
        cos = dot / (dmag * qmag) if dmag > 0 and qmag > 0 else 0.0
        rows.append(
            {"doc_id": d, "score": cos, "matched": matched,
             "path": ix.path.get(d, ""), "prior": ix.prior.get(d, 0.0)}
        )
    rows.sort(key=lambda r: (-r["matched"], -r["prior"], r["doc_id"]))
    page = rows[:candidate_k]
    if page:
        smin = min(r["score"] for r in page)
        smax = max(r["score"] for r in page)
        rng = smax - smin
        for r in page:
            r["norm"] = (r["score"] - smin) / rng if rng > 0 else 0.0
            r["global_score"] = 0.5 * r["norm"] + 0.5 * r["prior"]
    page.sort(key=lambda r: (-r["global_score"], -r["matched"], _desc_str(r["path"]), r["doc_id"]))
    return page[:k]

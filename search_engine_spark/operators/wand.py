"""Block-max WAND top-k over the compressed index (north_star; Ding &
Suel, SIGIR 2011 "Faster top-k document retrieval using block-max
indexes" — algorithm re-derived from the paper, not from any codebase).

Distribution model
------------------
The salt is a doc_id *range* (high bits), so every doc's postings for
ALL terms live in the same salt. WAND therefore runs independently and
exactly per salt: ``groupBy(salt).applyInPandas(wand)`` emits each
salt's top-k (with score ties kept), and a global
``orderBy(...).limit(k)`` merge — k rows per salt, driver-tiny — yields
the exact global top-k. No cross-partition coordination.

Pruning
-------
- term-level upper bound = idf · (suffix max of remaining blocks'
  max_partial) drives pivot selection;
- blocks are decoded lazily — advancing a cursor past a whole block
  (``last_doc < target``) never decodes it: that skip is the block-max
  win;
- before fully scoring a pivot, the shallow block-max check re-tests
  the bound using only the *current* blocks.

Tie safety: docs are pruned only when UB < θ strictly (θ = k-th best
score so far), and everything scoring ≥ θ is kept, so downstream
deterministic tie-breaking (§8.4) sees every doc that could make the
top-k. UBs get a 1+1e-9 inflation so float addend-order noise can
never make a true top-k doc prunable.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.functions.vbyte import decode_doc_gaps, vbyte_decode

_UB_SAFETY = 1.0 + 1e-9

WAND_OUT_SCHEMA = "doc_id long, score double, matched int"


class _Cursor:
    """Lazy posting-list cursor over one term's block rows (one salt)."""

    __slots__ = ("term", "idf", "blocks", "bi", "docs", "tfs", "dls", "pi",
                 "suffix_max", "k1", "b", "avgdl", "exhausted")

    def __init__(self, term: str, idf: float, block_rows: pd.DataFrame,
                 avgdl: float, k1: float, b: float):
        self.term = term
        self.idf = idf
        self.blocks = block_rows.sort_values("block_id").reset_index(drop=True)
        # suffix max of block max_partial → term UB given remaining blocks
        mp = self.blocks["max_partial"].to_numpy()
        self.suffix_max = np.maximum.accumulate(mp[::-1])[::-1]
        self.bi = -1
        self.pi = 0
        self.docs = self.tfs = self.dls = None
        self.avgdl = avgdl
        self.k1 = k1
        self.b = b
        self.exhausted = False
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= len(self.blocks):
            self.exhausted = True
            return
        r = self.blocks.iloc[bi]
        self.bi = bi
        self.docs = decode_doc_gaps(int(r["first_doc"]), bytes(r["doc_gaps"]), int(r["n"]))
        self.tfs = vbyte_decode(bytes(r["tfs"]))
        self.dls = vbyte_decode(bytes(r["dls"]))
        self.pi = 0

    @property
    def doc(self) -> int:
        return int(self.docs[self.pi])

    def upper_bound(self) -> float:
        return self.idf * float(self.suffix_max[self.bi]) * _UB_SAFETY

    def current_block_ub(self) -> float:
        return self.idf * float(self.blocks["max_partial"].iloc[self.bi]) * _UB_SAFETY

    def partial(self) -> float:
        tf = float(self.tfs[self.pi])
        dl = float(self.dls[self.pi])
        return self.idf * (tf * (self.k1 + 1.0)) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        )

    def advance_to(self, target: int) -> None:
        """Move to the first posting with doc_id >= target; skips (never
        decodes) whole blocks whose last_doc < target."""
        if self.exhausted:
            return
        if int(self.blocks["last_doc"].iloc[self.bi]) < target:
            lows = self.blocks["last_doc"].to_numpy()
            nbi = int(np.searchsorted(lows, target, side="left"))
            if nbi >= len(self.blocks):
                self.exhausted = True
                return
            self._load_block(nbi)
        pi = int(np.searchsorted(self.docs, target, side="left"))
        if pi >= len(self.docs):
            self._load_block(self.bi + 1)
        else:
            self.pi = pi

    def next(self) -> None:
        self.pi += 1
        if self.pi >= len(self.docs):
            self._load_block(self.bi + 1)


def wand_topk_group(pdf: pd.DataFrame, idf_map: dict[str, float], avgdl: float,
                    k: int, k1: float = BM25_K1, b: float = BM25_B) -> pd.DataFrame:
    """Exact top-k (score ties kept) for one salt's blocks of the query terms."""
    cursors = [
        _Cursor(term, idf_map[term], grp, avgdl, k1, b)
        for term, grp in pdf.groupby("term")
        if term in idf_map
    ]
    heap: list[tuple[float, int, int]] = []  # (score, -doc_id ignored) min-heap by score
    kept: dict[int, tuple[float, int]] = {}

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    while True:
        live = [c for c in cursors if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.doc)
        # pivot: first term where cumulative UB beats theta
        acc = 0.0
        pivot = None
        for i, c in enumerate(live):
            acc += c.upper_bound()
            if acc > theta():
                pivot = i
                break
        if pivot is None:
            break  # nothing remaining can beat theta
        pivot_doc = live[pivot].doc
        if live[0].doc == pivot_doc:
            # shallow block-max check with current blocks only
            shallow = 0.0
            for c in live:
                if c.doc > pivot_doc:
                    break
                shallow += c.current_block_ub()
            if shallow > theta():
                score = 0.0
                matched = 0
                for c in live:
                    if c.doc == pivot_doc:
                        score += c.partial()
                        matched += 1
                if score > theta() or (heap and score == heap[0][0]):
                    kept[pivot_doc] = (score, matched)
                    if len(heap) < k:
                        heapq.heappush(heap, (score, pivot_doc, matched))
                    elif score > heap[0][0]:
                        heapq.heappushpop(heap, (score, pivot_doc, matched))
            for c in live:
                if c.doc == pivot_doc:
                    c.next()
        else:
            # advance the lagging cursor with the largest UB (fewer decodes)
            lag = max(
                (c for c in live[:pivot] if c.doc < pivot_doc),
                key=lambda c: c.upper_bound(),
                default=live[0],
            )
            lag.advance_to(pivot_doc)

    if not kept:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "matched": pd.Series([], dtype="int32")})
    th = sorted((s for s, _ in kept.values()), reverse=True)[:k][-1]
    rows = [(d, s, m) for d, (s, m) in kept.items() if s >= th]
    out = pd.DataFrame(rows, columns=["doc_id", "score", "matched"])
    return out.astype({"doc_id": "int64", "score": "float64", "matched": "int32"})


def wand_topk(blocks: DataFrame, idf_map: dict[str, float], avgdl: float,
              k: int, k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Distributed block-max WAND: per-salt exact top-k → caller merges.

    ``blocks`` must already be filtered to the query's terms (bucket +
    term pushdown). ``idf_map`` is tiny (≤ #query terms) and ships in
    the task closure.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return wand_topk_group(pdf, idf_map, avgdl, k, k1, b)

    return blocks.groupBy("salt").applyInPandas(fn, schema=WAND_OUT_SCHEMA)

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

Vectorized segment formulation (round 2: replaces the per-posting
Python cursor loop — same pruning guarantees, NumPy-batch inner ops)
---------------------------------------------------------------------
Block metadata alone (first_doc/last_doc/max_tf/min_dl — no decode)
partitions the doc_id axis into *segments* at block boundaries; within
a segment the per-doc upper bound ``seg_ub = Σ_term idf·block_max`` of
the covering blocks is constant. Processing segments in seg_ub-DESC
order and keeping θ = k-th best exact score so far:

- a segment is *fully scored* (decode covering blocks once, slice by
  doc range, one vectorized BM25 + np.unique/np.add.at group-sum) while
  ``seg_ub ≥ θ``;
- the first segment with ``seg_ub < θ`` ends the query — seg_ub is
  sorted and θ only grows, so no doc in any remaining segment can reach
  θ. Whole blocks whose every segment is below θ are never decoded:
  that skip is the block-max win.

Tie safety: docs are pruned only when UB < θ strictly, and everything
scoring ≥ θ is kept, so downstream deterministic tie-breaking (§8.4)
sees every doc that could make the top-k. UBs get a 1+1e-9 inflation so
float addend-order noise can never make a true top-k doc prunable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.functions.vbyte import decode_doc_gaps, decode_ints
from search_engine_spark.operators.compress import block_max_partial

_UB_SAFETY = 1.0 + 1e-9

WAND_OUT_SCHEMA = "doc_id long, score double, matched int"


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "score": pd.Series([], dtype="float64"),
         "matched": pd.Series([], dtype="int32")}
    )


def wand_topk_group(pdf: pd.DataFrame, idf_map: dict[str, float], avgdl: float,
                    k: int, k1: float = BM25_K1, b: float = BM25_B,
                    min_match: int = 1,
                    excluded: frozenset[str] | set[str] | None = None,
                    salt_bits: int | None = None,
                    required: frozenset[str] | set[str] | None = None,
                    modifier=None) -> pd.DataFrame:
    """Exact top-k (score ties kept) for one salt's blocks of the query
    terms; with ``min_match=m`` > 1, the top-k over docs matching ≥ m
    terms (minimumNumberShouldMatch), still with block-max pruning:

    - *coverage skip*: a segment covered by < m distinct terms' blocks
      cannot contain a qualifying doc (a doc's postings all live in
      blocks covering its segment), so it is skipped without decoding —
      for a conjunctive query (m = #terms) only fully-covered segments
      ever decode;
    - *θ over qualifying docs*: the pruning threshold is the k-th best
      exact score among matched ≥ m docs only, and sub-m docs are
      dropped from the output — both exactly what the engine's post-hoc
      ``matched ≥ m`` filter + top-k would keep, so WAND ≡ exhaustive
      holds per salt (property-tested with min_match 1..#terms).

    ``excluded`` terms (MUST_NOT, r3) are evaluated INSIDE the kernel so
    boolean NOT queries keep block-max pruning: their blocks contribute
    no UB and no score — when a segment survives θ, the excluded blocks
    overlapping it decode into a doc_id mask applied BEFORE θ and the
    output, so θ tracks the k-th best score among eligible docs only.
    Exactness requires each doc's full posting set (positive AND
    excluded terms) to be visible in the group that emits it; with the
    salted fan-out that is the doc's home salt, so exclusion runs with
    ``salt_bits`` set, which drops foreign-doc partials (docs whose home
    salt is another group — they are fully scored there; here they
    could not see a salted excluded term's block and would resurface
    through the max-merge). With ``salt_bits=None`` (single-group
    callers) all blocks are in this group and no filter is needed.

    ``required`` terms (MUST, r3) ride the kernel like ``min_match``
    does: they score normally (they are in ``idf_map``), a segment not
    covered by blocks of EVERY required term is skipped undecoded (a
    doc's postings all live in blocks covering its segment), and per
    doc a required-matched count — group-summed from the same decode —
    must equal |required| before θ and the output. An OOV required term
    has no blocks, so coverage never reaches |required| and the result
    is empty, like Lucene. No home-salt filter is needed: a replicated
    rare block can only PROVE genuine presence (postings are real data
    wherever replicated), so a foreign partial row either truly
    qualifies (underestimated score, dominated in the max-score merge —
    the standard replication argument) or is dropped here while the
    doc's home group decides correctly.

    ``modifier`` (r4, operators/scoremod.py) blends a function_score
    transform INTO the kernel: segment bounds become
    ``modifier.seg_caps(bounds, seg_ub)`` (multiplicative caps use the
    segment's contiguous doc range; additive caps add the bounded
    feature weight), θ tracks exact FINAL scores, and per-doc finals
    come from ``modifier.apply_np`` on the same decode (dl is carried
    per doc when the modifier needs it). Pruning stays exact because
    the cap dominates every final score in the segment — see the
    scoremod module docstring; property-tested WAND ≡ exhaustive with
    both modifier kinds."""
    excluded = frozenset(excluded or ())
    required = frozenset(required or ())
    n_req = len(required)
    rows = pdf[pdf["term"].isin(idf_map)].reset_index(drop=True)
    nblk = len(rows)
    if nblk == 0:
        return _empty_out()

    # home-salt membership predicate (see docstring; compress.salt_col)
    home = None
    if salt_bits is not None and "salt" in pdf.columns:
        gsalt = int(pdf["salt"].iloc[0])
        if gsalt >= 0:
            shift = np.uint64(64 - salt_bits)
            bias = np.uint64(1) << np.uint64(63)

            def home(docs: np.ndarray) -> np.ndarray:
                u = docs.astype(np.uint64)
                return ((u ^ bias) >> shift).astype(np.int64) == gsalt

    idfs = rows["term"].map(idf_map).to_numpy(dtype=np.float64)
    firsts = rows["first_doc"].to_numpy(dtype=np.int64)
    lasts = rows["last_doc"].to_numpy(dtype=np.int64)
    # UB from the stored (max_tf, min_dl) pair + the CURRENT avgdl —
    # blocks stay valid across corpus growth (extend_index generations)
    block_max = block_max_partial(
        rows["max_tf"].to_numpy(dtype=np.float64),
        rows["min_dl"].to_numpy(dtype=np.float64),
        avgdl, k1, b,
    )
    ubs = idfs * block_max * _UB_SAFETY

    # segments: the doc axis cut at every block boundary. Within one
    # segment the covering-block set (hence the UB) is constant, and a
    # doc's postings for every term live in blocks covering its segment,
    # so per-segment group-sums are complete per-doc scores.
    bounds = np.unique(np.concatenate([firsts, lasts + 1]))
    nseg = len(bounds) - 1
    delta = np.zeros(len(bounds), dtype=np.float64)
    np.add.at(delta, np.searchsorted(bounds, firsts), ubs)
    np.add.at(delta, np.searchsorted(bounds, lasts + 1), -ubs)
    seg_ub = np.cumsum(delta)[:nseg]
    if modifier is not None:
        # effective bounds under the score transform (per-segment caps;
        # one more safety factor for the extra float op)
        seg_ub = modifier.seg_caps(bounds, seg_ub) * _UB_SAFETY
    order = np.argsort(-seg_ub, kind="stable")
    needs_dl = modifier is not None and modifier.needs_dl

    # distinct-term coverage per segment (blocks of one term have
    # disjoint doc ranges, so covering blocks == covering terms)
    cdelta = np.zeros(len(bounds), dtype=np.int64)
    np.add.at(cdelta, np.searchsorted(bounds, firsts), 1)
    np.add.at(cdelta, np.searchsorted(bounds, lasts + 1), -1)
    coverage = np.cumsum(cdelta)[:nseg]

    # MUST: per-block required flag + required-term coverage per
    # segment (same disjoint-ranges argument as `coverage`)
    req_flags = None
    req_coverage = None
    if n_req:
        req_flags = rows["term"].isin(required).to_numpy()
        rdelta = np.zeros(len(bounds), dtype=np.int64)
        np.add.at(rdelta, np.searchsorted(bounds, firsts[req_flags]), 1)
        np.add.at(rdelta, np.searchsorted(bounds, lasts[req_flags] + 1), -1)
        req_coverage = np.cumsum(rdelta)[:nseg]

    # block → covered-segment incidence (index metadata only, no decode)
    s0 = np.searchsorted(bounds, firsts)
    s1 = np.searchsorted(bounds, lasts + 1)
    seg_blocks: list[list[int]] = [[] for _ in range(nseg)]
    for bi in range(nblk):
        for s in range(s0[bi], s1[bi]):
            seg_blocks[s].append(bi)

    # excluded-term blocks → overlapping-segment incidence. Their doc
    # ranges do NOT align to the positive blocks' segment boundaries,
    # so overlap is computed by point location (side='right' − 1), not
    # the aligned searchsorted above.
    exc_rows = (
        pdf[pdf["term"].isin(excluded)].reset_index(drop=True)
        if excluded else pdf.iloc[0:0]
    )
    exc_seg_blocks: list[list[int]] = [[] for _ in range(nseg)]
    if len(exc_rows):
        ef = exc_rows["first_doc"].to_numpy(dtype=np.int64)
        el = exc_rows["last_doc"].to_numpy(dtype=np.int64)
        e0 = np.maximum(np.searchsorted(bounds, ef, side="right") - 1, 0)
        e1 = np.minimum(
            np.searchsorted(bounds, el, side="right") - 1, nseg - 1
        )
        for bi in range(len(exc_rows)):
            for s in range(int(e0[bi]), int(e1[bi]) + 1):
                exc_seg_blocks[s].append(bi)

    exc_decoded: dict[int, np.ndarray] = {}

    def _decode_exc(bi: int) -> np.ndarray:
        got = exc_decoded.get(bi)
        if got is None:
            r = exc_rows.iloc[bi]
            exc_decoded[bi] = got = decode_doc_gaps(
                int(r["first_doc"]), bytes(r["doc_gaps"]), int(r["n"])
            )
        return got

    decoded: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray | None]] = {}

    def _decode(bi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
        got = decoded.get(bi)
        if got is None:
            r = rows.iloc[bi]
            docs = decode_doc_gaps(
                int(r["first_doc"]), bytes(r["doc_gaps"]), int(r["n"])
            )
            tf = decode_ints(bytes(r["tfs"]), r["n"]).astype(np.float64)
            dl = decode_ints(bytes(r["dls"]), r["n"]).astype(np.float64)
            part = idfs[bi] * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )
            decoded[bi] = got = (docs, part, dl if needs_dl else None)
        return got

    kept_d: list[np.ndarray] = []
    kept_s: list[np.ndarray] = []
    kept_m: list[np.ndarray] = []
    best = np.array([], dtype=np.float64)  # running top-k exact scores
    theta = -np.inf

    for si in order:
        if seg_ub[si] < theta:
            break  # seg_ub sorted desc, θ monotone → nothing left can reach θ
        if coverage[si] < min_match:
            continue  # no doc here can match ≥ min_match terms
        if n_req and req_coverage[si] < n_req:
            continue  # a required term has no block here → no MUST doc
        lo, hi1 = int(bounds[si]), int(bounds[si + 1])
        das, sas, fas, dls = [], [], [], []
        for bi in seg_blocks[si]:
            docs, part, dl = _decode(bi)
            i0 = int(np.searchsorted(docs, lo, side="left"))
            i1 = int(np.searchsorted(docs, hi1, side="left"))
            if i1 > i0:
                das.append(docs[i0:i1])
                sas.append(part[i0:i1])
                if needs_dl:
                    dls.append(dl[i0:i1])
                if n_req:
                    fas.append(
                        np.full(i1 - i0, int(req_flags[bi]), dtype=np.int64)
                    )
        if not das:
            continue
        d = np.concatenate(das)
        s = np.concatenate(sas)
        ud, inv = np.unique(d, return_inverse=True)
        ss = np.zeros(ud.size, dtype=np.float64)
        np.add.at(ss, inv, s)
        mm = np.zeros(ud.size, dtype=np.int64)
        np.add.at(mm, inv, 1)
        dd = None
        if needs_dl:
            # per-doc dl (identical across a doc's postings; max-merge)
            dd = np.zeros(ud.size, dtype=np.float64)
            np.maximum.at(dd, inv, np.concatenate(dls))
        rm = None
        if n_req:
            f = np.concatenate(fas)
            rm = np.zeros(ud.size, dtype=np.int64)
            np.add.at(rm, inv, f)
        if home is not None:
            q = home(ud)
            if not q.any():
                continue
            ud, ss, mm = ud[q], ss[q], mm[q]
            if rm is not None:
                rm = rm[q]
            if dd is not None:
                dd = dd[q]
        if exc_seg_blocks[si]:
            exd = []
            for bi in exc_seg_blocks[si]:
                docs = _decode_exc(bi)
                i0 = int(np.searchsorted(docs, lo, side="left"))
                i1 = int(np.searchsorted(docs, hi1, side="left"))
                if i1 > i0:
                    exd.append(docs[i0:i1])
            if exd:
                q = ~np.isin(ud, np.concatenate(exd))
                if not q.any():
                    continue
                ud, ss, mm = ud[q], ss[q], mm[q]
                if rm is not None:
                    rm = rm[q]
                if dd is not None:
                    dd = dd[q]
        if rm is not None:
            # MUST: θ and the output may only see docs matching every
            # required term (rm is complete in-segment, same argument
            # as mm below)
            q = rm == n_req
            if not q.any():
                continue
            ud, ss, mm = ud[q], ss[q], mm[q]
            if dd is not None:
                dd = dd[q]
        if min_match > 1:
            # θ and the output may only see qualifying docs — a doc's
            # full (score, matched) come from ONE segment, so mm is
            # already the doc's complete in-salt matched count
            q = mm >= min_match
            if not q.any():
                continue
            ud, ss, mm = ud[q], ss[q], mm[q]
            if dd is not None:
                dd = dd[q]
        if modifier is not None:
            # θ and the output track exact FINAL scores (the segment
            # caps above dominate them, so the break stays sound)
            ss = modifier.apply_np(ud, dd, ss)
        kept_d.append(ud)
        kept_s.append(ss)
        kept_m.append(mm)
        best = np.concatenate([best, ss])
        if best.size > k:
            best = np.partition(best, best.size - k)[best.size - k:]
        if best.size >= k:
            theta = float(best.min())

    if not kept_d:
        return _empty_out()
    d = np.concatenate(kept_d)
    s = np.concatenate(kept_s)
    m = np.concatenate(kept_m)
    th = np.partition(s, s.size - k)[s.size - k] if s.size >= k else -np.inf
    mask = s >= th
    return pd.DataFrame(
        {"doc_id": d[mask].astype("int64"),
         "score": s[mask],
         "matched": m[mask].astype("int32")}
    )


def wand_topk(blocks: DataFrame, idf_map: dict[str, float], avgdl: float,
              k: int, k1: float = BM25_K1, b: float = BM25_B,
              min_match: int = 1,
              excluded: frozenset[str] | set[str] | None = None,
              salt_bits: int | None = None,
              required: frozenset[str] | set[str] | None = None,
              modifier=None) -> DataFrame:
    """Distributed block-max WAND: per-salt exact top-k → caller merges.

    ``blocks`` must already be filtered to the query's terms (bucket +
    term pushdown). ``idf_map`` is tiny (≤ #query terms) and ships in
    the task closure. ``min_match`` > 1 keeps block-max pruning for
    boolean queries (coverage skip + θ over qualifying docs) — the
    per-salt exactness argument is unchanged because a doc's home salt
    holds ALL its postings, so its matched count there is the true one;
    foreign partial rows are dropped or dominated in the max-merge.
    ``excluded`` + ``salt_bits`` enable in-kernel MUST_NOT (r3): blocks
    must then also carry the excluded terms' rows, and each group emits
    only its home-salt docs (see wand_topk_group docstring).
    ``required`` enables in-kernel MUST — required-coverage segment
    skip + per-doc required-count filter (see wand_topk_group).
    ``modifier`` blends a function_score transform with capped segment
    bounds (see wand_topk_group / operators/scoremod.py); the per-salt
    max-merge stays sound because a foreign partial row's final score
    is still dominated by the home row's (multiplicative: same
    multiplier scales both; additive: same dl feature adds to both)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return wand_topk_group(pdf, idf_map, avgdl, k, k1, b, min_match,
                               excluded=excluded, salt_bits=salt_bits,
                               required=required, modifier=modifier)

    return blocks.groupBy("salt").applyInPandas(fn, schema=WAND_OUT_SCHEMA)

"""Property: block-max WAND top-k == exhaustive top-k (same docs, same
scores) on randomized corpora — including degenerate tie-heavy ones."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.operators.wand import wand_topk_group
from search_engine_spark.functions.vbyte import encode_doc_gaps, encode_ints


def _blocks_from_postings(postings: dict[str, list[tuple[int, int, int]]],
                          block_size: int) -> pd.DataFrame:
    rows = []
    for term, plist in postings.items():
        plist = sorted(plist)
        for bi, s in enumerate(range(0, len(plist), block_size)):
            chunk = plist[s : s + block_size]
            doc = np.array([p[0] for p in chunk], dtype=np.int64)
            tf = np.array([p[1] for p in chunk], dtype=np.uint64)
            dl = np.array([p[2] for p in chunk], dtype=np.uint64)
            first, gaps = encode_doc_gaps(doc)
            rows.append(
                {
                    "term": term, "block_id": bi, "n": len(chunk),
                    "first_doc": int(doc[0]), "last_doc": int(doc[-1]),
                    "doc_gaps": gaps, "tfs": encode_ints(tf),
                    "dls": encode_ints(dl),
                    "max_tf": int(tf.max()), "min_dl": int(dl.min()),
                }
            )
    return pd.DataFrame(rows)


AVGDL = 50.0


def _exhaustive(postings, idf_map, k):
    scores: dict[int, float] = {}
    matched: dict[int, int] = {}
    for term in sorted(idf_map):
        for d, tf, dl in postings.get(term, []):
            p = idf_map[term] * (tf * (BM25_K1 + 1)) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / AVGDL)
            )
            scores[d] = scores.get(d, 0.0) + p
            matched[d] = matched.get(d, 0) + 1
    rows = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return rows[:k], scores, matched


@pytest.mark.parametrize("seed", range(12))
def test_wand_equals_exhaustive(seed):
    rng = random.Random(seed)
    n_docs = rng.randint(5, 400)
    doc_ids = rng.sample(range(-(2**40), 2**40), n_docs)
    terms = ["a", "b", "c", "d"][: rng.randint(1, 4)]
    postings = {}
    for t in terms:
        docs = rng.sample(doc_ids, rng.randint(1, n_docs))
        # tie-heavy: constant tf/dl with probability 1/3
        const = rng.random() < 0.33
        postings[t] = [
            (d, 3 if const else rng.randint(1, 9), 50 if const else rng.randint(10, 90))
            for d in docs
        ]
    idf_map = {t: rng.uniform(0.1, 3.0) for t in terms}
    k = rng.choice([1, 3, 10])

    blocks = _blocks_from_postings(postings, block_size=rng.choice([4, 16, 128]))
    got = wand_topk_group(blocks, idf_map, AVGDL, k)
    expected_topk, all_scores, all_matched = _exhaustive(postings, idf_map, k)

    got_map = {int(r["doc_id"]): float(r["score"]) for _, r in got.iterrows()}
    # every returned score must be the exact exhaustive score
    for d, s in got_map.items():
        assert s == pytest.approx(all_scores[d], rel=1e-12)
    # the k-th best score must be attained, and every doc scoring >= kth
    # with a doc in got must be representable: check that the top-k set
    # by (score desc, doc asc) is contained in got's candidates
    if expected_topk:
        kth = expected_topk[-1][1]
        must_have = {d for d, s in all_scores.items() if s > kth}
        assert must_have <= set(got_map)
        # and ties at kth are all present (tie-safety guarantee)
        ties = {d for d, s in all_scores.items() if s == kth}
        assert ties <= set(got_map)
    # matched counts correct
    for _, r in got.iterrows():
        assert int(r["matched"]) == all_matched[int(r["doc_id"])]


@pytest.mark.parametrize("seed", range(12))
def test_wand_min_match_equals_exhaustive(seed):
    """VERDICT r02 item 3: min_match ≥ 2 keeps block-max pruning and
    stays exact — the kernel's qualifying top-k equals the exhaustive
    `matched >= m` filter + top-k, for every m up to #terms (m = #terms
    is the conjunctive/AND query) and one m past it (empty result)."""
    rng = random.Random(1000 + seed)
    n_docs = rng.randint(5, 400)
    doc_ids = rng.sample(range(-(2**40), 2**40), n_docs)
    terms = ["a", "b", "c", "d"][: rng.randint(2, 4)]
    postings = {}
    for t in terms:
        docs = rng.sample(doc_ids, rng.randint(1, n_docs))
        const = rng.random() < 0.33
        postings[t] = [
            (d, 3 if const else rng.randint(1, 9), 50 if const else rng.randint(10, 90))
            for d in docs
        ]
    idf_map = {t: rng.uniform(0.1, 3.0) for t in terms}
    k = rng.choice([1, 3, 10])
    blocks = _blocks_from_postings(postings, block_size=rng.choice([4, 16, 128]))

    for m in range(2, len(terms) + 2):
        got = wand_topk_group(blocks, idf_map, AVGDL, k, min_match=m)
        _, all_scores, all_matched = _exhaustive(postings, idf_map, k)
        qual = {d: s for d, s in all_scores.items() if all_matched[d] >= m}

        got_map = {int(r["doc_id"]): float(r["score"]) for _, r in got.iterrows()}
        # only qualifying docs may appear, with exact scores + matched
        for _, r in got.iterrows():
            d = int(r["doc_id"])
            assert all_matched[d] >= m
            assert float(r["score"]) == pytest.approx(all_scores[d], rel=1e-12)
            assert int(r["matched"]) == all_matched[d]
        if not qual:
            assert not got_map
            continue
        ranked = sorted(qual.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        kth = ranked[-1][1]
        must_have = {d for d, s in qual.items() if s > kth}
        ties = {d for d, s in qual.items() if s == kth}
        assert must_have <= set(got_map)
        assert ties <= set(got_map)


@pytest.mark.parametrize("seed", range(12))
def test_wand_exclusion_equals_exhaustive(seed):
    """r3 in-kernel MUST_NOT: excluded terms' blocks contribute no
    UB/score and mask their docs before θ — the kernel's eligible
    top-k equals the exhaustive score + post-hoc exclusion, alone and
    combined with min_match (single group, so no home-salt filtering)."""
    rng = random.Random(2000 + seed)
    n_docs = rng.randint(5, 400)
    doc_ids = rng.sample(range(-(2**40), 2**40), n_docs)
    terms = ["a", "b", "c", "d"][: rng.randint(2, 4)]
    n_exc = rng.randint(1, 2)
    exc_terms = [f"x{i}" for i in range(n_exc)]
    postings = {}
    for t in terms + exc_terms:
        docs = rng.sample(doc_ids, rng.randint(1, n_docs))
        const = rng.random() < 0.33
        postings[t] = [
            (d, 3 if const else rng.randint(1, 9), 50 if const else rng.randint(10, 90))
            for d in docs
        ]
    idf_map = {t: rng.uniform(0.1, 3.0) for t in terms}
    k = rng.choice([1, 3, 10])
    blocks = _blocks_from_postings(postings, block_size=rng.choice([4, 16, 128]))
    banned = {d for t in exc_terms for d, _, _ in postings[t]}

    pos_postings = {t: postings[t] for t in terms}
    for m in range(1, len(terms) + 1):
        got = wand_topk_group(
            blocks, idf_map, AVGDL, k, min_match=m,
            excluded=frozenset(exc_terms),
        )
        _, all_scores, all_matched = _exhaustive(pos_postings, idf_map, k)
        qual = {
            d: s for d, s in all_scores.items()
            if all_matched[d] >= m and d not in banned
        }
        got_map = {int(r["doc_id"]): float(r["score"]) for _, r in got.iterrows()}
        assert set(got_map).isdisjoint(banned)
        for _, r in got.iterrows():
            d = int(r["doc_id"])
            assert d in qual
            assert float(r["score"]) == pytest.approx(all_scores[d], rel=1e-12)
            assert int(r["matched"]) == all_matched[d]
        if not qual:
            assert not got_map
            continue
        ranked = sorted(qual.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        kth = ranked[-1][1]
        assert {d for d, s in qual.items() if s > kth} <= set(got_map)
        assert {d for d, s in qual.items() if s == kth} <= set(got_map)


def test_wand_exclusion_home_salt_filter():
    """Targeted home-salt leak case (r3): a foreign-doc partial arriving
    through a replicated rare-term block must NOT be emitted by a group
    that cannot see that doc's (salted) excluded-term block — the doc is
    fully adjudicated only in its home salt. With the filter off
    (salt_bits=None) the same input leaks the excluded doc through with
    a positive score, proving the filter is load-bearing, not cosmetic."""
    salt_bits = 2
    u64 = (1 << 64) - 1
    bias = 1 << 63

    def salt_of(d: int) -> int:
        return ((d & u64) ^ bias) >> (64 - salt_bits)

    f_doc, h_keep, h_masked = -5, 7, 11
    assert salt_of(f_doc) == 1          # foreign: home salt 1
    assert salt_of(h_keep) == salt_of(h_masked) == 2  # home-salt docs

    postings = {
        # replicated rare positive block: foreign F + home H docs mixed
        "rare": [(f_doc, 5, 50), (h_keep, 2, 50), (h_masked, 2, 50)],
        # salted excluded block: only this group's (salt-2) x-docs.
        # F also contains x, but that posting lives in group 1.
        "x": [(h_masked, 1, 50)],
    }
    blocks = _blocks_from_postings(postings, block_size=128)
    blocks["salt"] = 2  # this IS group salt 2 of the fan-out

    got = wand_topk_group(
        blocks, {"rare": 1.0}, AVGDL, k=10,
        excluded=frozenset({"x"}), salt_bits=salt_bits,
    )
    assert set(got["doc_id"].astype(int)) == {h_keep}

    # filter off: the foreign partial leaks straight past the exclusion
    leaked = wand_topk_group(
        blocks, {"rare": 1.0}, AVGDL, k=10,
        excluded=frozenset({"x"}), salt_bits=None,
    )
    assert f_doc in set(leaked["doc_id"].astype(int))


@pytest.mark.parametrize("seed", range(12))
def test_wand_required_equals_exhaustive(seed):
    """r3 in-kernel MUST: required terms score normally, segments not
    covered by every required term skip undecoded, and per-doc
    required counts gate θ and the output — the kernel's qualifying
    top-k equals the exhaustive contains-all filter + top-k, for every
    required subset incl. the full conjunction, alone and composed
    with min_match; an OOV required term empties the result."""
    rng = random.Random(5000 + seed)
    n_docs = rng.randint(5, 400)
    doc_ids = rng.sample(range(-(2**40), 2**40), n_docs)
    terms = ["a", "b", "c", "d"][: rng.randint(2, 4)]
    postings = {}
    for t in terms:
        docs = rng.sample(doc_ids, rng.randint(1, n_docs))
        const = rng.random() < 0.33
        postings[t] = [
            (d, 3 if const else rng.randint(1, 9), 50 if const else rng.randint(10, 90))
            for d in docs
        ]
    idf_map = {t: rng.uniform(0.1, 3.0) for t in terms}
    k = rng.choice([1, 3, 10])
    blocks = _blocks_from_postings(postings, block_size=rng.choice([4, 16, 128]))
    _, all_scores, all_matched = _exhaustive(postings, idf_map, k)
    have = {t: {d for d, _tf, _dl in postings[t]} for t in terms}

    subsets = [terms[:n] for n in range(1, len(terms) + 1)] + [terms[-2:]]
    for req in subsets:
        for m in (1, 2):
            got = wand_topk_group(
                blocks, idf_map, AVGDL, k,
                min_match=m, required=frozenset(req),
            )
            qual = {
                d: s for d, s in all_scores.items()
                if all(d in have[t] for t in req) and all_matched[d] >= m
            }
            got_map = {
                int(r["doc_id"]): float(r["score"]) for _, r in got.iterrows()
            }
            for d, s in got_map.items():
                assert d in qual
                assert s == pytest.approx(all_scores[d], rel=1e-12)
            if not qual:
                assert not got_map
                continue
            ranked = sorted(qual.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            kth = ranked[-1][1]
            assert {d for d, s in qual.items() if s > kth} <= set(got_map)
            assert {d for d, s in qual.items() if s == kth} <= set(got_map)

    # OOV required term -> empty
    got = wand_topk_group(
        blocks, idf_map, AVGDL, k, required=frozenset({terms[0], "zzz"})
    )
    assert len(got) == 0


def _final_scores(all_scores, mod, postings=None):
    """Exhaustive final scores under a scoremod modifier."""
    import numpy as np

    dl_of = {}
    if postings is not None:
        for plist in postings.values():
            for d, _tf, dl in plist:
                dl_of[d] = dl
    out = {}
    for d, s in all_scores.items():
        dls = np.array([dl_of.get(d, 0)], dtype=np.float64)
        out[d] = float(
            mod.apply_np(np.array([d], dtype=np.int64), dls,
                         np.array([s], dtype=np.float64))[0]
        )
    return out


@pytest.mark.parametrize("seed", range(12))
def test_wand_modifier_equals_exhaustive(seed):
    """r4 (VERDICT r3 item 3): function_score modifiers keep block-max
    pruning and stay exact — the kernel's top-k over FINAL scores
    (bm25·decay or bm25+saturation) equals the exhaustive transform +
    top-k, for both modifier kinds, alone and composed with
    min_match."""
    from search_engine_spark.operators.scoremod import (
        DlSaturation,
        RecencyDecay,
    )

    rng = random.Random(7000 + seed)
    n_docs = rng.randint(5, 400)
    doc_ids = rng.sample(range(-(2**40), 2**40), n_docs)
    terms = ["a", "b", "c", "d"][: rng.randint(1, 4)]
    postings = {}
    for t in terms:
        docs = rng.sample(doc_ids, rng.randint(1, n_docs))
        const = rng.random() < 0.33
        postings[t] = [
            (d, 3 if const else rng.randint(1, 9), 50 if const else rng.randint(10, 90))
            for d in docs
        ]
    # per-doc dl must be consistent across terms (it is a DOC property)
    dl_fix = {d: rng.randint(10, 90) for d in doc_ids}
    postings = {
        t: [(d, tf, dl_fix[d]) for d, tf, _ in plist]
        for t, plist in postings.items()
    }
    idf_map = {t: rng.uniform(0.1, 3.0) for t in terms}
    k = rng.choice([1, 3, 10])
    blocks = _blocks_from_postings(postings, block_size=rng.choice([4, 16, 128]))
    _, all_scores, all_matched = _exhaustive(postings, idf_map, k)

    mods = [
        RecencyDecay(),
        RecencyDecay(offset_d=0, scale_d=10, rate=0.2, age_mod=97),
        DlSaturation(),
        DlSaturation(weight=5.0, pivot=40.0),
    ]
    for mod in mods:
        finals = _final_scores(all_scores, mod, postings)
        for m in (1, 2):
            got = wand_topk_group(
                blocks, idf_map, AVGDL, k, min_match=m, modifier=mod
            )
            qual = {d: s for d, s in finals.items() if all_matched[d] >= m}
            got_map = {
                int(r["doc_id"]): float(r["score"]) for _, r in got.iterrows()
            }
            for d, s in got_map.items():
                assert d in qual
                assert s == pytest.approx(qual[d], rel=1e-9)
            if not qual:
                assert not got_map
                continue
            ranked = sorted(qual.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            kth = ranked[-1][1]
            assert {d for d, s in qual.items() if s > kth * (1 + 1e-12)} <= set(got_map)


@pytest.mark.parametrize("seed", range(8))
def test_wand_modifier_composes_with_boolean(seed):
    """Modifiers × MUST/MUST_NOT: the capped-bound pruning stays exact
    when composed with required and excluded terms (the filters act on
    doc sets; the modifier acts on scores — their composition must
    equal exhaustive transform + filters + top-k)."""
    from search_engine_spark.operators.scoremod import (
        DlSaturation,
        RecencyDecay,
    )

    rng = random.Random(9000 + seed)
    n_docs = rng.randint(10, 300)
    doc_ids = rng.sample(range(-(2**40), 2**40), n_docs)
    terms = ["a", "b", "c"]
    exc_terms = ["x"]
    dl_fix = {d: rng.randint(10, 90) for d in doc_ids}
    postings = {}
    for t in terms + exc_terms:
        docs = rng.sample(doc_ids, rng.randint(1, n_docs))
        postings[t] = [(d, rng.randint(1, 9), dl_fix[d]) for d in docs]
    idf_map = {t: rng.uniform(0.1, 3.0) for t in terms}
    k = rng.choice([3, 10])
    blocks = _blocks_from_postings(postings, block_size=rng.choice([4, 16]))
    pos_postings = {t: postings[t] for t in terms}
    _, all_scores, all_matched = _exhaustive(pos_postings, idf_map, k)
    banned = {d for d, _, _ in postings["x"]}
    have_a = {d for d, _, _ in postings["a"]}

    for mod in (RecencyDecay(), DlSaturation(weight=3.0, pivot=50.0)):
        finals = _final_scores(all_scores, mod, pos_postings)
        got = wand_topk_group(
            blocks, idf_map, AVGDL, k,
            excluded=frozenset(exc_terms), required=frozenset({"a"}),
            modifier=mod,
        )
        qual = {
            d: s for d, s in finals.items()
            if d not in banned and d in have_a
        }
        got_map = {
            int(r["doc_id"]): float(r["score"]) for _, r in got.iterrows()
        }
        for d, s in got_map.items():
            assert d in qual
            assert s == pytest.approx(qual[d], rel=1e-9)
        if not qual:
            assert not got_map
            continue
        ranked = sorted(qual.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        kth = ranked[-1][1]
        assert {d for d, s in qual.items() if s > kth * (1 + 1e-12)} <= set(got_map)

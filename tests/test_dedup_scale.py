"""Skew guards for the LSH dedup pipeline (VERDICT r01 items 2-3).

At 100 TB the failure mode is a mega-bucket: m docs sharing a band key
produce m²/2 pairs in one task. Two guards keep pair output bounded:

1. exact-dedup canonicalization — byte-identical clusters (the common
   case: boilerplate, mirrored files) collapse to one representative
   BEFORE the band join;
2. ``LSH_BUCKET_CAP`` — residual buckets larger than the cap are
   excluded from pairing deterministically.

These tests build adversarial corpora and assert the output stays
bounded, and that the verify stage never self-joins raw shingles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.dedup import (
    LSH_BUCKET_CAP,
    exact_representatives,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
)


@pytest.fixture(scope="module")
def identical_cluster(spark):
    """1,000 byte-identical docs + 5 distinct ones."""
    same = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog").alias("text"),
    )
    distinct = spark.createDataFrame(
        [(2000 + i, f"unique document number {i} with its own words w{i}")
         for i in range(5)],
        "doc_id long, text string",
    )
    return same.union(distinct)


def test_identical_cluster_collapses_before_lsh(spark, identical_cluster):
    reps = exact_representatives(identical_cluster)
    assert reps.count() == 6  # 1 representative + 5 distinct
    # the 1000-doc cluster contributes ZERO pairs (resolved by exact dedup)
    pairs = lsh_candidate_pairs(identical_cluster)
    assert pairs.where((F.col("doc_a") < 1000) & (F.col("doc_b") < 1000)).count() == 0


def test_bucket_cap_bounds_near_dup_blowup(spark):
    """Docs with the SAME distinct-term set but different bytes: exact
    dedup can't collapse them, signatures are identical → one band
    bucket of 200 docs. Capped run must not emit the 19,900 pairs."""
    n = 200
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " + " ".join(["alpha"] * (i + 1)))
         for i in range(n)],
        "doc_id long, text string",
    )
    capped = lsh_candidate_pairs(docs).count()
    assert capped == 0  # the single mega-bucket exceeds the cap → dropped
    uncapped = lsh_candidate_pairs(docs, bucket_cap=None).count()
    assert uncapped == n * (n - 1) // 2  # what the guard prevents
    # worst-case bound with the cap: every surviving bucket ≤ CAP members
    assert LSH_BUCKET_CAP * (LSH_BUCKET_CAP - 1) // 2 < uncapped


def test_ngram_verify_is_pair_driven(spark):
    """The verify stage computes Jaccard only over LSH candidates: a
    shingle shared by many non-candidate docs must not create pairs."""
    # 50 docs sharing one stop-shingle but otherwise disjoint: the
    # standalone plan would emit 50·49/2 intersection rows. Unique words
    # must be alphabetic — the spec tokenizer drops digit tokens.
    def w(i: int, tag: str) -> str:
        return tag + chr(ord("a") + i % 26) + chr(ord("a") + i // 26)

    docs = spark.createDataFrame(
        [(i, "common stop shingle plus "
             + " ".join(w(i, t) for t in ["wa", "xb", "yc", "zd", "qe", "rf", "sg", "th"]))
         for i in range(50)]
        # same distinct-term set (→ identical MinHash, guaranteed LSH
        # candidates) but different shingles: a true near-dup pair
        + [(100, "near duplicate pair body alpha beta gamma delta eps zeta"),
           (101, "near duplicate pair body alpha beta gamma delta eps zeta zeta")],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (100, 101) in got
    # nothing from the stop-shingle family survives (they're not near-dups)
    assert all(a >= 100 for a, _ in got)


def test_prefilter_matches_standalone_on_near_dups(spark):
    """On a small clean corpus both plans agree on the surviving pairs."""
    docs = spark.createDataFrame(
        # docs 1-2 share the same distinct-term set (guaranteed LSH
        # candidates) but differ in shingles; doc 3 is unrelated
        [(1, "one two three four five six seven"),
         (2, "one two three four five six seven seven"),
         (3, "totally different content here nine ten eleven twelve")],
        "doc_id long, text string",
    )
    a = {(r["doc_a"], r["doc_b"], r["jaccard"])
         for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    b = {(r["doc_a"], r["doc_b"], r["jaccard"])
         for r in ngram_jaccard_pairs(docs, threshold=0.4, prefilter=False).collect()}
    assert a == b
    assert (1, 2) in {(x, y) for x, y, _ in a}


def test_simhash_hamming_pairs_detects_and_bounds(spark, identical_cluster):
    """Hamming-ball pairs: a planted near-dup (one word swapped in a
    long doc) lands within HAM_MAX_HD; unrelated docs don't pair; and
    the 1000-identical-doc cluster contributes zero pairs (exact-dedup
    canonicalization runs first)."""
    from search_engine_spark.ops.dedup import simhash_hamming_pairs

    # long doc: a single-token swap moves each bit-weight by at most 2
    # against a sigma-20 weight distribution, so the signature moves
    # only a bit or two — the regime simhash is built for
    # NB: tokens must be purely alphabetic — the frozen tokenizer drops
    # anything with digits
    import string

    letters = string.ascii_lowercase
    words = ["tok" + letters[i // 26] + letters[i % 26] for i in range(400)]
    base = " ".join(words)
    near = base.replace("tokbo ", "swapped ")
    docs = spark.createDataFrame(
        [(1, base), (2, near),
         (3, "entirely unrelated content about databases and storage")],
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_hamming_pairs(docs).collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got)

    # mega-cluster: byte-identical docs collapse before the block join
    pairs = simhash_hamming_pairs(identical_cluster)
    assert pairs.where((F.col("doc_a") < 1000) & (F.col("doc_b") < 1000)).count() == 0


def test_simhash_hamming_completeness_vs_bruteforce(spark):
    """Pigeonhole completeness: every pair within HAM_MAX_HD that brute
    force finds, the block-join path finds too (cap disabled)."""
    from search_engine_spark.ops.dedup import (
        HAM_MAX_HD,
        simhash60,
        simhash_hamming_pairs,
    )

    import string

    letters = string.ascii_lowercase

    def word(i: int, j: int) -> str:  # purely alphabetic (tokenizer-safe)
        return ("w" + letters[i // 26] + letters[i % 26]
                + letters[j // 26] + letters[j % 26])

    # 120 tokens/doc: a 1-token swap moves each bit weight by ±2 against
    # sigma≈11, so most (not all) siblings stay within HAM_MAX_HD —
    # verified offline: 8 of 10 planted pairs are at hd ≤ 3
    rows = []
    for i in range(30):
        words = [word(i, j) for j in range(120)]
        rows.append((100 + i, " ".join(words)))
        # a near-dup sibling for every third doc
        if i % 3 == 0:
            words[5] = "changed"
            rows.append((200 + i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {r["doc_id"]: r["simhash"] for r in simhash60(docs).collect()}
    ids = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= HAM_MAX_HD
    }
    got = {(r["doc_a"], r["doc_b"])
           for r in simhash_hamming_pairs(docs, bucket_cap=None).collect()}
    assert got == brute
    assert brute  # fixture actually plants detectable near-dups

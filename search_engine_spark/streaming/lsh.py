"""Streaming near-duplicate candidates: MinHash-LSH band buckets as
stateful stream keys — the streaming twin of
``ops/dedup.lsh_candidate_pairs``.

A training-data drop zone needs near-dups flagged AS documents arrive,
not in a nightly pass. Exact dedup streams on the content digest
(``streaming/dedup.py``); near-dup needs the LSH shape instead: a new
doc is a candidate pair with every earlier doc that shares a band
bucket within the watermark horizon.

Two-stage plan, mirroring the batch op:

1. **Row-local signatures** (stateless — better than the batch op's
   shuffle!): the MinHash signature is computed per row with array
   expressions (``array_min`` over the permuted token-hash array), so
   the only stateful exchange is the band-bucket groupBy. The batch op
   needs a groupBy(doc_id) because it shares the exploded token pass
   with other consumers; a stream computes each row once anyway.
2. **Stateful band buckets** (``applyInPandasWithState`` keyed by
   ``bkey``): state holds the bucket's (doc_id, signature) members;
   each arrival emits a pair per stored member (same ``sig_matches`` /
   ``est_jaccard`` columns as the batch op), then joins the bucket.
   ``bucket_cap`` bounds state AND output exactly like the batch cap:
   a saturated bucket admits nothing more (≤ cap²/2 pairs ever).
   Event-time timeouts evict buckets idle past the watermark horizon,
   so state is digests-not-content and watermark-bounded, same as
   ``dropDuplicatesWithinWatermark``.

A pair colliding in several bands is emitted once per band; consumers
dedupe on (doc_a, doc_b) — both emissions carry identical values (the
batch twin dedupes in-plan, a stream cannot without a second stateful
op). tests/test_stream_lsh.py proves deduped stream output ==
``lsh_candidate_pairs`` on the same rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from search_engine_spark.ops.dedup import (
    LSH_BUCKET_CAP,
    N_BANDS,
    N_PERMS,
    ROWS_PER_BAND,
)
from search_engine_spark.ops.sqltwin import minhash_perm, term_hash31, tokens_col

PAIR_SCHEMA = (
    "doc_a long, doc_b long, sig_matches int, est_jaccard double"
)
_STATE_SCHEMA = "docs array<long>, sigs array<long>, last_ts long"


def row_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ts, sig array<long>): row-local MinHash — identical
    math to ``ops/dedup.minhash_signatures`` (same term hash, same
    permutations) with zero shuffles; docs with no tokens are dropped,
    matching the batch op (they never reach its groupBy)."""
    hs = F.transform(
        F.array_distinct(tokens_col(text_col)), lambda t: term_hash31(t)
    )
    with_h = docs.select("doc_id", "ts", hs.alias("__hs")).where(
        F.size("__hs") > 0
    )
    sig = F.array(*[
        F.array_min(F.transform(F.col("__hs"), lambda h: minhash_perm(h, j)))
        for j in range(N_PERMS)
    ])
    return with_h.select("doc_id", "ts", sig.alias("sig"))


def band_keys(sigs: DataFrame) -> DataFrame:
    """Explode each signature into its band-bucket keys — the same
    ``b-sig..sig`` key format as the batch op's band columns."""
    bands = [
        F.concat_ws(
            "-",
            F.lit(b),
            *[
                F.element_at("sig", b * ROWS_PER_BAND + r + 1).cast("string")
                for r in range(ROWS_PER_BAND)
            ],
        )
        for b in range(N_BANDS)
    ]
    return sigs.select(
        "doc_id", "ts", "sig", F.explode(F.array(*bands)).alias("bkey")
    )


def _bucket_fn(bucket_cap: int, horizon_ms: int):
    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            docs, sigs, last_ts = state.get
            docs, sigs = list(docs), list(sigs)
        else:
            docs, sigs, last_ts = [], [], 0

        rows = []
        for pdf in pdfs:
            for r in pdf.sort_values(["ts", "doc_id"]).itertuples():
                if len(docs) >= bucket_cap:
                    break  # saturated bucket admits nothing more
                new_sig = [int(x) for x in r.sig]
                for i, prior in enumerate(docs):
                    psig = sigs[i * N_PERMS:(i + 1) * N_PERMS]
                    m = sum(int(a == b) for a, b in zip(psig, new_sig))
                    a, b = sorted((prior, int(r.doc_id)))
                    rows.append((a, b, m, round(m / N_PERMS, 4)))
                docs.append(int(r.doc_id))
                sigs.extend(new_sig)
                ts_us = int(pd.Timestamp(r.ts).value // 1000)
                last_ts = max(last_ts, ts_us)

        if docs:
            state.update((docs, sigs, last_ts))
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last_ts // 1000 + horizon_ms, wm_ms + 1)
            )
        if rows:
            yield pd.DataFrame(
                rows, columns=["doc_a", "doc_b", "sig_matches", "est_jaccard"]
            )

    return fn


def lsh_pairs_stream(
    docs: DataFrame,
    watermark: str = "2 hours",
    bucket_cap: int = LSH_BUCKET_CAP,
    horizon_ms: int = 2 * 3600 * 1000,
) -> DataFrame:
    """Doc stream → near-dup candidate-pair stream (append mode)."""
    keys = band_keys(row_signatures(docs)).withWatermark("ts", watermark)
    return keys.groupBy("bkey").applyInPandasWithState(
        _bucket_fn(bucket_cap, horizon_ms),
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

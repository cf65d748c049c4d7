"""Streaming event-transition extraction: the stateful-incremental twin
of ``ops/relational.event_transitions`` (Markov user-flow edges), via
``applyInPandasWithState`` — per-user state survives micro-batches,
event-time timeouts flush tails.

Finality argument (out-of-order safe): events sort per user by
(ts, event_id). An adjacent pair (e_i, e_{i+1}) is FINAL once
``ts[i+1] < watermark`` — any straggler that could still insert
between them would carry ts < watermark and be dropped by Spark
itself. So each batch emits the pairs among the sorted prefix with
ts < watermark and keeps only the LAST such event (it pairs with the
next arrival) plus the suffix. State per user is bounded by the
watermark delay — the same guarantee windowed aggregations get — and
AGGREGATE state is bounded by active users: a lone tail older than
``IDLE_TTL_MS`` of event time is evicted by timer (see below).

Downstream, transition counts/probabilities are an ordinary streaming
aggregation over the emitted pair rows (or the batch op's groupBy on
the landed table) — the stateful stage only decides *adjacency*,
which is the part a plain windowed agg cannot express.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, event_type string, next_type string"
STATE_SCHEMA = "buf_ts array<long>, buf_eid array<long>, buf_type array<string>"

# Lone-tail idle TTL: a user whose LAST event has landed keeps a
# 1-event buffer waiting for a successor that may never come. Without
# eviction, aggregate state grows with the number of ever-seen users
# (ADVICE r3) even though each user's buffer is bounded. Once the
# watermark passes tail_ts + TTL we accept the tail can no longer pair
# (a post-TTL arrival for that user starts a fresh chain) and remove
# the state. 30 days of event time by default — far beyond any real
# session gap, so the ≡-batch guarantee holds for any corpus whose
# per-user gaps stay under the TTL. Config surface:
# config.TRANSITIONS_IDLE_TTL_MS / EngineConfig.transitions_idle_ttl_ms
# (ADVICE r4: not only a function default); each eviction logs at WARN
# on the executor so dropped pairs are observable in the logs.
from search_engine_spark.config import TRANSITIONS_IDLE_TTL_MS as IDLE_TTL_MS

_log = logging.getLogger(__name__)


def _transitions_fn(idle_ttl_ms: int = IDLE_TTL_MS):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            buf_ts, buf_eid, buf_type = (list(x) for x in state.get)
        else:
            buf_ts, buf_eid, buf_type = [], [], []
        for pdf in pdfs:
            if len(pdf):
                ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
                buf_ts.extend(int(t) for t in ts_us)
                buf_eid.extend(int(e) for e in pdf["event_id"])
                buf_type.extend(str(t) for t in pdf["event_type"])

        wm_us = state.getCurrentWatermarkMs() * 1000
        out_rows = []
        if buf_ts:
            order = np.lexsort((np.array(buf_eid), np.array(buf_ts)))
            ts = np.array(buf_ts)[order]
            eid = np.array(buf_eid)[order]
            typ = np.array(buf_type, dtype=object)[order]
            m = int(np.searchsorted(ts, wm_us, side="left"))
            for i in range(max(0, m - 1)):
                out_rows.append((user_id, typ[i], typ[i + 1]))
            lo = max(0, m - 1)
            buf_ts = [int(t) for t in ts[lo:]]
            buf_eid = [int(e) for e in eid[lo:]]
            buf_type = [str(t) for t in typ[lo:]]

        if len(buf_ts) >= 2:
            state.update((buf_ts, buf_eid, buf_type))
            # the pending head pair finalizes once wm passes its
            # successor; must arm strictly beyond the current watermark
            flush_at_ms = buf_ts[1] // 1000 + 1
            state.setTimeoutTimestamp(max(flush_at_ms, wm_us // 1000 + 1))
        elif buf_ts:
            if wm_us >= buf_ts[0] + idle_ttl_ms * 1000:
                # idle TTL expired: drop the lone tail (it can no
                # longer pair under this policy) so total state stays
                # bounded by ACTIVE users, not ever-seen users. Logged
                # so the stream-vs-batch drop is observable: a
                # successor arriving after this point starts a fresh
                # chain and the (evicted, successor) pair never emits.
                _log.warning(
                    "transitions: evicting idle lone tail user_id=%s "
                    "tail_ts_us=%d (watermark passed tail+TTL %dms)",
                    user_id, buf_ts[0], idle_ttl_ms,
                )
                state.remove()
            else:
                state.update((buf_ts, buf_eid, buf_type))
                # a lone tail can't finalize alone — arm the eviction
                # timer instead (strictly beyond the current watermark)
                state.setTimeoutTimestamp(
                    max(
                        buf_ts[0] // 1000 + idle_ttl_ms,
                        wm_us // 1000 + 1,
                    )
                )
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["user_id", "event_type", "next_type"]
            )

    return fn


def transitions_stream(
    events: DataFrame, watermark: str = "2 hours",
    idle_ttl_ms: int = IDLE_TTL_MS,
) -> DataFrame:
    """events stream → finalized (user_id, event_type, next_type) pair
    rows (append-mode, exactly-once under checkpointed reruns)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _transitions_fn(idle_ttl_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

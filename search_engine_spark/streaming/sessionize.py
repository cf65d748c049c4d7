"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the batch twin is
``ops/relational.sessionize`` (identical output schema + numbering).

Why this shape: the reference's incremental behavior is poll-loops over
mutable tables (SURVEY §2.6); Spark's native replacement for *stateful*
incremental logic is ``applyInPandasWithState`` — per-key state that
survives micro-batches, with event-time timeouts driven by the
watermark. Sessionization is the canonical case: a session can only be
finalized once the watermark proves no in-gap event can still arrive.

Algorithm per user (key):
1. buffer incoming (ts, event_id) pairs in state (out-of-order safe —
   files can deliver a user's events across micro-batches in any order;
   the watermark bounds how stale a straggler can be);
2. sort the buffer, split into sessions at gaps > ``gap_min``;
3. CLOSE every leading session whose ``last_ts + gap < watermark`` —
   any event that could still extend it (ts ≤ last+gap) would be
   older than the watermark and hence dropped by Spark itself;
4. emit closed sessions with a per-user running session_id (same
   1,2,3… numbering as the batch twin), keep the rest buffered, and
   arm an event-time timeout at the earliest possible close point so
   a no-data batch can flush the tail.

State is bounded by the watermark delay (buffered events ≤ one
watermark window per user), the same guarantee windowed aggs get.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "first_event long, last_event long"
)
STATE_SCHEMA = "sess_count long, buf_ts array<long>, buf_eid array<long>"


def _sessionize_fn(gap_min: int):
    gap_us = gap_min * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            sess_count, buf_ts, buf_eid = state.get
            buf_ts, buf_eid = list(buf_ts), list(buf_eid)
        else:
            sess_count, buf_ts, buf_eid = 0, [], []
        for pdf in pdfs:
            if len(pdf):
                ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
                buf_ts.extend(int(t) for t in ts_us)
                buf_eid.extend(int(e) for e in pdf["event_id"])

        wm_us = state.getCurrentWatermarkMs() * 1000
        out_rows = []
        keep_ts: list[int] = []
        keep_eid: list[int] = []
        if buf_ts:
            order = np.lexsort((np.array(buf_eid), np.array(buf_ts)))
            ts = np.array(buf_ts)[order]
            eid = np.array(buf_eid)[order]
            # session boundaries: gap strictly greater than gap_us
            starts = np.flatnonzero(
                np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
            )
            bounds = list(starts) + [len(ts)]
            closing = True
            for i in range(len(starts)):
                lo, hi = bounds[i], bounds[i + 1]
                if closing and int(ts[hi - 1]) + gap_us < wm_us:
                    sess_count += 1
                    out_rows.append(
                        (user_id, sess_count, hi - lo,
                         int(eid[lo:hi].min()), int(eid[lo:hi].max()))
                    )
                else:
                    closing = False
                    keep_ts.extend(int(t) for t in ts[lo:hi])
                    keep_eid.extend(int(e) for e in eid[lo:hi])

        if keep_ts:
            state.update((sess_count, keep_ts, keep_eid))
            # earliest moment the head session could close; must be
            # strictly beyond the current watermark
            close_at_ms = (max(keep_ts) + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(max(close_at_ms, wm_us // 1000 + 1))
        elif state.exists and sess_count:
            state.update((sess_count, [], []))
            # no timeout armed: nothing buffered, nothing to flush
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["user_id", "session_id", "n_events",
                         "first_event", "last_event"],
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN, watermark: str = "2 hours"
) -> DataFrame:
    """events stream → closed sessions (append-mode, exactly-once)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_min),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""As-of join / rollup / quantile edge semantics (ops/relational.py).
Oracle parity at sf scale runs in test_ops_parity; these pin the
boundary rules on hand-built rows."""

from __future__ import annotations

from datetime import datetime

from search_engine_spark.ops.relational import (
    asof_join,
    events_rollup,
    value_quantiles,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )


def test_asof_strict_before_and_tiebreak(spark):
    t = datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime(2024, 1, 1, 12, 0, 1)
    rows = [
        # user 1: ref at SAME ts as probe must be invisible (strict <)
        (10, t, 1, "purchase", 5.0),
        (11, t, 1, "click", 0.0),
        # user 1: later probe sees it
        (12, t1, 1, "click", 0.0),
        # user 2: two refs at the same earlier ts -> max event_id wins
        (20, t, 2, "purchase", 1.0),
        (21, t, 2, "purchase", 2.0),
        (22, t1, 2, "click", 0.0),
        # user 3: probe with no prior ref -> nulls (LEFT semantics)
        (30, t, 3, "click", 0.0),
    ]
    got = {r.event_id: (r.ref_event, r.ref_value)
           for r in asof_join(_ev(spark, rows)).collect()}
    assert got == {
        11: (None, None),     # same-ts ref invisible
        12: (10, 5.0),
        22: (21, 2.0),        # tie among refs -> larger event_id
        30: (None, None),
    }


def test_rollup_levels_are_consistent(spark):
    t = datetime(2024, 1, 1, 6, 0, 0)
    t2 = datetime(2024, 1, 2, 6, 0, 0)
    rows = [
        (1, t, 1, "click", 1.00),
        (2, t, 1, "click", 2.50),
        (3, t2, 1, "view", 0.25),
    ]
    out = {(r.event_type, str(r.day)): (r.n_events, r.sum_value_cents)
           for r in events_rollup(_ev(spark, rows)).collect()}
    assert out[("click", "2024-01-01")] == (2, 350)
    assert out[("view", "2024-01-02")] == (1, 25)
    assert out[("click", "1900-01-01")] == (2, 350)   # per-type subtotal
    assert out[("(all)", "1900-01-01")] == (3, 375)   # grand total
    assert len(out) == 5


def test_quantiles_discrete_rank_rule(spark):
    t = datetime(2024, 1, 1)
    # n = 10 values 1..10 -> ranks: p50 = ceil(5) = 5, p90 = 9, p99 = 10
    rows = [(i, t, 1, "click", float(i)) for i in range(1, 11)]
    r = value_quantiles(_ev(spark, rows)).collect()[0]
    assert (r.p50, r.p90, r.p99) == (5.0, 9.0, 10.0)


def test_cohort_retention_closed_form(spark):
    from search_engine_spark.ops.relational import cohort_retention

    d = lambda day, h=9: datetime(2024, 3, day, h, 0, 0)  # noqa: E731
    rows = [
        # cohort Mar-1: users 1,2,3. Day1: 1,2 return. Day2: 1 returns.
        (1, d(1), 1, "click", 0.0), (2, d(1), 2, "click", 0.0),
        (3, d(1), 3, "click", 0.0),
        (4, d(2), 1, "click", 0.0), (5, d(2), 2, "click", 0.0),
        (6, d(3), 1, "click", 0.0),
        # same-day repeat must not double-count (user 2, Mar-2, 2 events)
        (7, d(2, 18), 2, "click", 0.0),
        # cohort Mar-2: user 9 only, never returns
        (8, d(2), 9, "click", 0.0),
        # beyond-horizon activity is cut (user 3 on Mar-12, offset 11)
        (9, d(12), 3, "click", 0.0),
    ]
    got = {
        (str(r["cohort_day"]), r["day_offset"]):
            (r["n_users"], r["retained_pct_e6"])
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2024-03-01", 0): (3, 1_000_000),
        ("2024-03-01", 1): (2, 666_666),      # truncating, not rounding
        ("2024-03-01", 2): (1, 333_333),
        ("2024-03-02", 0): (1, 1_000_000),
    }


def test_funnel_first_touch_ordering(spark):
    from search_engine_spark.ops.relational import funnel

    t = lambda m: datetime(2024, 1, 1, 12, m, 0)  # noqa: E731
    rows = [
        # user 1: full ordered funnel
        (1, t(0), 1, "view", 0.0), (2, t(1), 1, "click", 0.0),
        (3, t(2), 1, "purchase", 0.0),
        # user 2: click BEFORE first view — click doesn't count; a
        # later click does, purchase then follows
        (4, t(0), 2, "click", 0.0), (5, t(1), 2, "view", 0.0),
        (6, t(2), 2, "click", 0.0), (7, t(3), 2, "purchase", 0.0),
        # user 3: purchase before click → stops at click
        (8, t(0), 3, "view", 0.0), (9, t(1), 3, "purchase", 0.0),
        (10, t(2), 3, "click", 0.0),
        # user 4: same-ts click as first view (strict >) → stops at view
        (11, t(0), 4, "view", 0.0), (12, t(0), 4, "click", 0.0),
        # user 5: never views
        (13, t(0), 5, "click", 0.0), (14, t(1), 5, "purchase", 0.0),
    ]
    got = {r["step"]: (r["event_type"], r["n_users"], r["conv_pct_e6"])
           for r in funnel(_ev(spark, rows)).collect()}
    assert got == {
        1: ("view", 4, 1_000_000),
        2: ("click", 3, 750_000),
        3: ("purchase", 2, 500_000),
    }

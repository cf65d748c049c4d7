"""Relational operator coverage over the TPC-H-ish driver tables.

These map the reference's relational surface (SURVEY §2.3-2.5: multi-way
equi-joins J1-J4, group aggregations A2-A5, deterministic top-k T1-T2)
onto the star schema, plus event-time windowing/sessionization over
``events`` (the batch twin of streaming/windowed.py).

Plan discipline: dimension tables (region/nation/customer/supplier) are
broadcast — at 100 TB the fact tables shuffle only for the final
aggregate; filters sit directly on scan columns so parquet pushdown and
AQE see them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHIP_CUTOFF = "1998-09-01"
SESSION_GAP_MIN = 30


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with pushed-down predicate
    (reference analogue: corpus-wide stat aggregation A2/A3)."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def top_customers_by_region(
    customer: DataFrame, nation: DataFrame, region: DataFrame, orders: DataFrame,
    k: int = 20,
) -> DataFrame:
    """4-way equi-join + group agg + deterministic top-k — the J1/T1
    candidate-retrieval shape on relational data. Dims broadcast."""
    j = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    agg = j.groupBy("r_name", "c_custkey", "c_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").cast("long").alias("n_orders"),
    )
    return (
        agg.orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
        .select("r_name", "c_custkey", "c_name", "revenue", "n_orders")
    )


def top_parts_per_brand(part: DataFrame, k: int = 3) -> DataFrame:
    """Window top-k per group (row_number), deterministic tie-break."""
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice",
                F.col("rk").cast("int").alias("rk"))
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch twin of the
    structured-streaming path in streaming/windowed.py)."""
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n_events", "sum_value", "n_users",
        )
    )


ROLLING_DAYS = 7


def rolling_user_value(events: DataFrame,
                       days: int = ROLLING_DAYS) -> DataFrame:
    """Per-event trailing-window aggregate: for every event, the count
    and integer-cents value sum of the SAME user's events in the
    preceding ``days`` days inclusive — the rolling-retention /
    recent-activity feature every event store computes (a RANGE window
    frame, the one windowing shape sessionize/rollup/quantiles don't
    cover). Frame key is epoch SECONDS (integer) on both engines, so
    equal-timestamp ties land inside the frame identically; money sums
    are integer cents (the house float-free rule).

    Scale shape: one user-keyed exchange; the range frame sorts within
    (user) partitions — bounded by per-user event counts, the same
    exposure as rel_sessionize's lag window (a whale user is one
    partition; salt-split would break the frame semantics, so the cap
    is documented, not hidden)."""
    from pyspark.sql import Window

    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    e = events.select(
        "event_id", "user_id", "ts",
        F.unix_timestamp("ts").alias("__sec"), cents.alias("__cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__sec")
        .rangeBetween(-(days * 86400), 0)
    )
    return e.select(
        "event_id", "user_id",
        F.count("*").over(w).cast("long").alias("n_trailing"),
        F.sum("__cents").over(w).cast("long").alias("sum_trailing_cents"),
    )


def _rolling_sql(days: int = ROLLING_DAYS) -> str:
    return f"""
WITH e AS (
  SELECT event_id, user_id,
         CAST(epoch(ts) AS BIGINT) AS sec,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       CAST(sum(cents) OVER w AS BIGINT) AS sum_trailing_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN {days * 86400} PRECEDING AND CURRENT ROW)
"""


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(events: DataFrame,
                 types: tuple[str, ...] = PIVOT_TYPES) -> DataFrame:
    """Daily event-type pivot: one row per day, one count column per
    event type (the BI crosstab every product-analytics tool renders).
    Deliberately CONDITIONAL AGGREGATION, not ``DataFrame.pivot`` —
    pivot's value-discovery pass is a second corpus scan and its output
    columns depend on the data; a fixed, schema-stable column set keeps
    the plan one scan + one day-keyed aggregate with map-side combine,
    and makes the DuckDB twin the byte-identical FILTER form.
    Types outside the fixed set land in ``n_other`` (never dropped
    silently)."""
    day = F.to_date("ts").alias("day")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{t}")
        for t in types
    ]
    aggs.append(
        F.sum(F.when(~F.col("event_type").isin(*types), 1).otherwise(0))
        .cast("long")
        .alias("n_other")
    )
    return events.groupBy(day).agg(*aggs)


def _pivot_sql(types: tuple[str, ...] = PIVOT_TYPES) -> str:
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in types
    )
    in_list = ", ".join(f"'{t}'" for t in types)
    return f"""
SELECT CAST(ts AS DATE) AS day,
       {cols},
       CAST(count(*) FILTER (WHERE event_type NOT IN ({in_list})) AS BIGINT)
         AS n_other
FROM events
GROUP BY 1
"""


FUNNEL_STEPS = ("view", "click", "purchase")  # ordered conversion funnel


def funnel(events: DataFrame,
           steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """Ordered funnel analysis (Amplitude/Mixpanel funnels): how many
    users performed step 1, then step 2 STRICTLY AFTER their first
    step 1, then step 3 strictly after that first step-2 — first-touch
    semantics (each step anchors on the user's EARLIEST qualifying
    event, the standard funnel definition). Output one row per step:
    (step int, event_type, n_users, conv_pct_e6) where conv_pct_e6 is
    conversion from step 1 in ×10^6 truncating fixed-point.

    Plan shape: one user-keyed min-aggregation per step, each joined
    back to the events scan on user_id — the same key family
    throughout, so at scale every stage co-partitions; step count is a
    tiny constant. No windows, no per-user event arrays (a whale user
    with 10^6 events folds in the min() combiner)."""
    cur = events.where(F.col("event_type") == steps[0]).groupBy("user_id").agg(
        F.min("ts").alias("t")
    ).localCheckpoint()  # each step builds on the last: pin, don't recompute
    counts = [cur.count()]
    for s in steps[1:]:
        cur = (
            events.where(F.col("event_type") == s)
            .join(cur, "user_id")
            .where(F.col("ts") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        ).localCheckpoint()
        counts.append(cur.count())
    spark = events.sparkSession
    rows = [
        (i + 1, steps[i], counts[i],
         (1_000_000 * counts[i]) // counts[0] if counts[0] else 0)
        for i in range(len(steps))
    ]
    return spark.createDataFrame(
        rows, "step int, event_type string, n_users long, conv_pct_e6 long"
    )


RETENTION_DAYS = 7  # day offsets 0..7 reported per cohort


def cohort_retention(events: DataFrame,
                     max_offset: int = RETENTION_DAYS) -> DataFrame:
    """Daily cohort retention — the canonical product-analytics rollup
    (Mixpanel/Amplitude retention table): cohort = a user's first-event
    day; for each day offset 0..``max_offset``, how many (and what
    fraction of) cohort members were active again that day.

    Output (cohort_day, day_offset, n_users, retained_pct_e6) with the
    fraction in ×10^6 truncating integer fixed-point (cross-engine
    exact; offset 0 is the cohort size itself, pct 10^6 by
    construction).

    Plan shape: two user-keyed aggregations (first-day + distinct
    active days — the same key family, so at scale they co-partition),
    one user-keyed join, then a (cohort, offset)-keyed distinct count;
    the cohort-size table rides a (cohort)-keyed count off the firsts
    aggregate. No windows, no driver scalars."""
    firsts = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    j = (
        activity.join(firsts, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .where(F.col("day_offset").between(0, max_offset))
    )
    ret = j.groupBy("cohort_day", "day_offset").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    return (
        ret.join(sizes, "cohort_day")
        .select(
            "cohort_day",
            F.col("day_offset").cast("int").alias("day_offset"),
            "n_users",
            F.expr("(1000000L * n_users) div cohort_users")
            .alias("retained_pct_e6"),
        )
    )


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization via window functions: new session when
    the per-user inter-event gap exceeds ``gap_min`` minutes. Integer
    outputs only — engine-exact."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact on both engines; parquet ts is NTZ → cast first
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    marked = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_min * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


def asof_join(
    events: DataFrame, probe_type: str = "click", ref_type: str = "purchase"
) -> DataFrame:
    """As-of join without a join: each ``probe_type`` event picks the
    latest STRICTLY-earlier ``ref_type`` event of the same user (ties
    among refs broken by max event_id; no prior ref → nulls, LEFT
    semantics).

    Scale shape: the classic union-and-window as-of — tag both sides,
    sort within user by (ts, is_ref, event_id) so same-ts refs land
    AFTER probes (strict <), and carry the last non-null ref columns
    forward. ONE shuffle (the window partition), no join, no state
    proportional to ref-side size — this is how an as-of over two
    100 TB streams stays a single exchange, where a per-probe lateral
    lookup (the oracle's formulation) would be quadratic.
    """
    probe = events.where(F.col("event_type") == probe_type).select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("__is_ref"),
        F.lit(None).cast("long").alias("__ref_event"),
        F.lit(None).cast("double").alias("__ref_value"),
    )
    ref = events.where(F.col("event_type") == ref_type).select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("__is_ref"),
        F.col("event_id").alias("__ref_event"),
        F.col("value").alias("__ref_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.unix_micros(F.col("ts").cast("timestamp")),
            "__is_ref", "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        probe.unionByName(ref)
        .withColumn(
            "ref_event", F.last("__ref_event", ignorenulls=True).over(w)
        )
        .withColumn(
            "ref_value", F.last("__ref_value", ignorenulls=True).over(w)
        )
        .where(F.col("__is_ref") == 0)
        .select("event_id", "user_id", "ref_event", "ref_value")
    )


def events_rollup(events: DataFrame) -> DataFrame:
    """Hierarchical rollup (event_type → day → grand total) in one
    GROUPING-SETS pass — the hypertable-rollup shape: Catalyst expands
    the rollup into one aggregate with a grouping-id column, one
    shuffle total instead of three passes. Money sums are integer cents
    so every level is engine-exact."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    return (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"),
            cents.alias("__cents"),
        )
        .rollup("event_type", "day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("__cents").cast("long").alias("sum_value_cents"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("day"), F.lit("1900-01-01").cast("date")).alias("day"),
            "n_events", "sum_value_cents",
        )
    )


def value_quantiles(events: DataFrame) -> DataFrame:
    """Exact per-type p50/p90/p99 of ``value`` with a deterministic
    discrete rule: the element at 1-indexed rank ceil(p·n) of the
    (value, event_id)-sorted list — integer rank arithmetic, no
    interpolation, so both engines pick the identical input double.
    One window pass + one aggregate; at scale the sort is per-type
    within the exchange, never global."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (
        events.select("event_type", "value", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("event_type"))
        )
    )

    def at(num: int, den: int):  # rank = ceil(num/den * n), integers only
        target = F.expr(f"({num} * n + {den} - 1) div {den}")
        return F.max(F.when(F.col("rn") == target, F.col("value")))

    return ranked.groupBy("event_type").agg(
        at(1, 2).alias("p50"), at(9, 10).alias("p90"), at(99, 100).alias("p99")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Markov transition matrix over per-user event sequences — the
    path-analysis primitive behind Sankey / user-flow views (Amplitude
    Pathfinder, GA4 path exploration): for every ordered adjacent pair
    of events of the SAME user, count (event_type → next_type) and the
    per-source transition probability in ×10^6 truncating fixed-point.

    Determinism: sequence order is (ts, event_id) — the integer
    tie-break both engines share. Output one row per observed
    (event_type, next_type).

    Scale shape: ONE user-keyed exchange for the lead() window
    (bounded by per-user event counts, same exposure as
    rel_sessionize), then a tiny (type, type)-keyed aggregate —
    |types|² rows at most — with map-side combine. The per-source
    totals ride the same aggregate output (a second pass over the
    |types|²-row table, not the events scan)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count("*").cast("long").alias("n_transitions")
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("n_transitions").cast("long").alias("__total")
    )
    return (
        counts.join(F.broadcast(totals), "event_type")
        .select(
            "event_type", "next_type", "n_transitions",
            F.expr("(1000000L * n_transitions) div __total").alias("prob_e6"),
        )
    )


ACTIVE_WINDOW_DAYS = 7


def active_users_rolling(events: DataFrame,
                         days: int = ACTIVE_WINDOW_DAYS) -> DataFrame:
    """DAU + trailing-7-day active users (the DAU/WAU pair every growth
    dashboard tracks): per calendar day with ≥1 event, the number of
    distinct users active THAT day and in the trailing ``days``-day
    window ending that day.

    Rolling DISTINCT cannot ride a window frame (count(DISTINCT) over
    RANGE is unsupported and un-mergeable); the scale-correct plan is
    the day-grid fan-out: the (day, user) distinct pairs — tiny, one
    row per user-day — each replicated onto the ``days`` days they keep
    the user "active", then a day-keyed distinct count. Fan-out factor
    is the constant ``days``, applied AFTER the per-day dedupe, so the
    events scan is touched once and the exploded table is
    days × |user-days|, never days × |events|."""
    daily = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = daily.groupBy("day").agg(
        F.count("*").cast("long").alias("dau")
    )
    fan = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(days - 1))).alias("o"),
        "day", "user_id",
    ).select(F.date_add("day", F.col("o")).alias("day"), "user_id")
    wau = fan.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    # report only days that actually occur (the fan-out invents trailing
    # ghost days past the last event; the dau join drops them)
    return dau.join(wau, "day").select("day", "dau", "wau")


def daily_anomalies(events: DataFrame) -> DataFrame:
    """Per-(event_type, day) volume anomaly score — the ops-dashboard
    outlier view: z-score of each day's event count against that type's
    all-days mean/std, in ×10^4 fixed-point.

    Cross-engine exactness: mean/variance are NOT computed via the
    engines' streaming variance aggregates (Welford accumulation order
    differs between engines); instead the z-score is algebraically
    restated over three INTEGER sums per type — n days, S1 = Σcnt,
    S2 = Σcnt² — so both engines evaluate
    round(1e4·(n·cnt − S1) / sqrt(n·S2 − S1²)) from identical
    integers: one sqrt, one divide, one round, bit-identical. Types
    with zero variance emit 0.

    Scale shape: one (type, day)-keyed aggregate off the scan, then a
    |types|-row aggregate broadcast back — no window, no second scan."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("n_events").cast("long").alias("__s1"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("__s2"),
    )
    # mean = S1/n and σ_pop = sqrt(n·S2 − S1²)/n, so
    # z = (cnt − mean)/σ_pop = (n·cnt − S1)/sqrt(n·S2 − S1²):
    # integer numerator, sqrt of an integer denominator.
    num = F.col("__n") * F.col("n_events") - F.col("__s1")
    den_sq = F.col("__n") * F.col("__s2") - F.col("__s1") * F.col("__s1")
    z_e4 = F.when(
        den_sq > 0,
        F.round(F.lit(10000.0) * num.cast("double") / F.sqrt(den_sq.cast("double")))
        .cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select("event_type", "day", "n_events", z_e4.alias("z_e4"))
    )


# --------------------------------------------------------------- oracle SQL

ORACLE_SQL = {
    "rel_events_pivot": _pivot_sql(),
    "rel_rolling_value": _rolling_sql(),
    "rel_event_transitions": """
WITH pairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
c AS (
  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
t AS (
  SELECT event_type, CAST(sum(n_transitions) AS BIGINT) AS total
  FROM c GROUP BY event_type
)
SELECT c.event_type, c.next_type, c.n_transitions,
       CAST((1000000 * c.n_transitions) // t.total AS BIGINT) AS prob_e6
FROM c JOIN t USING (event_type)
""",
    "rel_active_users_rolling": f"""
WITH daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM daily GROUP BY day
),
fan AS (
  SELECT daily.day + CAST(o.o AS INTEGER) AS day, daily.user_id
  FROM daily, (SELECT unnest(range(0, {ACTIVE_WINDOW_DAYS})) AS o) o
),
wau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM fan GROUP BY day
)
SELECT day, dau, wau FROM dau JOIN wau USING (day)
""",
    "rel_daily_anomalies": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_events) AS BIGINT) AS s1,
         CAST(sum(n_events * n_events) AS BIGINT) AS s2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.n_events,
       CAST(CASE WHEN s.n * s.s2 - s.s1 * s.s1 > 0
            THEN CAST(round(10000.0 * (s.n * d.n_events - s.s1)
                 / sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE))) AS BIGINT)
            ELSE 0 END AS BIGINT) AS z_e4
FROM daily d JOIN stats s USING (event_type)
""",
    "rel_funnel": f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t GROUP BY e.user_id
),
c AS (
  SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS event_type,
         CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
  UNION ALL
  SELECT 2, '{FUNNEL_STEPS[1]}', CAST((SELECT count(*) FROM s2) AS BIGINT)
  UNION ALL
  SELECT 3, '{FUNNEL_STEPS[2]}', CAST((SELECT count(*) FROM s3) AS BIGINT)
)
SELECT CAST(step AS INTEGER) AS step, event_type, n_users,
       CAST(CASE WHEN (SELECT n_users FROM c WHERE step = 1) > 0
            THEN (1000000 * n_users) // (SELECT n_users FROM c WHERE step = 1)
            ELSE 0 END AS BIGINT) AS conv_pct_e6
FROM c
""",
    "rel_cohort_retention": f"""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
j AS (
  SELECT f.cohort_day, date_diff('day', f.cohort_day, a.day) AS day_offset,
         a.user_id
  FROM activity a JOIN firsts f USING (user_id)
  WHERE date_diff('day', f.cohort_day, a.day) BETWEEN 0 AND {RETENTION_DAYS}
),
ret AS (
  SELECT cohort_day, day_offset,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM j GROUP BY cohort_day, day_offset
),
sizes AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_users
  FROM firsts GROUP BY cohort_day
)
SELECT r.cohort_day, CAST(r.day_offset AS INTEGER) AS day_offset, r.n_users,
       CAST((1000000 * r.n_users) // s.cohort_users AS BIGINT)
         AS retained_pct_e6
FROM ret r JOIN sizes s USING (cohort_day)
""",
    "rel_asof_join": """
SELECT p.event_id, p.user_id, r.ref_event, r.ref_value
FROM (SELECT * FROM events WHERE event_type = 'click') p
LEFT JOIN LATERAL (
  SELECT e.event_id AS ref_event, e.value AS ref_value
  FROM events e
  WHERE e.event_type = 'purchase' AND e.user_id = p.user_id
    AND e.ts < p.ts
  ORDER BY e.ts DESC, e.event_id DESC
  LIMIT 1
) r ON TRUE
""",
    "rel_events_rollup": """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(CAST(ts AS DATE), DATE '1900-01-01') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
""",
    "rel_value_quantiles": """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       max(CASE WHEN rn = (1 * n + 1) // 2 THEN value END) AS p50,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
       max(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
FROM ranked
GROUP BY event_type
""",
    "rel_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "rel_top_customers_by_region": """
WITH agg AS (
  SELECT r.r_name, c.c_custkey, c.c_name,
         round(sum(o.o_totalprice), 2) AS revenue,
         count(*) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, c.c_custkey, c.c_name
)
SELECT r_name, c_custkey, c_name, revenue, n_orders
FROM agg ORDER BY revenue DESC, c_custkey ASC LIMIT 20
""",
    "rel_top_parts_per_brand": """
WITH rk AS (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
  FROM part
)
SELECT p_brand, p_partkey, p_name, p_retailprice, CAST(rk AS INTEGER) AS rk
FROM rk WHERE rk <= 3
""",
    "rel_events_hourly": """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 3) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
    "rel_sessionize": f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id,
         -- DuckDB windowed sum is HUGEINT (int128); cast to match Spark BIGINT
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(event_id) AS first_event,
       max(event_id) AS last_event
FROM s GROUP BY user_id, session_id
""",
}

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


# --------------------------------------------------------------- oracle SQL

ORACLE_SQL = {
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

"""Analytics layer — the aggregation/window/top-k queries the reference's
README poses ("Which stations are most popular?", README.md:5) but never
implements (SURVEY.md §2.5, §7 step 6).

Scale notes: every groupBy here aggregates map-side first (partial
HashAggregate), so the shuffle carries one row per (partition, key). Join
chains put the small dims on the broadcast side explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped rollup: filter -> groupBy -> multi-agg.

    Float sums are rounded at the *final* aggregate only; intermediate
    arithmetic stays in whole-stage codegen.
    """
    return (
        lineitem.where(F.col("l_shipdate") < F.lit(ship_before).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_stations(trips: DataFrame, k: int = 10) -> DataFrame:
    """Top-k via window rank over grouped counts (deterministic
    tie-break on the key)."""
    counts = trips.groupBy("start_station_id").agg(
        F.count(F.lit(1)).alias("rides")
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition partial
    # top-k, merged at the driver) — a global row_number window would move
    # every group to one partition first
    topk = counts.orderBy(F.desc("rides"), F.asc("start_station_id")).limit(k)
    w = Window.orderBy(F.desc("rides"), F.asc("start_station_id"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("bigint")).select(
        "start_station_id", "rides", "rnk"
    )


def rides_per_hour(trips: DataFrame) -> DataFrame:
    """Hour-of-day x weekday usage matrix."""
    return (
        trips.groupBy(
            F.hour("starttime").cast("bigint").alias("hour"),
            F.dayofweek("starttime").cast("bigint").alias("weekday"),
        )
        .agg(F.count(F.lit(1)).alias("rides"))
    )


def revenue_by_nation(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Fact->dim join chain with broadcast dims + monthly rollup."""
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Daily conditional-aggregation pivot (the covid-period comparison
    shape from SURVEY.md §7 step 6), expressed as CASE-WHEN sums so the
    plan is a single pass."""
    day = F.to_date("ts").cast("string").alias("day")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"cnt_{t}")
        for t in ["click", "view", "purchase", "signup", "error"]
    ]
    return events.groupBy(day).agg(*aggs)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + cumulative sum windows (per-user).

    Gap arithmetic uses exact epoch-micros integers (float/second
    truncation behaves differently across engines). At scale this is one
    shuffle on user_id; both windows share the same partitioning so
    Catalyst plans a single exchange.
    """
    ts_us = F.unix_micros("ts")
    base = events.select("user_id", "event_id", ts_us.alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    with_flag = base.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(gap.isNull() | (gap > gap_minutes * 60_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    with_session = with_flag.withColumn(
        "session_id", F.sum("new_session").over(w).cast("bigint")
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )

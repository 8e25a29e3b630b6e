"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fact-table build at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
mirror for each (see data_lake_for_citi_bike_trip_spark/oracles.py for the
cross-engine parity rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark import oracles
from data_lake_for_citi_bike_trip_spark.operators import (
    analytics,
    asof,
    setops,
    staging,
    star,
)
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table
from data_lake_for_citi_bike_trip_spark.plans import checks

SF_SMOKE = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Query callables. Each loads only the tables it needs (column pruning and
# filter pushdown then reach the parquet scan per query).
# ---------------------------------------------------------------------------

def _staged(spark: SparkSession, sf_dir: str):
    events = load_table(spark, sf_dir, "events")
    return staging.trips(events), staging.covid(events), staging.weather(events)


def q_fact_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips, covid, weather = _staged(spark, sf_dir)
    return star.fact_trips(trips, covid, weather)


def q_dim_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips, _, _ = _staged(spark, sf_dir)
    return star.dim_time(trips)


def q_dim_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips, _, _ = _staged(spark, sf_dir)
    return star.dim_user_agg(trips)


def q_dim_bike(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips, _, _ = _staged(spark, sf_dir)
    return star.dim_bike(trips)


def q_dim_covid(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, covid, _ = _staged(spark, sf_dir)
    return star.dim_covid(covid)


def q_dim_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, weather = _staged(spark, sf_dir)
    return star.dim_weather(weather)


def q_dim_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return star.dim_station(staging.stations(customer))


def q_dq_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips, covid, weather = _staged(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    return checks.dq_counts(
        {
            "trips": trips,
            "covid": covid,
            "weather": weather,
            "stations": staging.stations(customer),
        },
        null_checks={"null_trip_ids": (trips, "bikeid")},
    )


# -- analytics layer ---------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def q_top_stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips, _, _ = _staged(spark, sf_dir)
    return analytics.top_stations(trips, k=10)


def q_rides_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    trips, _, _ = _staged(spark, sf_dir)
    return analytics.rides_per_hour(trips)


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.revenue_by_nation(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.event_type_pivot(load_table(spark, sf_dir, "events"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)


def q_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    errors = events.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.unix_micros("ts").alias("p_ts_us"),
        F.col("value").alias("p_value"),
    )
    joined = asof.asof_join(
        errors, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["p_ts_us", "p_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "asof_p_ts_us",
        "asof_p_value",
    )


def q_range_price_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        (F.col("p_retailprice") - 5.0).alias("lo"),
        (F.col("p_retailprice") + 5.0).alias("hi"),
    )
    return asof.range_join_bucketed(
        lineitem, part, point_col="l_extendedprice", lo_col="lo", hi_col="hi",
        bucket_width=10.0,
    ).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "p_partkey", "p_retailprice"
    )


def q_union_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    data = events.where(F.col("event_type").isin("view", "click")).select(
        "event_id", "event_type", "value", "user_id"
    )
    complement = events.where(F.col("event_type") == "signup").select(
        "event_id", "event_type"
    )
    return setops.union_backfill(data, complement)


def q_anti_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    return setops.anti_join_manifest(users, supplier, "user_id", "s_suppkey")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_fact_trips(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "fact_trips": q_fact_trips,
        "dim_time": q_dim_time,
        "dim_user_agg": q_dim_user_agg,
        "dim_bike": q_dim_bike,
        "dim_covid": q_dim_covid,
        "dim_weather": q_dim_weather,
        "dim_station": q_dim_station,
        "dq_counts": q_dq_counts,
        "pricing_summary": q_pricing_summary,
        "top_stations": q_top_stations,
        "rides_per_hour": q_rides_per_hour,
        "revenue_by_nation": q_revenue_by_nation,
        "event_type_pivot": q_event_type_pivot,
        "sessionize": q_sessionize,
        "asof_purchase": q_asof_purchase,
        "range_price_match": q_range_price_match,
        "union_backfill": q_union_backfill,
        "anti_users": q_anti_users,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "fact_trips": oracles.FACT_TRIPS,
        "dim_time": oracles.DIM_TIME,
        "dim_user_agg": oracles.DIM_USER_AGG,
        "dim_bike": oracles.DIM_BIKE,
        "dim_covid": oracles.DIM_COVID,
        "dim_weather": oracles.DIM_WEATHER,
        "dim_station": oracles.DIM_STATION,
        "dq_counts": oracles.DQ_COUNTS,
        "pricing_summary": oracles.PRICING_SUMMARY,
        "top_stations": oracles.TOP_STATIONS,
        "rides_per_hour": oracles.RIDES_PER_HOUR,
        "revenue_by_nation": oracles.REVENUE_BY_NATION,
        "event_type_pivot": oracles.EVENT_TYPE_PIVOT,
        "sessionize": oracles.SESSIONIZE,
        "asof_purchase": oracles.ASOF_PURCHASE,
        "range_price_match": oracles.RANGE_PRICE_MATCH,
        "union_backfill": oracles.UNION_BACKFILL,
        "anti_users": oracles.ANTI_USERS,
    }

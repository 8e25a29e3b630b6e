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

from data_lake_for_citi_bike_trip_spark import oracles
from data_lake_for_citi_bike_trip_spark.operators import analytics, staging, star
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
    }

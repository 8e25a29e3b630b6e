"""Star-schema builds — the reference's seven tables, Spark-first.

Reference queries: spark_elt_emr.py:62-185 (fact :62-83, time :86-105,
user_agg :108-117, bike :120-126, covid :129-145, weather :148-163,
station :166-185). Re-expressed as pure DataFrame->DataFrame functions so
Catalyst sees one declarative plan per table (column pruning + pushdown
reach the scan; the small dims broadcast).

Scale notes (100 TB):
- The fact build is trips ⟕ covid ⟕ weather. Covid is ~735 rows/yr and
  weather ~9k rows/yr — both permanently broadcast-able, so the fact
  pipeline is shuffle-free except for the final partitioned write. We hint
  ``broadcast()`` explicitly rather than trusting the size estimator.
- The reference's global ORDER BY before a partitioned write (O1) buys
  nothing at scale (file order within partitions is not a query-visible
  property) and costs a full range-exchange; we drop it and instead allow
  an optional ``sortWithinPartitions`` for run-length/encoding locality.
- DISTINCT-based dims are partial+final hash aggregates — map-side combine
  keeps the shuffle small because dim cardinality << fact cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import hour_bucket_epoch, trip_id, user_agg_id


def fact_trips(
    trips: DataFrame, covid: DataFrame, weather: DataFrame
) -> DataFrame:
    """bikeshare_fact_table (spark_elt_emr.py:62-83).

    Left joins preserve trip multiplicity: a missing dim row yields NULL
    keys; a duplicated weather observation fans out (SURVEY.md §2.3).
    """
    c = covid.select(
        F.to_date("date_of_interest", "MM/dd/yyyy").alias("covid_id")
    ).alias("c")
    w = weather.select(F.col("valid_time_gmt").alias("weather_id")).alias("w")
    t = trips.alias("t")
    return (
        t.join(F.broadcast(c), F.to_date(t.starttime) == c.covid_id, "left")
        .join(
            F.broadcast(w),
            hour_bucket_epoch(t.starttime) == w.weather_id,
            "left",
        )
        .select(
            trip_id(t.start_epoch_us, t.bikeid).alias("id"),
            t.start_epoch_us.alias("start_epoch_us"),
            t.tripduration.alias("duration"),
            t.start_station_id,
            t.end_station_id,
            t.bikeid,
            t.usertype,
            user_agg_id(t.usertype, t.gender, t.birth_year).alias("user_agg_id"),
            # Dates/ints emitted as ISO strings / bigints: keeps the output
            # schema identical across engines (oracles.py header).
            c.covid_id.cast("string").alias("covid_id"),
            w.weather_id,
            F.year(t.starttime).cast("bigint").alias("year"),
            F.month(t.starttime).cast("bigint").alias("month"),
        )
    )


def dim_time(trips: DataFrame) -> DataFrame:
    """dim_time_table (spark_elt_emr.py:86-105) — DISTINCT start times to
    calendar attributes. Emits ``start_epoch_us`` (the reference's
    ``dat`` column is a bug, SURVEY.md §2.12 #1; and integer epochs avoid
    cross-engine timestamp rendering)."""
    distinct_ts = trips.select("starttime", "start_epoch_us").distinct()
    return distinct_ts.select(
        F.col("start_epoch_us"),
        F.minute("starttime").cast("bigint").alias("minute"),
        F.hour("starttime").cast("bigint").alias("hour"),
        F.dayofmonth("starttime").cast("bigint").alias("day"),
        F.weekofyear("starttime").cast("bigint").alias("week"),
        F.dayofweek("starttime").cast("bigint").alias("weekday"),
        F.year("starttime").cast("bigint").alias("year"),
        F.month("starttime").cast("bigint").alias("month"),
    )


def dim_user_agg(trips: DataFrame) -> DataFrame:
    """dim_user_agg_table (spark_elt_emr.py:108-117): DISTINCT user tuples
    keyed by NULL-propagating concat (NULL gender/birth_year => NULL key;
    fact agrees because both sides share the expression)."""
    return trips.select(
        user_agg_id(
            F.col("usertype"), F.col("gender"), F.col("birth_year")
        ).alias("user_agg_id"),
        "usertype",
        "gender",
        "birth_year",
    ).distinct()


def dim_bike(trips: DataFrame) -> DataFrame:
    """dim_bike_table (spark_elt_emr.py:120-126): DISTINCT string ids,
    lexicographic ORDER BY ('16214' < '9981', SURVEY.md §2.6 O2)."""
    return trips.select(F.col("bikeid").alias("bike_id")).distinct().orderBy(
        "bike_id"
    )


def dim_covid(covid: DataFrame) -> DataFrame:
    """dim_covid_table (spark_elt_emr.py:129-145): US-format date parse +
    borough count projection."""
    return covid.select(
        F.to_date("date_of_interest", "MM/dd/yyyy").cast("string").alias("covid_id"),
        F.col("case_count"),
        F.col("probable_case_count"),
        F.col("bx_case_count"),
        F.col("bk_case_count"),
    )


def dim_weather(weather: DataFrame) -> DataFrame:
    """dim_weather_table (spark_elt_emr.py:148-163): rename projection +
    NULL-default CASE WHEN on gust (P3) + dedup of repeated observations.

    The reference sorts on non-projected ``valid_time_gmt`` (O3) — legal
    ordering-before-projection; order is not query-visible after a write,
    so we expose the key instead and skip the global sort.
    """
    return weather.select(
        F.col("valid_time_gmt").alias("weather_id"),
        F.col("temp").alias("temperature"),
        F.col("rh").alias("humidity"),
        F.coalesce(F.col("gust"), F.lit(0.0)).alias("gust"),
        F.col("pressure"),
        F.col("wx_phrase").alias("condition"),
    ).distinct()


def dim_station(stations: DataFrame) -> DataFrame:
    """dim_station (spark_elt_emr.py:166-185): DISTINCT full-row snapshot,
    lexicographic sort on string station_id (O4)."""
    return stations.distinct().orderBy("station_id")

"""Adapters: driver testdata -> reference-shaped staging tables.

The reference's staging inputs are Citi Bike trips, a daily covid feed, an
hourly weather feed, and a station snapshot (FIXTURES.md). The driver's
synthetic testdata has no such feeds, so per FIXTURES.md §6 we *derive*
them deterministically from ``events`` (and ``customer`` for stations):

- ``trips``   — one row per event; ts->starttime, user_id->bikeid,
  event_type->usertype, value->duration; gender/birth_year derived from
  ``props.k`` with deterministic NULL injection (exercising the
  NULL-propagating concat key, SURVEY.md §2.8).
- ``covid``   — daily rollup keyed by a ``MM/dd/yyyy`` *string* date (so
  the to_date parse path is exercised); some days deliberately missing
  (left-join NULL covid_id).
- ``weather`` — hourly rollup with observation epochs at hour-start minus
  540 s (the reference's :51-past-the-hour quirk, spark_elt_emr.py:79);
  one hour deliberately missing, one hour deliberately duplicated
  (left-join NULL / fan-out multiplicity, SURVEY.md §2.3).

Every expression here has an exact ANSI-SQL mirror in
``__spark_entry__.py``'s oracle CTEs — keep the two in lockstep.
Aggregates use only order-insensitive-exact functions (count/min/max),
never float sums, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import hour_bucket_epoch
from ..session import spread

#: props is a JSON-ish string '{"k": 87}'; extract the int without a JSON
#: parser so the DuckDB oracle can use the identical regex.
K_PATTERN = r'"k":\s*(\d+)'


def rebalanced(events: DataFrame) -> DataFrame:
    """One shared spread() for all three staging derivations: identical
    exchange subtrees let Spark plan a ReusedExchange instead of
    re-shuffling the source three times (single-file inputs arrive as one
    split; CPU-heavy staging needs full parallelism)."""
    return spread(events)


def trips(events: DataFrame) -> DataFrame:
    k = F.regexp_extract("props", K_PATTERN, 1).cast("int")
    return events.select(
        F.col("ts").alias("starttime"),
        F.unix_micros("ts").alias("start_epoch_us"),
        F.col("user_id").cast("string").alias("bikeid"),
        F.col("event_type").alias("usertype"),
        F.col("value").alias("tripduration"),
        (F.col("user_id") % 50).cast("string").alias("start_station_id"),
        ((F.col("user_id") * 7 + 3) % 50).cast("string").alias("end_station_id"),
        F.when(k % 10 != 0, (k % 3).cast("string")).alias("gender"),
        F.when(k % 13 != 0, (1950 + k % 70).cast("string")).alias("birth_year"),
    )


def covid(events: DataFrame) -> DataFrame:
    """Daily feed; day-of-month multiples of 7 are withheld so fact rows on
    those days get NULL covid_id (late/missing-data behavior)."""
    day = F.to_date("ts")
    return (
        events.groupBy(day.alias("d"))
        .agg(
            F.count(F.lit(1)).alias("case_count"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias(
                "probable_case_count"
            ),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "bx_case_count"
            ),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("bk_case_count"),
        )
        .where(F.dayofmonth("d") % 7 != 0)
        .select(
            F.date_format("d", "MM/dd/yyyy").alias("date_of_interest"),
            "case_count",
            "probable_case_count",
            "bx_case_count",
            "bk_case_count",
        )
    )


def weather(events: DataFrame) -> DataFrame:
    """Hourly observations at hour_start - 540 s. Hour 3 withheld (NULL
    weather_id); hour 7 duplicated (join fan-out). gust-analog is NULL for
    hours with no 'error' events (exercises the CASE WHEN default, P3)."""
    hourly = (
        events.groupBy(F.date_trunc("hour", "ts").alias("obs_hour"))
        .agg(
            F.max("value").alias("temp"),
            F.count(F.lit(1)).alias("rh"),
            F.max(F.when(F.col("event_type") == "error", F.col("value"))).alias(
                "gust"
            ),
            F.min("value").alias("pressure"),
            F.max("event_type").alias("wx_phrase"),
        )
        .where(F.hour("obs_hour") != 3)
        .select(
            hour_bucket_epoch(F.col("obs_hour")).alias("valid_time_gmt"),
            "temp",
            "rh",
            "gust",
            "pressure",
            "wx_phrase",
            F.hour("obs_hour").alias("obs_hour_of_day"),
        )
    )
    dup = hourly.where(F.col("obs_hour_of_day") == 7)
    return hourly.unionAll(dup).drop("obs_hour_of_day")


def stations(customer: DataFrame) -> DataFrame:
    """Station snapshot stand-in from ``customer`` (FIXTURES.md §6): string
    ids (lexicographic sort semantics, SURVEY.md §2.6 O2/O4)."""
    return customer.select(
        F.col("c_custkey").cast("string").alias("station_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("string").alias("region_id"),
        F.col("c_acctbal").alias("lat"),
        F.col("c_mktsegment").alias("station_type"),
    )

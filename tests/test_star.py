"""Star-schema semantics tests (reference behaviors from SURVEY.md §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import staging, star
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table


def _staged(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return staging.trips(events), staging.covid(events), staging.weather(events)


def test_fact_preserves_multiplicity_and_nulls(spark, sf_dir):
    trips, covid, weather = _staged(spark, sf_dir)
    fact = star.fact_trips(trips, covid, weather).cache()
    n_trips = trips.count()
    n_fact = fact.count()
    # Duplicated hour-7 weather observations fan fact rows out (J2
    # multiplicity, SURVEY.md §2.3)...
    assert n_fact > n_trips
    # ...and withheld dim rows surface as NULL keys, not dropped rows.
    assert fact.where(F.col("covid_id").isNull()).count() > 0
    assert fact.where(F.col("weather_id").isNull()).count() > 0
    # Fact PK is never NULL (the reference's one hard DQ check).
    assert fact.where(F.col("id").isNull()).count() == 0
    fact.unpersist()


def test_user_agg_key_null_propagation(spark, sf_dir):
    trips, _, _ = _staged(spark, sf_dir)
    dim = star.dim_user_agg(trips)
    rows = dim.where(F.col("gender").isNull() | F.col("birth_year").isNull())
    # NULL-propagating concat (spark_elt_emr.py:72): any NULL component
    # must null the whole key.
    assert rows.count() > 0
    assert rows.where(F.col("user_agg_id").isNotNull()).count() == 0


def test_dim_bike_lexicographic_sort(spark, sf_dir):
    trips, _, _ = _staged(spark, sf_dir)
    ids = [r.bike_id for r in star.dim_bike(trips).collect()]
    assert ids == sorted(ids)  # string sort: '10' < '9'
    assert len(ids) == len(set(ids))


def test_dim_weather_gust_default(spark, sf_dir):
    _, _, weather = _staged(spark, sf_dir)
    dim = star.dim_weather(weather)
    assert dim.where(F.col("gust").isNull()).count() == 0
    assert dim.where(F.col("gust") == 0.0).count() > 0  # CASE WHEN applied


def test_fact_plan_broadcasts_dims(spark, sf_dir):
    trips, covid, weather = _staged(spark, sf_dir)
    plan = star.fact_trips(trips, covid, weather)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

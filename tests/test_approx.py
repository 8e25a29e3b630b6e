from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import analytics
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table


def test_approx_distinct_error_bounded(spark, sf_dir):
    out = analytics.approx_distinct_users(load_table(spark, sf_dir, "events"))
    rows = out.collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err <= 0.05, (r.day, r.approx_users, r.exact_users)

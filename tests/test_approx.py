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


def test_hll_incremental_rollup_matches_direct_sketch(spark, sf_dir):
    """The union of per-hour sketches must estimate the same as one
    direct per-day sketch (mergeability — the property the incremental
    pattern rests on), and the bound flag must hold."""
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark.operators import profile
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    out = profile.hll_incremental_distinct(events)
    rows = out.collect()
    assert rows and all(r.hll_ok for r in rows)

    direct = (
        events.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"))
    )
    merged = (
        events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "user_id",
        )
        .groupBy("day", "hour")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est"))
    )
    j = direct.join(merged, "day").collect()
    assert j and all(r.direct_est == r.union_est for r in j)

from __future__ import annotations

import pytest

from data_lake_for_citi_bike_trip_spark.plans import checks
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table


def test_run_checks_pass_and_fail(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    ok = [
        checks.not_empty("events_not_empty", events),
        checks.no_nulls("event_id_not_null", events, "event_id"),
    ]
    results = checks.run_checks(ok)
    assert all(passed for _, _, passed in results)

    with pytest.raises(ValueError, match="events_empty"):
        checks.run_checks([checks.not_empty("events_empty", events.limit(0))])


def test_dq_counts_one_row_per_check(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    df = checks.dq_counts({"events": events}, {"null_ids": (events, "event_id")})
    rows = {r.table_name: r.row_cnt for r in df.collect()}
    assert rows["events"] > 0
    assert rows["null_ids"] == 0

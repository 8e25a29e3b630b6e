"""SCD2 merge semantics (Delta-free set-algebra emulation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import scd


def _table(spark, rows):
    return spark.createDataFrame(
        rows, "station_id string, capacity long, valid_from_us long, valid_to_us long"
    )


def test_scd2_apply_full_matrix(spark):
    t0, t1 = 1_000, 2_000
    current = _table(
        spark,
        [
            ("A", 10, t0, scd.OPEN_END_US),   # will change
            ("B", 20, t0, scd.OPEN_END_US),   # re-asserted identical
            ("C", 30, t0, scd.OPEN_END_US),   # absent from batch
            ("A", 5, 0, t0),                  # A's already-closed history
        ],
    )
    updates = spark.createDataFrame(
        [("A", 11), ("B", 20), ("D", 40)], "station_id string, capacity long"
    )
    out = scd.scd2_apply(current, updates, "station_id", ["capacity"], t1).cache()
    rows = {(r.station_id, r.capacity, r.valid_from_us, r.valid_to_us) for r in out.collect()}

    assert ("A", 10, t0, t1) in rows            # old A version closed at t1
    assert ("A", 11, t1, scd.OPEN_END_US) in rows  # new A version opened
    assert ("A", 5, 0, t0) in rows              # history untouched
    assert ("B", 20, t0, scd.OPEN_END_US) in rows  # identical -> unchanged
    assert ("C", 30, t0, scd.OPEN_END_US) in rows  # absent -> unchanged
    assert ("D", 40, t1, scd.OPEN_END_US) in rows  # brand-new key inserted
    assert len(rows) == 6
    # exactly one open row per live key
    opens = out.where(F.col("valid_to_us") == scd.OPEN_END_US)
    assert opens.groupBy("station_id").count().where(F.col("count") > 1).count() == 0
    out.unpersist()


def test_scd2_null_tracked_values(spark):
    """NULL-safe comparison: NULL -> NULL is 'unchanged', NULL -> value is
    a change (eqNullSafe semantics)."""
    t1 = 2_000
    current = _table(spark, [("A", None, 0, scd.OPEN_END_US), ("B", None, 0, scd.OPEN_END_US)])
    updates = spark.createDataFrame(
        [("A", None), ("B", 7)], "station_id string, capacity long"
    )
    out = scd.scd2_apply(current, updates, "station_id", ["capacity"], t1)
    rows = {(r.station_id, r.capacity, r.valid_to_us) for r in out.collect()}
    assert ("A", None, scd.OPEN_END_US) in rows      # NULL==NULL: no new version
    assert ("B", None, t1) in rows                   # closed
    assert ("B", 7, scd.OPEN_END_US) in rows         # reopened with value
    assert len(rows) == 3


def test_apply_changes_cdc_matrix(spark):
    """CDC merge: latest-op-wins per key, deletes drop keys (including
    deletes of absent keys, which are no-ops), inserts add new keys,
    untouched keys pass through."""
    from data_lake_for_citi_bike_trip_spark.operators.scd import apply_changes

    current = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (1, 10, "U", "a2"),   # stale update...
            (1, 20, "D", "xx"),   # ...overridden by a later delete
            (2, 11, "U", "b2"),   # plain update
            (4, 12, "I", "d"),    # insert of a new key
            (5, 13, "D", "yy"),   # delete of a key that never existed
            (4, 30, "U", "d2"),   # latest wins within the batch
        ],
        ["k", "seq", "op", "v"],
    )
    out = apply_changes(current, changes, "k", "seq", "op")
    got = {r.k: r.v for r in out.collect()}
    assert got == {2: "b2", 3: "c", 4: "d2"}


def test_snapshot_diff_classification(spark):
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark.operators import scd

    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    new = spark.createDataFrame(
        [(2, 20), (3, 99), (4, 40)], "k long, v long"
    )
    out = {
        r.k: (r.status, r.old_v, r.new_v)
        for r in scd.snapshot_diff(old, new, "k", ["v"]).collect()
    }
    assert out == {
        1: ("removed", 10, None),
        3: ("changed", 30, 99),
        4: ("added", None, 40),
    }  # unchanged key 2 dropped


def test_point_in_time_join_boundaries_and_uniqueness(spark):
    """Half-open interval semantics: a probe exactly at valid_from_us
    hits the NEW version, exactly at valid_to_us misses the old one;
    every fact row matches at most one dimension version."""
    from data_lake_for_citi_bike_trip_spark.operators import scd as S

    dim = spark.createDataFrame(
        [
            ("a", 10, 0, 1000),
            ("a", 20, 1000, S.OPEN_END_US),
            ("b", 5, 0, S.OPEN_END_US),
        ],
        "station_id string, capacity bigint, valid_from_us bigint,"
        " valid_to_us bigint",
    )
    facts = spark.createDataFrame(
        [("a", 999), ("a", 1000), ("a", 0), ("b", 5), ("missing", 1)],
        "station_id string, probe_us bigint",
    )
    j = S.point_in_time_join(facts, dim, "station_id", "probe_us", how="left")
    got = {
        (r.station_id, r.probe_us): r.capacity for r in j.collect()
    }
    assert got == {
        ("a", 999): 10,   # last instant of the old version
        ("a", 1000): 20,  # valid_from is inclusive on the new version
        ("a", 0): 10,
        ("b", 5): 5,
        ("missing", 1): None,
    }
    assert j.count() == facts.count()  # unique match, no fanout

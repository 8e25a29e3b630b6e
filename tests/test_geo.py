"""Grid-blocked spatial join: completeness vs brute force, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import geo
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table


def test_grid_join_equals_brute_force(spark, sf_dir):
    pts = geo.station_points(load_table(spark, sf_dir, "customer")).cache()
    r = 40_000
    blocked = {
        (x.pid1, x.pid2, x.dist2) for x in geo.neighbor_pairs(pts, r).collect()
    }
    a = pts.select(
        F.col("pid").alias("pid1"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    b = pts.select(
        F.col("pid").alias("pid2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    d2 = (F.col("x1") - F.col("x2")) * (F.col("x1") - F.col("x2")) + (
        F.col("y1") - F.col("y2")
    ) * (F.col("y1") - F.col("y2"))
    brute = {
        (x.pid1, x.pid2, x.dist2)
        for x in a.join(b, F.col("pid1") < F.col("pid2"))
        .select("pid1", "pid2", d2.alias("dist2"))
        .where(F.col("dist2") <= r * r)
        .collect()
    }
    assert blocked == brute and len(brute) > 0


def test_wider_cell_still_complete(spark, sf_dir):
    pts = geo.station_points(load_table(spark, sf_dir, "customer"))
    r = 40_000
    base = geo.neighbor_pairs(pts, r)
    wide = geo.neighbor_pairs(pts, r, cell=3 * r)
    assert base.count() == wide.count()


def test_cell_smaller_than_radius_rejected(spark, sf_dir):
    import pytest

    pts = geo.station_points(load_table(spark, sf_dir, "customer"))
    with pytest.raises(ValueError):
        geo.neighbor_pairs(pts, 1000, cell=999)


def test_grid_join_is_equi_join_not_nested_loop(spark, sf_dir):
    pts = geo.station_points(load_table(spark, sf_dir, "customer"))
    plan = geo.neighbor_pairs(pts, 40_000)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_grid_hotspots_smoothing_is_neighborhood_sum(spark, sf_dir):
    from collections import Counter

    from data_lake_for_citi_bike_trip_spark.operators import geo
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    customer = load_table(spark, sf_dir, "customer")
    cell = 50_000
    pts = geo.station_points(customer).collect()
    counts = Counter((p.x // cell, p.y // cell) for p in pts)
    got = geo.grid_hotspots(customer, cell=cell, k=10).collect()
    assert len(got) == 10
    for r in got:
        expect = sum(
            counts.get((r.cx + dx, r.cy + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        assert (r.n_points, r.density) == (counts[(r.cx, r.cy)], expect)
    # top-1 really is the max smoothed density over occupied cells
    best = max(
        sum(counts.get((cx + dx, cy + dy), 0) for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        for cx, cy in counts
    )
    assert got[0].density == best


def test_point_in_polygon_concave_and_edges(spark):
    """Hand-placed points against the L-shape: inside the vertical arm,
    inside the horizontal arm, inside the notch (outside the L), and
    far outside. The notch point is the concavity test a bounding-box
    check would get wrong."""
    from data_lake_for_citi_bike_trip_spark.operators import geo

    pts = spark.createDataFrame(
        [
            (1, 600_000, 200_000),   # horizontal arm of the L: inside
            (2, 600_000, 800_000),   # vertical arm: inside
            (3, 800_000, 800_000),   # the notch: OUTSIDE (concave)
            (4, 10_000, 10_000),     # far outside everything
            (5, 400_000, 400_000),   # centre of rect: inside rect only
        ],
        "pid bigint, x bigint, y bigint",
    )
    rows = geo.points_in_zones(pts).collect()
    got = {r.zone: (r.n_inside, r.pid_sum) for r in rows}
    assert got.get("lshape") == (2, 3)          # pids 1 and 2
    assert got.get("rect") == (1, 5)            # pid 5
    assert "tri" not in got or got["tri"][0] == 0

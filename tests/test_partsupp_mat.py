"""Materialized bucketed partsupp (the Q2/Q9/Q11/Q16/Q20 family).

Round-4 PLANS.md noted the partsupp stand-in was re-derived per query —
tpch_min_cost_supplier's plan carried TWO in-plan DISTINCT derivations
over lineitem (main block + correlated subquery). ``ensure_partsupp``
materializes the relation once per (application, sf_dir) as a parquet
table bucketed on ps_partkey; these tests pin the deployment-shape
properties: derivation gone from query plans, bucketed scan joins
without an exchange on the partsupp side, and values identical to the
inline-CTE derivation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import sqlsurface
from data_lake_for_citi_bike_trip_spark.plans.explain import executed_plan
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table


def test_min_cost_supplier_plan_has_no_lineitem_derivation(spark, sf_dir):
    plan = executed_plan(sqlsurface.tpch_min_cost_supplier(spark, sf_dir))
    # the derivation scanned lineitem and DISTINCTed (l_partkey,
    # l_suppkey); the materialized form scans only the partsupp table
    assert "lineitem" not in plan, plan
    assert "partsupp_b" in plan, plan


def test_materialized_matches_inline_derivation(spark, sf_dir):
    tbl = sqlsurface.ensure_partsupp(spark, sf_dir)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    inline = spark.sql(sqlsurface.PARTSUPP_CTE + "SELECT * FROM partsupp")
    mat = spark.table(tbl)
    assert mat.columns == inline.columns
    assert mat.count() == inline.count()
    assert mat.exceptAll(inline).count() == 0
    assert inline.exceptAll(mat).count() == 0


def test_partsupp_bucketed_join_has_no_exchange_on_table_side(spark, sf_dir):
    tbl = sqlsurface.ensure_partsupp(spark, sf_dir)
    mat = spark.table(tbl)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # self-join on the bucket key: both sides read the same 8-bucket
        # layout, so the SMJ needs no hash exchange at all
        agg = (
            mat.groupBy("ps_partkey")
            .agg(F.count(F.lit(1)).alias("n_supp"))
            .join(mat, "ps_partkey")
        )
        plan = executed_plan(agg)
        assert agg.count() > 0
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ensure_partsupp_is_cached_per_application(spark, sf_dir):
    t1 = sqlsurface.ensure_partsupp(spark, sf_dir)
    t2 = sqlsurface.ensure_partsupp(spark, sf_dir)
    assert t1 == t2
    assert spark.catalog.tableExists(t1)

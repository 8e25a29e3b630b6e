"""Skew salting + bucketed co-located join behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import skew
from data_lake_for_citi_bike_trip_spark.plans.explain import executed_plan
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # manufacture skew: every row lands on one join key
    skewed = events.select(F.lit(1).alias("k"), "event_id", "value")
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, label string")

    salted = skew.salted_join(skewed, dim, on="k", salt_from="event_id", buckets=8)
    plain = skewed.join(dim, "k")
    assert salted.count() == plain.count()
    assert salted.where(F.col("label") != "hot").count() == 0
    # the join key actually includes the salt (scatter happened)
    assert "__salt" in executed_plan(skew.salted_join(skewed, dim, "k", "event_id", 8))


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # managed tables land in ./spark-warehouse (gitignored); dropped below
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    skew.write_bucketed(orders, "b_orders", "o_custkey", 8)
    skew.write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = skew.bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = executed_plan(joined)
        n = joined.count()
        assert n == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_key_skew_profile_orders_and_shares(spark):
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark.operators import skew

    df = spark.createDataFrame(
        [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10, "k string"
    )
    rows = skew.key_skew_profile(df, "k", top_k=2).collect()
    assert [(r.key_value, r.n_rows, r.share_e4) for r in rows] == [
        ("hot", 60, 6000),
        ("warm", 30, 3000),
    ]

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


def test_planted_skew_triggers_aqe_skew_join_split(session_clone):
    """Protects the 100x-scale claim: a deliberately skewed sort-merge
    join must come out of AQE with the hot partition SPLIT (the plan's
    SMJ node carries skew=true). Confs are scoped to a session clone so
    the lowered thresholds can't leak into other tests."""
    from pyspark.sql import functions as F

    sess = session_clone
    sess.conf.set("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    sess.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    )
    sess.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
    # force a sort-merge join — AQE skew splitting doesn't apply to BHJ
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sess.conf.set("spark.sql.shuffle.partitions", "8")

    # 300k rows of key 0 (with ~64B padding => ~20MB hot partition)
    # against 10k rows spread over 10k keys
    # pad must be non-constant (a literal would constant-fold out of the
    # plan) and incompressible (shuffle partition sizes are compressed
    # bytes; 300k identical values deflate below any threshold)
    big = sess.range(310_000).select(
        F.when(F.col("id") < 300_000, F.lit(0))
        .otherwise(F.col("id") % 10_000)
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    small = sess.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # NB: global agg, not groupBy(k) — splitting a skewed partition breaks
    # hash-partitioning, so AQE refuses the split when a downstream
    # operator requires distribution on the join key; and sum(length(pad))
    # keeps the padding column un-pruned so the hot partition's bytes are
    # actually skewed.
    joined = big.join(small, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("pad")).alias("pad_bytes")
    )
    row = joined.collect()[0]
    # 300k planted + id=300000 (300000 % 10000 == 0) from the long tail,
    # + 9_999 one-row tail keys; correctness unaffected by the split
    assert row.n == 310_000
    assert row.pad_bytes == 310_000 * 64  # sha2-256 hex = 64 chars
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "skew=true" in final_plan, final_plan


def test_minhash_band_join_planted_skew_gets_aqe_split(session_clone):
    """The documented dedup failure mode (dedup.py:17-22): a hot band
    bucket planted via a block of identical documents, which share
    every band key. HISTORY: pre-collapse, the correct outcome was an
    AQE skew split (skew=true on the band SMJ). Since the signature
    collapse the identical block reduces to ONE representative before
    banding, so the hot bucket never reaches the join at all — the
    stronger fix. This test now pins that posture: (a) the pair output
    contract is unchanged (every identical pair at est_jaccard 1.0),
    and (b) the quadratic intra emission runs through the SALTED pair
    join (the __s salt key is visible in the final plan) instead of a
    single-group-key join. Thresholds are still lowered on a session
    clone so a regression that reintroduces the hot bucket would show
    up as a skew split or a single fat partition."""
    from data_lake_for_citi_bike_trip_spark.operators import dedup

    sess = session_clone
    sess.conf.set("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    sess.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB"
    )
    sess.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sess.conf.set("spark.sql.shuffle.partitions", "8")

    hot_n, tail_n = 400, 200
    hot = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(hot_n)]
    tail = [
        (hot_n + i, f"tail document {i} with its own distinct words number {i * 7}")
        for i in range(tail_n)
    ]
    docs = sess.createDataFrame(hot + tail, "doc_id bigint, text string")

    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9)
    # every identical-doc pair survives at est_jaccard 1.0 (collect the
    # SAME DataFrame whose executed plan is inspected below)
    rows = pairs.collect()
    n_pairs = sum(1 for r in rows if r.est_jaccard >= 0.999)
    assert n_pairs >= hot_n * (hot_n - 1) // 2
    final_plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    # the salted intra join keys on (__g, __s) — match the salt key as a
    # real join attribute (`__s#<exprId>`), not a loose substring that
    # any attribute containing "__s" would satisfy
    import re

    assert re.search(r"__s#\d+", final_plan), final_plan[:4000]
    # and pin that the collapse truly removed the hot bucket: no join in
    # the final plan needed an AQE skew split (a regression that lets
    # the identical-document block reach the band join would show up
    # here as skew=true or as a single fat partition)
    assert "skew=true" not in final_plan, final_plan[:4000]


def test_salted_candidates_lazy_gate_no_jobs_and_identical(spark):
    """ADVICE r11: ``eager_gate=False`` must build the plan WITHOUT
    submitting any Spark job at construction (explain-only / plan-dump
    callers), and the resulting join must emit exactly the plain
    equi-join's pairs — whale key included."""
    sc = spark.sparkContext
    probe = spark.range(3000).selectExpr(
        "id AS pid", "CASE WHEN id % 10 < 7 THEN 0 ELSE id % 13 END AS bkt"
    )
    build = spark.range(900).selectExpr(
        "id AS bid", "CASE WHEN id % 10 < 7 THEN 0 ELSE id % 13 END AS bkt"
    )
    sc.setJobGroup("lazy_gate_construction", "plan construction only")
    try:
        lazy = skew.salted_candidates(
            probe, build, "bkt", "pid", eager_gate=False
        )
        lazy.explain()  # planning must also stay job-free
    finally:
        sc.setJobGroup("lazy_gate_after", "done")
    jobs = sc.statusTracker().getJobIdsForGroup("lazy_gate_construction")
    assert list(jobs) == [], (
        f"lazy gate submitted jobs at construction: {list(jobs)}"
    )
    plain = probe.join(build, "bkt")
    assert sorted(lazy.columns) == sorted(plain.columns)
    diff = lazy.exceptAll(plain).count() + plain.exceptAll(lazy).count()
    assert diff == 0, f"{diff} mismatched candidate pairs"


def test_auto_num_buckets_scales_with_size(spark, sf_dir):
    """num_buckets=None derives clamp(ceil(size/128MB), 8, 4096) from
    the optimizer's size estimate — floor at sf scale, proportional
    growth once the estimate crosses the target, capped."""
    from data_lake_for_citi_bike_trip_spark.operators.skew import (
        auto_num_buckets,
    )
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    small = load_table(spark, sf_dir, "nation")
    assert auto_num_buckets(small) == 8  # floor: kilobytes of data
    # force known sizes through the estimate by lowering the target
    orders = load_table(spark, sf_dir, "orders")
    est = int(
        orders._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert auto_num_buckets(orders, target_bytes=est // 20) in range(8, 33)
    assert auto_num_buckets(orders, target_bytes=1) == 4096  # cap


def test_write_cobucketed_shares_one_count_and_joins_shuffle_free(
    spark, sf_dir, tmp_path
):
    """write_cobucketed derives ONE count from the larger side and the
    resulting join plans with zero shuffle exchanges."""
    from data_lake_for_citi_bike_trip_spark.operators.skew import (
        bucketed_join,
        write_cobucketed,
    )
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")
    n = write_cobucketed(
        [(orders, "cob_orders"), (cust, "cob_cust")], "o_custkey"
    )
    # set AFTER the loads: load_table's configure_runtime re-pins the
    # broadcast threshold (same ordering note as the bloom-filter test)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert n >= 8
        joined = bucketed_join(spark, "cob_orders", "cob_cust", "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == orders.join(cust, "o_custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS cob_orders")
        spark.sql("DROP TABLE IF EXISTS cob_cust")


def test_bucketed_join_warns_on_mismatched_counts(spark, sf_dir):
    """ADVICE r14: since write_bucketed's default count became
    size-derived, two independently written tables can silently lose
    the exchange-free property. bucketed_join must warn on a bucket
    count mismatch (and stay silent on a co-bucketed pair)."""
    import warnings

    from data_lake_for_citi_bike_trip_spark.operators.skew import (
        bucketed_join,
        write_bucketed,
        write_cobucketed,
    )

    a = spark.range(100).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(100).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "mismatch_a", "k", num_buckets=4)
    write_bucketed(b, "mismatch_b", "k", num_buckets=8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = bucketed_join(spark, "mismatch_a", "mismatch_b", "k")
        assert out.count() == 100
    assert any(
        "bucket" in str(x.message) and "exchange" in str(x.message)
        for x in w
    ), [str(x.message) for x in w]

    # co-bucketed pair: no warning
    n = write_cobucketed(
        [(a, "match_a"), (b, "match_b")], "k", num_buckets=4
    )
    assert n == 4
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = bucketed_join(spark, "match_a", "match_b", "k")
        assert out.count() == 100
    assert not [x for x in w if "bucket counts differ" in str(x.message)]


def test_write_cobucketed_empty_tables_raises(spark):
    import pytest as _pytest

    from data_lake_for_citi_bike_trip_spark.operators.skew import (
        write_cobucketed,
    )

    with _pytest.raises(ValueError, match="non-empty"):
        write_cobucketed([], "k")

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


def test_bitmap_distinct_matches_exact_count_distinct(spark, sf_dir):
    import pyspark.sql.functions as F

    from data_lake_for_citi_bike_trip_spark.operators import profile
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    got = {
        r.grp: r.n_distinct
        for r in profile.bitmap_distinct(events).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_bitmap_words_merge_exactly_across_shards(spark, sf_dir):
    """bit_or is associative+commutative+idempotent: the word tables of
    two overlapping shards merged with bit_or must reproduce the full
    corpus distinct counts exactly (the rollup story)."""
    import pyspark.sql.functions as F

    from data_lake_for_citi_bike_trip_spark.operators import profile
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    # overlapping split: dup rows across both halves exercise idempotence
    a = events.where(F.col("event_id") % 3 != 0)
    b = events.where(F.col("event_id") % 2 == 0)

    def words(df):
        return df.select(
            F.col("event_type").alias("grp"),
            F.expr("user_id div 32").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"
            ).alias("mask"),
        ).groupBy("grp", "word").agg(F.bit_or("mask").alias("mask"))

    merged = (
        words(a)
        .unionByName(words(b))
        .groupBy("grp", "word")
        .agg(F.bit_or("mask").alias("mask"))
        .groupBy("grp")
        .agg(F.sum(F.bit_count("mask")).cast("long").alias("n_distinct"))
    )
    got = {r.grp: r.n_distinct for r in merged.collect()}
    full = events.where(
        (F.col("event_id") % 3 != 0) | (F.col("event_id") % 2 == 0)
    )
    exact = {
        r.event_type: r.n
        for r in full.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_corr_pairs_matches_float_corr_and_pins_range(spark, sf_dir):
    """The integer-moments correlation must agree with Spark's own
    float corr to ~1e-4 (one basis point) and stay in [-10000, 10000]."""
    import pyspark.sql.functions as F

    from data_lake_for_citi_bike_trip_spark.operators import profile
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = {r.pair: r.corr_bp for r in profile.corr_pairs(li).collect()}
    base = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("y"),
        F.weekofyear("l_shipdate").cast("long").alias("z"),
    )
    ref = base.agg(
        F.corr("x", "y").alias("xy"),
        F.corr("x", "z").alias("xz"),
        F.corr("y", "z").alias("yz"),
    ).first()
    for key, rv in (("qty_discount", ref.xy), ("qty_week", ref.xz), ("discount_week", ref.yz)):
        assert abs(got[key]) <= 10000
        assert abs(got[key] - 10000 * rv) <= 1.01, (key, got[key], rv)


def test_phrase_search_counts_consecutive_occurrences(spark):
    from data_lake_for_citi_bike_trip_spark.operators import search

    docs = spark.createDataFrame(
        [
            (1, "table value table value x"),
            (2, "table, value"),  # separator-only gap still adjacent
            (3, "table x value"),
            (4, "value table"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.n_hits for r in search.phrase_search(docs).collect()}
    assert got == {1: 2, 2: 1}


def test_countmin_never_underestimates_and_cells_bounded(spark, sf_dir):
    from data_lake_for_citi_bike_trip_spark.operators import profile
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    rows = profile.countmin_frequencies(events, depth=3, width=64).collect()
    assert rows and all(r.overestimate_ok for r in rows)
    assert all(r.cms_estimate >= r.exact_cnt for r in rows)
    # sketch state is bounded by construction: depth x width cells max
    # (the property that makes shard sketches mergeable by addition)
    n_users = events.select("user_id").distinct().count()
    assert len(rows) == min(20, n_users)

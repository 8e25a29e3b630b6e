"""Operator-internal cache registry (``caching.py``).

Operators cache intermediates their RETURNED lazy plans consume more
than once; the cache must outlive the call, so Spark's CacheManager
would hold it for the whole session. ``release_caches`` is the
caller-managed reclamation point — these tests pin registration,
release, and that results stay correct after release (recompute)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark import caching
from data_lake_for_citi_bike_trip_spark.operators import dedup


def test_operator_caches_register_and_release(spark):
    caching.release_caches()  # start clean
    docs = spark.createDataFrame(
        [(i, f"some words repeated here number {i % 3}") for i in range(30)],
        "doc_id bigint, text string",
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9)
    before = pairs.count()
    assert caching.registered_count() > 0
    released = caching.release_caches()
    assert released > 0
    assert caching.registered_count() == 0
    # correctness survives release: the plan recomputes from source
    assert pairs.count() == before


def test_release_caches_spares_caller_owned_caches(spark):
    mine = spark.range(10).select(F.col("id")).cache()
    try:
        mine.count()
        caching.release_caches()
        assert mine.storageLevel.useMemory  # still cached
    finally:
        mine.unpersist()


def test_ts_sniff_memo_clears_on_release(spark):
    """VERDICT r15 item 9: the streaming ts-type sniff memo must be
    invalidated at the same maintenance moment as every other plan/
    metadata memo — a regenerated events path with a different ts
    physical type would otherwise read a stale sniff for the process
    lifetime (timestamps 1000x off)."""
    from data_lake_for_citi_bike_trip_spark.streaming import pipeline

    pipeline._TS_SNIFF_MEMO["/fake/events.parquet"] = True
    caching.release_caches()
    assert pipeline._TS_SNIFF_MEMO == {}

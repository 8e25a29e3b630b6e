"""Skew and co-location machinery for big joins.

Two complements to AQE's runtime skew splitting:

- ``salted_join`` — static salting for *known* hot keys: the big side
  scatters each key across N sub-partitions (deterministic hash of a
  secondary column, never rand() — retries must route rows identically),
  the small side replicates N ways. Turns one straggler partition into N
  even ones at the cost of an N-times-larger build side.
- ``write_bucketed`` / co-located joins — pre-shuffle at write time:
  two tables bucketed by the same key and bucket count join WITHOUT a
  shuffle exchange (the scan is already hash-partitioned). This is the
  repeated-join amortization story: pay the shuffle once at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys scattered over
    ``buckets`` salt values derived from ``salt_from`` (a column that
    varies within a key, e.g. an event id)."""
    lg = large.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(buckets)).cast("int")
    )
    sm = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return lg.join(sm, [on, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, num_buckets: int = 16
) -> None:
    """Persist as a bucketed (+ sorted) table: join/groupBy on ``key``
    can then reuse the on-disk hash partitioning.

    Cross-process safety: the physical managed table (and hence its
    warehouse directory) is suffixed with this process's applicationId,
    so two processes sharing a warehouse never overwrite or delete each
    other's files — the round-9 bench crash mode. ``table_name`` is
    registered as a temp view over the physical table; views are plan
    aliases, so the underlying scan keeps its bucketing metadata and
    ``bucketed_join`` still plans exchange-free."""
    spark = df.sparkSession
    app_tag = "".join(
        c if c.isalnum() else "_" for c in spark.sparkContext.applicationId
    )
    phys = f"{table_name}__{app_tag}"
    import os
    import shutil
    from urllib.parse import urlparse

    # applicationIds are process-unique: a leftover directory under the
    # physical name can only be our own earlier write — safe to clear.
    spark.sql(f"DROP TABLE IF EXISTS {phys}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    leftover = os.path.join(wh, phys)
    if wh and os.path.isdir(leftover):
        shutil.rmtree(leftover)
    (
        df.write.format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(phys)
    )
    spark.table(phys).createOrReplaceTempView(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables — plans with zero shuffle exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on)


def key_skew_profile(df: DataFrame, key: str, top_k: int = 20) -> DataFrame:
    """Heavy-hitter diagnosis for a join/agg key: the ``top_k`` hottest
    key values with their row share in exact basis points — the number
    you look at BEFORE deciding whether a join needs salting or AQE skew
    handling.

    One grouped count (partial map-side), a 1-row total attach, and a
    distributed top-k (orderBy+limit plans as TakeOrderedAndProject — no
    single-partition global sort)."""
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("key_value").cast("string").alias("key_value"),
            "n_rows",
            F.expr("(10000 * n_rows) div n_total").alias("share_e4"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key_value"))
        .limit(top_k)
    )

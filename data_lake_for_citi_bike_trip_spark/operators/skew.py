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
    """Persist as a bucketed (+ sorted) managed table: join/groupBy on
    ``key`` can then reuse the on-disk hash partitioning."""
    (
        df.write.format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables — plans with zero shuffle exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on)

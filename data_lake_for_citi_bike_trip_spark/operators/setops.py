"""Set operations + manifest anti-join (SURVEY.md §2.1 I3/I4, §2.7).

The reference's only set op is a pandas positional append used to prepend
the 425-row covid complement (crawl_to_local.py:89-94); its incremental
uploader diffs file manifests with Python set subtraction
(operator_data_upload.py:123-129). Spark-native equivalents: schema-aware
``unionByName(allowMissingColumns=True)`` and a ``left_anti`` join (which
plans broadcast/hash, never a driver-side collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_backfill(data: DataFrame, complement: DataFrame) -> DataFrame:
    """UNION by column name; columns missing on either side become NULL
    (the complement file has fewer columns than the live feed)."""
    return data.unionByName(complement, allowMissingColumns=True)


def anti_join_manifest(
    candidates: DataFrame, existing: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Rows of ``candidates`` whose key has no match in ``existing`` —
    the incremental-upload set difference as a distributed anti-join."""
    return candidates.join(
        existing, candidates[left_key] == existing[right_key], "left_anti"
    )


def null_safe_gender_rollup(trips: DataFrame) -> DataFrame:
    """NULL-safe equi-join (``<=>`` / eqNullSafe): trips joined to a
    derived gender dim where the NULL gender is a REAL dim member
    ("unknown") — a plain ``=`` join would silently drop every
    NULL-gender trip (the reference's J1/J2 left joins sidestep this;
    a dim for an optional attribute cannot).

    eqNullSafe keys hash like normal keys (NULL is one more bucket), so
    this plans as an ordinary broadcast/hash equi-join — no fallback to
    a nested-loop join."""
    dim = trips.select("gender").distinct().select(
        F.col("gender").alias("g_key"),
        F.coalesce(
            F.concat(F.lit("g_"), F.col("gender")), F.lit("unknown")
        ).alias("gender_label"),
    )
    return (
        trips.join(F.broadcast(dim), F.col("gender").eqNullSafe(F.col("g_key")))
        .groupBy("gender_label")
        .agg(F.count(F.lit(1)).alias("n_trips"))
    )

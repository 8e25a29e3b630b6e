"""As-of and range joins — operators the reference approximates with its
hour-bucket trick (SURVEY.md §2.3 J2) and that Spark lacks natively.

Implemented as compositions of built-in operators (no UDFs):

- ``asof_join``: the classic "latest right row at or before each left
  row" — union both sides tagged, one window pass per key, filter. One
  shuffle on the key; no range explosion.
- ``range_join_bucketed``: interval containment join without the O(n*m)
  broadcast-nested-loop trap: bucketize both sides to an equi-join on
  bucket id, then post-filter exact bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join per ``on`` key: for each left row, attach the most
    recent right row with ``right_ts <= left_ts`` (direction='backward')
    or the earliest right row with ``right_ts >= left_ts``
    (direction='forward').

    Union-tag-window strategy: concatenate both inputs ordered by time
    (ascending for backward, descending for forward), carry the last-seen
    right payload with ``last(..., ignorenulls)`` over a single
    key-partitioned window, keep left rows. Equivalent to a merge-asof but
    expressed so Spark plans exactly one exchange + sort either way.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        return _asof_nearest(left, right, on, left_ts, right_ts, right_cols)
    lt = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    payload = [F.col(c).alias(f"__r_{c}") for c in right_cols]
    rt = (
        right.select(F.col(on), F.col(right_ts).alias("__ts"), *payload)
        .withColumn("__is_left", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # Right rows sort before left rows at identical timestamps so an exact
    # tie matches (<= / >= inclusive semantics). Only the time direction
    # flips between backward and forward.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.where(F.col("__is_left") == 1)
        .drop("__is_left", "__ts", *[f"__r_{c}" for c in right_cols])
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Nearest-neighbor as-of: per left row, the closer of the latest
    at-or-before and earliest at-or-after right rows (exact ties keep
    the backward match, pandas merge_asof semantics).

    Same union-tag frame as the directional passes, with BOTH carries
    evaluated over it: the two windows share one key partitioning, so
    Spark plans a single exchange and two in-partition sorts (asc then
    desc) — nearest costs one extra sort, not an extra shuffle. The
    right timestamp rides along as a carried payload so the closer-side
    choice is a per-row comparison of the two deltas.
    """
    carry = [*right_cols, "__rts"]
    lt = left.withColumn("__is_left", F.lit(1)).withColumn("__ts", F.col(left_ts))
    payload = [F.col(c).alias(f"__r_{c}") for c in right_cols] + [
        F.col(right_ts).alias("__r___rts")
    ]
    rt = right.select(F.col(on), F.col(right_ts).alias("__ts"), *payload).withColumn(
        "__is_left", F.lit(0)
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}") for c in carry],
        *[F.last(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}") for c in carry],
    )
    b_ts, f_ts = F.col("__b___rts"), F.col("__f___rts")
    pick_forward = b_ts.isNull() | (
        f_ts.isNotNull() & ((f_ts - F.col("__ts")) < (F.col("__ts") - b_ts))
    )
    chosen = [
        F.when(pick_forward, F.col(f"__f_{c}"))
        .otherwise(F.col(f"__b_{c}"))
        .alias(f"asof_{c}")
        for c in right_cols
    ]
    internals = (
        ["__is_left", "__ts"]
        + [f"__r_{c}" for c in carry]
        + [f"__b_{c}" for c in carry]
        + [f"__f_{c}" for c in carry]
    )
    return carried.where(F.col("__is_left") == 1).select("*", *chosen).drop(*internals)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join points to containing [lo, hi) intervals via bucketization.

    Each interval is exploded to the buckets it overlaps (cheap when
    interval width ~ bucket_width); the join is then a plain equi-join on
    bucket id — shuffle-hash/broadcast eligible — with an exact range
    post-filter. Avoids BroadcastNestedLoopJoin, which dies at scale.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return p.join(iv, "__bucket").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    ).drop("__bucket")

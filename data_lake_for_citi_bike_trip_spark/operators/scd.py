"""Slowly-changing-dimension (SCD2) merge, Delta-free.

The reference refreshes its station dim by full overwrite
(spark_elt_emr.py:185) — losing history. SCD2 keeps one row per
(key, validity interval). Without MERGE INTO (needs Delta), the update
is emulated as pure set algebra, which also makes it deterministic and
oracle-checkable:

  unchanged  = current rows whose key is absent from the batch
  closed     = current OPEN rows whose tracked values changed -> valid_to set
  reopened   = current OPEN rows re-asserted identically -> kept as-is
  inserted   = new versions (changed keys + brand-new keys) opened at batch_ts

One shuffle on the key; the batch side is typically broadcast. At 100 TB
the current table should be partitioned/bucketed by key so the join
co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Sentinel for "still valid" (max parquet-friendly timestamp-ish epoch).
OPEN_END_US = 253_402_300_799_000_000  # 9999-12-31T23:59:59.999999 in µs


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    batch_ts_us: int,
) -> DataFrame:
    """Apply an update batch to an SCD2 table.

    ``current`` schema: key, tracked..., valid_from_us, valid_to_us
    (valid_to_us == OPEN_END_US for open rows).
    ``updates`` schema: key, tracked... (one row per key).
    """
    cur, upd = current.alias("c"), updates.alias("u")
    diff = None
    for t in tracked:
        ineq = ~F.col(f"c.{t}").eqNullSafe(F.col(f"u.{t}"))
        diff = ineq if diff is None else (diff | ineq)

    joined = cur.join(upd, F.col(f"c.{key}") == F.col(f"u.{key}"), "left")
    is_open = F.col("c.valid_to_us") == OPEN_END_US
    has_update = F.col(f"u.{key}").isNotNull()

    # rows kept from the current table (possibly closed)
    kept = joined.select(
        F.col(f"c.{key}").alias(key),
        *[F.col(f"c.{t}").alias(t) for t in tracked],
        F.col("c.valid_from_us").alias("valid_from_us"),
        F.when(is_open & has_update & diff, F.lit(batch_ts_us))
        .otherwise(F.col("c.valid_to_us"))
        .alias("valid_to_us"),
    )
    # new versions: updated keys whose open row changed, or brand-new keys
    open_cur = cur.where(F.col("c.valid_to_us") == OPEN_END_US)
    with_open = upd.join(open_cur, F.col(f"u.{key}") == F.col(f"c.{key}"), "left")
    new_versions = with_open.where(
        F.col(f"c.{key}").isNull() | diff
    ).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{t}").alias(t) for t in tracked],
        F.lit(batch_ts_us).alias("valid_from_us"),
        F.lit(OPEN_END_US).alias("valid_to_us"),
    )
    return kept.unionByName(new_versions)


def apply_changes(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """Generic CDC merge — the MERGE INTO / APPLY CHANGES semantics of a
    lakehouse format, Delta-free:

    - ``changes`` carries (key, seq, op, payload...) with op in
      {'I','U','D'}; the row with the highest ``seq`` per key wins.
    - latest op 'D'  -> key removed (whether or not it exists today)
    - latest op I/U  -> payload upserted (insert-or-replace)
    - keys untouched by the batch pass through unchanged.

    Plan: one window (row_number over key, seq DESC) to collapse the
    batch, then a single full-outer join against current — both keyed on
    ``key`` so the shuffle partitioning is shared; a small batch side is
    broadcast by AQE. Payload columns are every non-(seq, op) column of
    ``changes`` and must match ``current``'s schema.
    """
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", seq_col)
    )
    payload = [c for c in latest.columns if c not in (key, op_col)]
    cur, chg = current.alias("c"), latest.alias("g")
    joined = cur.join(chg, F.col(f"c.{key}") == F.col(f"g.{key}"), "full")
    has_change = F.col(f"g.{key}").isNotNull()
    deleted = has_change & (F.col(f"g.{op_col}") == "D")
    return joined.where(~deleted).select(
        F.coalesce(F.col(f"g.{key}"), F.col(f"c.{key}")).alias(key),
        *[
            F.when(has_change, F.col(f"g.{p}")).otherwise(F.col(f"c.{p}")).alias(p)
            for p in payload
        ],
    )


def scd1_upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Type-1 merge: latest wins, no history — batch rows replace current
    rows by key, new keys append. One shuffle on the key (the batch side
    is broadcast when small); the SCD2 companion above keeps history."""
    return current.join(updates.select(key), on=key, how="left_anti").unionByName(
        updates
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """Snapshot reconciliation — the table-format "diff two versions"
    primitive, computed from data: one full-outer join on the key, then
    per-row classification into added / removed / changed (unchanged rows
    are dropped; they're the bulk and carry no information).

    One key-partitioned shuffle on each side; the payload comparison is
    null-safe equality over ``cols`` (no hashing, so no collision
    caveats, and the changed row carries both versions for audit)."""
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full")
    same = None
    for c in cols:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col(f"o.{key}").isNull(), "added")
        .when(F.col(f"n.{key}").isNull(), "removed")
        .when(~same, "changed")
    )
    out_cols = [F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
                status.alias("status")]
    for c in cols:
        out_cols.append(F.col(f"o.{c}").alias(f"old_{c}"))
        out_cols.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return joined.where(status.isNotNull()).select(*out_cols)


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    probe_us_col: str,
    how: str = "left",
) -> DataFrame:
    """POINT-IN-TIME join (the AS OF read against an SCD2 dimension):
    each fact row joins the dimension version whose validity interval
    covers the fact's probe instant — ``valid_from_us <= probe <
    valid_to_us``. Versions of one key never overlap (scd2_apply
    guarantees half-open, adjacent intervals), so the match is unique
    by construction and the join cannot fan out.

    Scale shape: the EQUI key is the join key, so this plans as a plain
    hash/sort-merge join with the interval bounds as residual filters —
    one shuffle on the key, co-partitioned with any downstream per-key
    work. The dimension side carries a handful of versions per key
    (SCD2 history), never the fact cardinality."""
    d = dim.select(
        F.col(key).alias("__pit_key"),
        *[
            F.col(c)
            for c in dim.columns
            if c not in (key, "valid_from_us", "valid_to_us")
        ],
        "valid_from_us",
        "valid_to_us",
    )
    joined = facts.join(
        d,
        (facts[key] == d["__pit_key"])
        & (facts[probe_us_col] >= d["valid_from_us"])
        & (facts[probe_us_col] < d["valid_to_us"]),
        how,
    )
    return joined.drop("__pit_key")

"""Data-governance operators: right-to-be-forgotten erasure with a
verifiable audit trail.

An erasure request at lake scale is not a row delete — it must cascade
through every DERIVED dataset (aggregates, sessions, profiles) that
embeds the subject's contribution, and produce evidence that it did.
These operators express the cascade as plain filters + recomputation
(the lakehouse form: re-materialize affected partitions from the
filtered base; with the TxnTable sink that is a bucket-COW merge), and
the audit as one pass per derived table.

Scale: the subject predicate is a pure partition-prunable filter; each
derived table recomputes only from the filtered base (same plans as its
original build). The audit emits O(#tables) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def erase_users(df: DataFrame, key: str = "user_id", mod: int = 97) -> DataFrame:
    """The erasure predicate: drop every row of subjects key % mod == 0
    (the deterministic stand-in for an erasure-request list; in
    production the list arrives as a table and this is an anti-join)."""
    return df.where(F.col(key) % mod != 0)


def gdpr_erase_audit(events: DataFrame, mod: int = 97) -> DataFrame:
    """Cascade the erasure through three representative derived shapes
    and emit per-dataset evidence: rows before, rows after, and rows
    attributable to erased subjects that are now gone.

    - ``events``        — the raw fact (row-level delete)
    - ``user_profiles`` — per-user aggregate (whole groups vanish)
    - ``daily_counts``  — day×type aggregate (rows survive, VALUES
                          shrink; removed = rows whose count changed)
    """
    erased = erase_users(events, mod=mod)

    def count_pair(name, before: DataFrame, after: DataFrame, changed=None):
        b = before.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("dataset"),
            F.col("n").alias("rows_before"),
        )
        a = after.agg(F.count(F.lit(1)).alias("n")).select(
            F.col("n").alias("rows_after")
        )
        out = b.crossJoin(a)  # 1x1 stat rows
        if changed is not None:
            out = out.crossJoin(
                changed.agg(F.count(F.lit(1)).alias("rows_changed"))
            )
        else:
            out = out.withColumn(
                "rows_changed", F.col("rows_before") - F.col("rows_after")
            )
        return out

    profiles_b = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    profiles_a = erased.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))

    def daily(df):
        return df.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))

    daily_b, daily_a = daily(events), daily(erased)
    daily_changed = (
        daily_b.withColumnRenamed("n", "nb")
        .join(daily_a.withColumnRenamed("n", "na"), ["day", "event_type"], "left")
        .where(F.col("na").isNull() | (F.col("na") != F.col("nb")))
    )
    return (
        count_pair("events", events, erased)
        .unionByName(count_pair("user_profiles", profiles_b, profiles_a))
        .unionByName(count_pair("daily_counts", daily_b, daily_a, daily_changed))
    )


def k_anonymity(customer: DataFrame, k: int = 5) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    segment, $1000-balance-band): how identifiable is each equivalence
    class — the release-readiness screen run before sharing
    "anonymized" extracts (a class of size 1 is a direct
    re-identification; < k is policy-failing).

    Emits one row per class size bucket: how many classes and how many
    PEOPLE sit at that exposure level, plus the failing-class flag.
    Two keyed aggregates (class grouping, then size histogram) — the
    whole audit is two map-side-combinable shuffles at any scale.
    Balance bands use floor division on cents shifted non-negative, so
    both engines band identically."""
    cls = customer.groupBy(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 100000"
        ).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return cls.groupBy("class_size").agg(
        F.count(F.lit(1)).alias("n_classes"),
        (F.count(F.lit(1)) * F.col("class_size"))
        .cast("long")
        .alias("n_people"),
    ).select(
        "class_size",
        "n_classes",
        "n_people",
        (F.col("class_size") < k).alias("fails_k"),
    )


COGROUP_RECONCILE_SCHEMA = (
    "k bigint, n_events bigint, event_cents bigint, "
    "n_orders bigint, order_cents bigint, in_both boolean"
)


def cogroup_reconcile(
    events: DataFrame, orders: DataFrame, shards: int = 256
) -> DataFrame:
    """Two-source reconciliation through COGROUPED pandas — the API
    tier for per-key logic that needs BOTH sides' rows at once (here a
    telemetry-vs-billing audit keyed on user): Spark co-partitions the
    two inputs and hands each group's pair of frames to one
    Arrow-batched callable.

    Scale design: the cogroup key is a SHARD (key % shards), not the
    raw user key — cogrouping at user grain would pay one Python call
    per user (measured 26 s for 15k users at sf0.1); at shard grain the
    call count is fixed at ``shards`` and the per-shard work is one
    vectorized pandas outer merge. Each side is also pre-aggregated
    JVM-side to one row per key first, so the Arrow transfer carries
    key-grain summaries, never raw events. Keys present on either side
    appear (outer-merge semantics — silent one-sided keys can't hide);
    the oracle reproduces it as a full outer join of two aggregates.
    """
    import pandas as pd

    e = (
        events.groupBy(F.col("user_id").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "event_cents"
            ),
        )
        .withColumn("shard", F.col("k") % shards)
    )
    o = (
        orders.groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "order_cents"
            ),
        )
        .withColumn("shard", F.col("k") % shards)
    )

    def merge(key, epdf: "pd.DataFrame", opdf: "pd.DataFrame") -> "pd.DataFrame":
        m = epdf.drop(columns=["shard"]).merge(
            opdf.drop(columns=["shard"]), on="k", how="outer", indicator=True
        )
        m["in_both"] = m["_merge"] == "both"
        for c in ("n_events", "event_cents", "n_orders", "order_cents"):
            m[c] = m[c].fillna(0).astype("int64")
        return m[
            ["k", "n_events", "event_cents", "n_orders", "order_cents", "in_both"]
        ]

    return (
        e.groupBy("shard")
        .cogroup(o.groupBy("shard"))
        .applyInPandas(merge, schema=COGROUP_RECONCILE_SCHEMA)
    )


def l_diversity(customer: DataFrame, l_min: int = 2) -> DataFrame:
    """l-diversity audit — k_anonymity's necessary second check: a
    class can be large (k-safe) yet still leak if every member shares
    the SAME sensitive value (homogeneity attack). Quasi-identifiers
    here are (nation, $100-balance-band) — finer than k_anonymity's
    $1000 band so class sizes (and therefore l) stay distributionally
    interesting at every scale; the sensitive attribute is market
    segment; l = distinct sensitive values per class.

    Emits one row per (class_size-band, l): how many classes and
    people sit at that exposure, plus the failing flag (l < l_min).
    Two keyed aggregates + one bounded histogram rollup — same
    two-shuffle shape as k_anonymity at any scale. Balance bands use
    the shifted non-negative floor division so both engines band
    identically."""
    cls = customer.groupBy(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 10000"
        ).alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct("c_mktsegment").alias("l_div"),
    )
    return cls.groupBy("l_div").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_people"),
        F.min("class_size").cast("long").alias("min_class_size"),
    ).select(
        "l_div",
        "n_classes",
        "n_people",
        "min_class_size",
        (F.col("l_div") < l_min).alias("fails_l"),
    )

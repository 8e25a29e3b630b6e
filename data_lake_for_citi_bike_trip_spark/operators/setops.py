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


def replica_diff_buckets(orders: DataFrame, n_buckets: int = 256) -> DataFrame:
    """Merkle-style anti-entropy comparison of two table replicas: find
    WHICH key-buckets diverge without moving either table's rows.

    Each replica folds to one row per bucket — (count, xor of per-row
    content digests). XOR is associative/commutative/self-inverse, so
    the fold is order-independent, map-side combinable, and any single
    changed/missing/extra row flips its bucket's fold. Replicas then
    compare ``n_buckets`` rows instead of N — at 100 TB the network
    cost of the comparison is the digest table, and only divergent
    buckets need a row-level re-sync (the Cassandra/Dynamo repair
    pattern on relational rails).

    The "remote" replica here is synthesized deterministically (keys
    % 997 == 0 dropped, values at keys % 1009 == 0 perturbed one cent)
    so the expected divergence set is oracle-checkable. Digest = first
    60 bits of md5 over the canonical '|'-joined row repr (dates
    formatted explicitly — engine-neutral), bucket = key % n_buckets.
    """

    def digests(df: DataFrame) -> DataFrame:
        canon = F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice") * 100).cast("long"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )
        return df.select(
            (F.col("o_orderkey") % n_buckets).alias("bucket"),
            F.conv(F.substring(F.md5(canon), 1, 15), 16, 10)
            .cast("long")
            .alias("digest"),
        )

    def fold(df: DataFrame, tag: str) -> DataFrame:
        return digests(df).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.expr("bit_xor(digest)").alias(f"xor_{tag}"),
        )

    replica = orders.where(F.col("o_orderkey") % 997 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 1009 == 0, F.col("o_totalprice") + 0.01
        ).otherwise(F.col("o_totalprice")),
    )
    a, b = fold(orders, "a"), fold(replica, "b")
    joined = a.join(b, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("xor_a", F.lit(0)).alias("xor_a"),
        F.coalesce("xor_b", F.lit(0)).alias("xor_b"),
    )
    return joined.where(
        (F.col("n_a") != F.col("n_b")) | (F.col("xor_a") != F.col("xor_b"))
    )


def order_total_reconciliation(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Header-vs-detail reconciliation: how far does each order's
    header total sit from the sum of its line extended prices —
    THE cross-table DQ audit (a warehouse where headers and details
    drift is lying to someone). Orders bucket into relative-gap bands
    by exact cross-multiplication: exact (0 bp), <= 100 bp, <= 1000
    bp, worse, and headers with NO lines at all (left join keeps
    them; orphan details are referential_orphans' job).

    One orderkey aggregate + one keyed left join + a 5-row band
    rollup; everything BIGINT cents.
    """
    line_sum = lineitem.groupBy(
        F.col("l_orderkey").alias("o_orderkey")
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("line_cents")
    )
    j = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("hdr"),
    ).join(line_sum, "o_orderkey", "left")
    gap = F.abs(F.col("hdr") - F.col("line_cents"))
    band = (
        F.when(F.col("line_cents").isNull(), "no_lines")
        .when(gap == 0, "exact")
        .when(10000 * gap <= 100 * F.col("hdr"), "within_1pct")
        .when(10000 * gap <= 1000 * F.col("hdr"), "within_10pct")
        .otherwise("divergent")
    )
    return j.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max(gap).cast("long").alias("max_gap_cents"),
    )


def linenumber_integrity(lineitem: DataFrame) -> DataFrame:
    """Line-number integrity audit: per order, the linenumbers must
    be exactly 1..n with no gaps or duplicates (the detail-table
    invariant ETL re-loads silently break). Violations classify by
    which check failed: duplicate numbers (distinct < count), wrong
    span (min != 1 or max != count). Emits the 1-3 row class summary
    — a clean warehouse reads one 'ok' row covering every order.

    One orderkey aggregate, pure codegen checks, bounded rollup.
    """
    per = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("l_linenumber").alias("nd"),
        F.min("l_linenumber").cast("long").alias("mn"),
        F.max("l_linenumber").cast("long").alias("mx"),
    )
    cls = (
        F.when(F.col("nd") < F.col("n"), "duplicate_linenumbers")
        .when(
            (F.col("mn") != 1) | (F.col("mx") != F.col("n")),
            "broken_span",
        )
        .otherwise("ok")
    )
    return per.groupBy(cls.alias("check")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("n").cast("long").alias("n_lines"),
    )


def chars_integrity(docs: DataFrame) -> DataFrame:
    """Declared-vs-measured length audit on the documents table: the
    n_chars column against length(text), banded by relative gap —
    the metadata-drift check (a pipeline that re-encodes or truncates
    text without updating its metadata shows up here first; trusting
    a stale n_chars poisons every length-based filter downstream).
    Same band construction as order_total_reconciliation, document
    grain: exact / within 1% / within 10% / divergent.
    """
    j = docs.select(
        F.col("n_chars").cast("long").alias("decl"),
        F.length("text").cast("long").alias("meas"),
    )
    gap = F.abs(F.col("decl") - F.col("meas"))
    band = (
        F.when(gap == 0, "exact")
        .when(100 * gap <= F.col("meas"), "within_1pct")
        .when(10 * gap <= F.col("meas"), "within_10pct")
        .otherwise("divergent")
    )
    return j.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max(gap).cast("long").alias("max_gap_chars"),
    )

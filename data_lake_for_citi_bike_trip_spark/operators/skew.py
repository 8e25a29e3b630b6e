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


def salted_candidates(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_id: str,
    salt: int = 16,
    whale_min: int = 256,
) -> DataFrame:
    """Inner equi-join on ``key`` whose pair EMISSION stays parallel
    when one key value is hot — the candidate-generation primitive for
    bucketed similarity joins (LSH sign buckets, Levenshtein blocks).

    The failure mode this fixes (measured, not hypothetical): a
    NEAR-identical whale — 30% of a corpus within epsilon of one
    vector — defeats the exact-duplicate collapse (every array
    distinct) and lands m rows on ONE bucket key. A plain equi-join
    then emits that bucket's m² candidate pairs inside a single task:
    AQE's skew split keys on INPUT partition bytes, and m rows of
    id+vector are kilobytes even when the pair output is quadratic
    (the same blind spot ``_salted_intra_pairs`` fixes for intra-group
    emission, one level up at the candidate join). 21k vectors with a
    7k whale took 229 s through the unsalted join and seconds salted.

    Mechanics: per-key build counts attach to both sides (the counts
    relation has one row per distinct key — bucket-enum-sized for sign
    buckets, AQE broadcasts it); the probe row takes ONE deterministic
    salt in [0, factor) hashed from ``probe_id``; the build row
    replicates once per salt value; the join keys on (key, salt).
    Every (probe, build) combination meets at exactly one salt — the
    probe's — so output equals the unsalted join exactly (order
    aside). WHALE-GATED like ``_salted_intra_pairs``: keys under
    ``whale_min`` build rows take factor 1 (explode emits one replica,
    no replication cost), so a corpus with no hot bucket pays only the
    count-attach; hot keys scatter across ``salt`` tasks.

    Contract: ``probe`` and ``build`` must not share non-``key``
    column names; rows whose key is absent from the other side drop
    (inner-join semantics, same as the join this replaces).
    """
    counts = build.groupBy(key).agg(F.count(F.lit(1)).alias("__bn"))
    factor = F.when(
        F.col("__bn") >= whale_min, F.lit(salt)
    ).otherwise(F.lit(1))
    p = (
        probe.join(counts, key)
        .withColumn("__s", F.pmod(F.xxhash64(F.col(probe_id)), factor))
        .drop("__bn")
    )
    b = (
        build.join(counts, key)
        .withColumn(
            "__s", F.explode(F.sequence(F.lit(0), factor - F.lit(1)))
        )
        .drop("__bn")
    )
    # Round-robin repartition of the probe side, measured against the
    # alternatives on the 7k-whale corpus (23.8M pairs):
    # - nothing: AQE's partition coalescer keys on INPUT bytes — the
    #   same blind spot as its skew split — and merges the probe's tiny
    #   inherited exchange before the join, so the broadcast-hash join
    #   emits the whale's quadratic output nearly single-task (117 s).
    # - repartition BY (key, salt): coalesce-exempt, but concentrates
    #   the whale onto its ~`salt` hash slots — the pair-scoring stage
    #   runs ~16-of-32-way (104 s).
    # - round-robin REPARTITION_BY_NUM (this): coalesce-exempt by
    #   contract AND even, so under the broadcast-hash join the small
    #   scale actually plans, emission parallelism is every core
    #   (27 s). At build sides too big to broadcast the join inserts
    #   its own (key, salt) exchange on top — one extra linear probe
    #   pass, and the salt still caps any key's share of the emission
    #   at 1/`salt` — while the large inputs keep the coalescer from
    #   re-merging the salted partitions.
    try:
        nparts = int(
            probe.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):  # "auto" under some AQE setups
        nparts = probe.sparkSession.sparkContext.defaultParallelism
    p = p.repartition(nparts)
    return p.join(b, [key, "__s"]).drop("__s")


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

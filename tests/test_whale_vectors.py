"""NEAR-identical VECTOR whale semantics (SOAK_r10.md §4, test-scale pin).

The vector analogue of test_whale_neardup.py: a whale of near-identical
embeddings (every float array distinct, pairwise cosine >= 0.999)
defeats `_exact_vector_members` / the kNN scorer's collapse while
landing every member on ONE sign bucket. The unsalted bucket equi-join
emitted that bucket's C(m,2) pairs inside a single task (AQE's skew
split keys on input bytes; a whale bucket's input is kilobytes even
when its pair output is quadratic — measured 229 s at 21k vectors).
These tests pin, at test scale:

- `skew.salted_candidates` output-identity against the plain equi-join
  it replaces, on BOTH sides of the whale gate (factor 1 below 256
  build rows per key, salted above);
- `embedding_dup_pairs` emits exactly the whale's C(m,2) pairs through
  the salted join (no pair lost, none doubled, tail never pairs);
- `blocked_mutual_knn` stays k-bounded and CartesianProduct-free on
  the same corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import dedup, similarity
from data_lake_for_citi_bike_trip_spark.operators.skew import (
    salted_candidates,
)

WHALE_N, TAIL_N = 300, 200  # 300 > whale_min=256: the salt gate opens
DIM = 16


def _corpus(spark):
    rng = np.random.default_rng(7)
    base = np.zeros(DIM)
    base[:8] = 0.5
    base[8:] = 0.1 + 0.8 * rng.random(DIM - 8)
    rows = []
    for i in range(WHALE_N):
        v = base.copy()
        # one perturbed coord per member: arrays pairwise distinct,
        # pairwise cosine ~= 1 - O(1e-6) >= 0.999
        v[8 + (i % (DIM - 8))] += 1e-3 + 1e-9 * i
        rows.append((i, [float(x) for x in v], 1))
    for j in range(TAIL_N):
        t = rng.uniform(-1.0, 1.0, DIM)
        for b in range(8):
            s = 1.0 if (j >> b) & 1 else -1.0
            t[b] = s * (0.25 + abs(t[b]) / 2)
        rows.append((WHALE_N + j, [float(x) for x in t], 0))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_salted_candidates_identity_across_the_whale_gate(spark):
    # keys: "hot" has 300 build rows (>= whale_min -> factor 16),
    # "cold" has 5 (factor 1). Identity must hold for both.
    rows = [(i, "hot" if i < 300 else "cold") for i in range(305)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    probe = df.select(F.col("id").alias("pid"), F.col("k"))
    build = df.select(F.col("id").alias("bid"), F.col("k"))
    salted = salted_candidates(probe, build, "k", "pid")
    plain = probe.join(build, "k")
    assert salted.count() == 300 * 300 + 5 * 5
    assert (
        salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
        == 0
    )


def test_salted_candidates_no_whale_gate_returns_plain_join(spark):
    # no key reaches whale_min=256 build rows -> the metadata-scale
    # scalar gate closes and the PLAIN equi-join comes back: identical
    # output, and the plan carries none of the salt machinery (no
    # count-attach, no xxhash64 salt, no round-robin repartition) —
    # the no-whale common case must not pay an extra probe pass
    # (VERDICT r10 item 3).
    rows = [(i, f"k{i % 7}") for i in range(210)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    probe = df.select(F.col("id").alias("pid"), F.col("k"))
    build = df.select(F.col("id").alias("bid"), F.col("k"))
    salted = salted_candidates(probe, build, "k", "pid")
    plain = probe.join(build, "k")
    assert (
        salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
        == 0
    )
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" not in plan and "__s" not in plan
    assert "__pairs" not in plan


def test_salted_candidates_composite_probe_id(spark):
    # probe_id as a COLUMN LIST (the range_price_match shape: the
    # points side is row-unique only on a composite key). Whale key
    # present (600x600 pairs > whale_min**2) so the salted path
    # actually runs with the composite hash.
    rows = [(i // 10, i % 10, "hot" if i < 600 else f"c{i % 13}")
            for i in range(700)]
    df = spark.createDataFrame(rows, "maj bigint, min bigint, k string")
    probe = df.select("maj", "min", "k")
    build = df.select(F.col("maj").alias("bmaj"), F.col("min").alias("bmin"), "k")
    salted = salted_candidates(probe, build, "k", ["maj", "min"])
    plain = probe.join(build, "k")
    assert (
        salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
        == 0
    )


def test_range_join_bucketed_salted_hot_range_identity(spark):
    # a hot value range: most points and 40 overlapping intervals
    # share one bucket (2000 x 40 = 80k bucket pairs > whale_min**2,
    # so the salt gate OPENS on the pair product even though the build
    # count alone, 40, never would) — the expected "popular price
    # band" shape from VERDICT r10 item 1. The salted route must emit
    # exactly the plain route's rows.
    from data_lake_for_citi_bike_trip_spark.operators import asof

    pts = [(i, 0, 50.0 + (i % 97) * 0.1) for i in range(2000)]  # hot band
    pts += [(i, 1, 1000.0 + i) for i in range(2000, 2300)]      # flat tail
    points = spark.createDataFrame(pts, "okey bigint, lnum bigint, v double")
    ivs = [(j, 49.0 + j * 0.2, 52.0 + j * 0.2) for j in range(40)]
    ivs += [(100 + j, 1000.0 + 3 * j, 1003.0 + 3 * j) for j in range(100)]
    intervals = spark.createDataFrame(ivs, "iv_id bigint, lo double, hi double")
    salted = asof.range_join_bucketed(
        points, intervals, "v", "lo", "hi", 10.0,
        point_id=["okey", "lnum"],
    )
    plain = asof.range_join_bucketed(points, intervals, "v", "lo", "hi", 10.0)
    assert salted.count() > 0
    assert (
        salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
        == 0
    )


def test_salted_candidates_wide_path_identity(spark):
    # broadcast_bytes=0 forces the WIDE-SALT shape (explicit (key,salt)
    # repartition + shuffle-hash) — must emit exactly the broadcast
    # shape's rows, which in turn equal the plain join's.
    rows = [(i, "hot" if i < 300 else "cold") for i in range(305)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    probe = df.select(F.col("id").alias("pid"), F.col("k"))
    build = df.select(F.col("id").alias("bid"), F.col("k"))
    wide = salted_candidates(probe, build, "k", "pid", broadcast_bytes=0)
    plain = probe.join(build, "k")
    assert wide.count() == 300 * 300 + 5 * 5
    assert (
        wide.exceptAll(plain).count() + plain.exceptAll(wide).count() == 0
    )


def test_embedding_dup_pairs_near_dup_vector_whale(spark):
    emb = _corpus(spark)
    out = dedup.embedding_dup_pairs(emb, threshold=0.999).collect()
    # exactly the whale's C(m,2) pairs: salted join loses none,
    # doubles none, and the random tail clears no 0.999 cosine
    assert len(out) == WHALE_N * (WHALE_N - 1) // 2, len(out)
    assert all(r.d1 < WHALE_N and r.d2 < WHALE_N for r in out)
    assert all(r.d1 < r.d2 for r in out)
    assert len({(r.d1, r.d2) for r in out}) == len(out)
    assert all(r.cos_sim >= 0.999 for r in out)


def test_blocked_mutual_knn_vector_whale_k_bounded(spark):
    emb = _corpus(spark)
    pairs = similarity.blocked_mutual_knn(emb, k=5, bucket_bits=4)
    rows = pairs.collect()
    # mutual top-5 within sign blocks: bounded by n*k/2 canonical pairs
    assert 0 < len(rows) <= (WHALE_N + TAIL_N) * 5 // 2 + 1
    assert all(r.v1 < r.v2 for r in rows)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

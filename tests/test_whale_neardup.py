"""NEAR-identical whale semantics (SOAK_r10.md §1, small-scale pin).

A near-dup cluster built from shared boilerplate plus one unique noise
token per doc defeats every exact/signature collapse (all texts and
most signatures distinct) while still sharing band keys / shingles —
the adversarial corpus for the banded/posting joins. These tests pin
the three operators' contracts on that corpus at test scale:

- minhash emits (essentially all of) the whale's C(m,2) pairs through
  the banded join — never an all-pairs product;
- ngram_jaccard's default df-cap drops the boilerplate stop-shingles
  (they carry no dedup signal and are the quadratic hot bucket), so
  whale pairs score 0 under CAPPED Jaccard — the documented recall
  trade — while the uncapped mode recovers every pair;
- jaccard_prefix_join (the lossless exact path) emits EXACTLY the
  whale's C(m,2) pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import dedup

BOILER = (
    "the shipment manifest lists every container identifier together with "
    "its declared weight and the customs tariff code assigned at the port "
    "of origin while the receiving agent confirms the seal number and "
    "records the arrival timestamp in the terminal ledger for audit"
).split()  # 45 tokens -> 43 trigram shingles

WHALE_N, TAIL_N = 300, 200


def _letters(n: int) -> str:
    # letters-only unique encoding: jaccard_prefix_join tokenizes on
    # [^a-z]+, which ERASES digits — a digit-bearing noise token would
    # silently turn the near-dup whale into exact-duplicate groups and
    # the test would exercise the collapse instead of the hot bucket
    s = ""
    n += 1
    while n:
        n, r = divmod(n - 1, 26)
        s = chr(ord("a") + r) + s
    return s


def _corpus(spark):
    rows = []
    for i in range(WHALE_N):
        ws = list(BOILER)
        ws[5 + (i % 30)] = "nz" + _letters(i)
        rows.append((i, " ".join(ws)))
    for i in range(TAIL_N):
        # unique-per-doc letters-only tokens: no shingle shared across
        # docs under either tokenizer
        rows.append(
            (
                WHALE_N + i,
                " ".join(
                    "t" + _letters(i) + "x" + _letters(j) for j in range(30)
                ),
            )
        )
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_near_dup_whale_emits_cluster_pairs(spark):
    docs = _corpus(spark)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    rows = pairs.collect()
    whale = [r for r in rows if r.d1 < WHALE_N and r.d2 < WHALE_N]
    # true shingle Jaccard ~0.76. Banded-LSH candidate recall at that
    # similarity is P(share >=1 of 4 bands of 4 perms) = 1-(1-J^4)^4
    # ~ 79%, plus the 16-perm score estimate must clear 0.5 (perms are
    # affine transforms of one base hash, so agreement events are
    # positively correlated and the tail is fatter than binomial).
    # Measured emission on this corpus: ~88% — pin >= 80% so a
    # candidate-generation regression (e.g. a hot-bucket drop that
    # discards the cluster) fails loudly while LSH's intrinsic recall
    # doesn't flake the suite.
    assert len(whale) >= 0.8 * (WHALE_N * (WHALE_N - 1) // 2), len(whale)
    assert all(r.d1 < WHALE_N for r in rows), "tail docs must not pair"
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ngram_df_cap_drops_boilerplate_recall_documented(spark):
    docs = _corpus(spark)
    # capped (default): boilerplate shingles sit in 60% of docs > 20%
    # cap -> dropped; each whale doc keeps only its unique noise
    # shingles, so capped Jaccard is 0 for every pair
    assert dedup.ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
    # uncapped on the same corpus: every whale pair clears 0.5
    uncapped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.5, max_doc_frequency=None
    )
    assert uncapped.count() == WHALE_N * (WHALE_N - 1) // 2


def test_jaccard_prefix_exact_on_near_dup_whale(spark):
    docs = _corpus(spark)
    out = dedup.jaccard_prefix_join(docs, threshold_e1=6).collect()
    # exact operator: all-and-only the whale pairs (J is 37/49=0.755
    # for disjoint noise positions, higher for overlapping ones)
    assert len(out) == WHALE_N * (WHALE_N - 1) // 2
    assert all(r.doc_a < WHALE_N and r.doc_b < WHALE_N for r in out)
    assert all(r.jaccard_e4 >= 6000 for r in out)

"""Round-14 ANN soak: the blocked-kNN family at 500k / 1M vectors with
AUTO-derived bucket_bits (VERDICT r13 items 4 + 5).

Differences from tools/soak_ann_recall.py (the r13 harness, kept for
comparability):

- ``bucket_bits=None`` everywhere — the operators derive
  clamp(ceil(log2(n)) - 3, 4, 24) themselves (16 at 500k, 17 at 1M);
  each cell logs the width actually derived so the receipt shows the
  auto value, not an assumption.
- The 1M multiprobe cell is MEASURED (min-of-1, logged as such) instead
  of skipped: r13 skipped it as multi-hundred-second at 16 bits; the
  auto width at 1M is 17 bits, which halves expected bucket occupancy
  and bounds the (1 + bits)x probe fan-out growth to 18/17 — this run
  is the receipt for whether the contract stays servable at 1M.
- PQ cells dropped (soaked separately in r13 §4b; nothing changed).

Usage::

    python tools/soak_ann_r14.py [sizes_k ...]   # default 500 1000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from soak_ann_recall import corpus  # noqa: E402  (same corpus builder)

WHALE_N = 5000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark import caching
    from data_lake_for_citi_bike_trip_spark.operators import similarity

    sizes = [int(a) * 1000 for a in sys.argv[1:]] or [500_000, 1_000_000]
    out_root = "/tmp/soak_ann_r14"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm = corpus(spark, out_root, 5_000, 0)
    similarity.blocked_mutual_knn(warm, k=5).agg(F.count(F.lit(1))).collect()

    def t(fn, reps):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 2)

    for total in sizes:
        for shape in ("flat", "hot"):
            whale = WHALE_N if shape == "hot" else 0
            emb = corpus(spark, out_root, total, whale).cache()
            emb.count()
            bits = similarity.auto_bucket_bits(emb)

            def blocked():
                similarity.blocked_mutual_knn(emb, k=5).agg(
                    F.count(F.lit(1)), F.max("cos_sim")
                ).collect()

            def multiprobe():
                similarity.blocked_mutual_knn_multiprobe(emb, k=5).agg(
                    F.count(F.lit(1)), F.max("cos_sim")
                ).collect()

            def recall_single():
                similarity.blocked_knn_recall(
                    emb, k=5, sample_cap=2000
                ).collect()

            def recall_multi():
                similarity.blocked_knn_multiprobe_recall(
                    emb, k=5, sample_cap=2000
                ).collect()

            cells = {
                "blocked_knn": (blocked, 2),
                "multiprobe_knn": (multiprobe, 2 if total <= 500_000 else 1),
                "recall_single": (recall_single, 2),
                "recall_multi": (recall_multi, 2),
            }
            for name, (fn, reps) in cells.items():
                caching.release_caches()
                # release_caches cleared the bits memo — re-derive so
                # the logged width is what the cell actually ran with.
                # Recall cells derive from the 2000-vector SAMPLE by
                # design (8 bits at this cap): both graphs are built on
                # the sample, so that is their real operating point.
                rec = {"corpus": f"{total // 1000}k_{shape}",
                       "whale": whale, "cell": name,
                       "auto_bits": similarity.auto_bucket_bits(emb),
                       "reps": reps}
                if name.startswith("recall"):
                    rec["sample_bits"] = "derived from 2000-cap sample"
                rec["sec"] = t(fn, reps)
                print(json.dumps(rec), flush=True)
            emb.unpersist()
            caching.release_caches()
            del bits
    shutil.rmtree(out_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

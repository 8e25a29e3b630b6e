"""Round-14 PQ soak: close the r13 loop at 1M vectors.

SOAK_r13 §4b found and fixed two defects behind the super-linear
250k → 500k PQ cell (argmin window sort on the expanded stream; a
one-row-group parquet collapsing the encode stage to one task),
bringing 500k from 444.8 s to 57.8 s — but 1M was left skipped with
"under investigation". This runs the same cached-index pipeline
(train m=4 k=32 iters=2 → encode → search 10 queries) at 500k and 1M,
flat and hot, so the fix has a receipt at the next doubling.

Usage::

    python tools/soak_pq_r14.py [sizes_k ...]   # default 500 1000
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from soak_ann_recall import corpus  # noqa: E402

WHALE_N = 5000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark import caching
    from data_lake_for_citi_bike_trip_spark.operators import similarity

    sizes = [int(a) * 1000 for a in sys.argv[1:]] or [500_000, 1_000_000]
    out_root = "/tmp/soak_pq_r14"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm = corpus(spark, out_root, 5_000, 0)
    similarity.blocked_mutual_knn(warm, k=5).agg(F.count(F.lit(1))).collect()

    for total in sizes:
        for shape in ("flat", "hot"):
            whale = WHALE_N if shape == "hot" else 0
            emb = corpus(spark, out_root, total, whale).cache()
            emb.count()
            caching.release_caches()
            t0 = time.time()
            cb = similarity.build_pq_codebooks(emb, m=4, k=32, iters=2).cache()
            codes = similarity.pq_encode(emb, cb).cache()
            try:
                similarity.pq_search(
                    emb.where(F.col("vec_id") < 10), codes, cb, k=10
                ).agg(F.count(F.lit(1)), F.max("rank")).collect()
            finally:
                cb.unpersist()
                codes.unpersist()
            print(
                json.dumps(
                    {"corpus": f"{total // 1000}k_{shape}", "whale": whale,
                     "cell": "pq_train_encode_search", "reps": 1,
                     "sec": round(time.time() - t0, 2)}
                ),
                flush=True,
            )
            emb.unpersist()
            caching.release_caches()
    shutil.rmtree(out_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

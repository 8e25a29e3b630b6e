"""One-off 2M-vector extension of SOAK_r14: blocked_knn + recalls at
the next doubling (auto width expected 18 bits). Multiprobe skipped
(contract fan-out makes it ~500 s; the 1M cell is the receipt)."""
import json, shutil, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
from soak_ann_recall import corpus

def main():
    from pyspark.sql import SparkSession, functions as F
    from data_lake_for_citi_bike_trip_spark import caching
    from data_lake_for_citi_bike_trip_spark.operators import similarity
    out_root = "/tmp/soak_2m_r14"
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    warm = corpus(spark, out_root, 5_000, 0)
    similarity.blocked_mutual_knn(warm, k=5).agg(F.count(F.lit(1))).collect()
    for total, whale in ((2_000_000, 0), (2_000_000, 5000)):
        shape = "hot" if whale else "flat"
        emb = corpus(spark, out_root, total, whale).cache(); emb.count()
        cells = {
            "blocked_knn": lambda: similarity.blocked_mutual_knn(emb, k=5)
                .agg(F.count(F.lit(1)), F.max("cos_sim")).collect(),
            "recall_single": lambda: similarity.blocked_knn_recall(
                emb, k=5, sample_cap=2000).collect(),
            "recall_multi": lambda: similarity.blocked_knn_multiprobe_recall(
                emb, k=5, sample_cap=2000).collect(),
        }
        for name, fn in cells.items():
            caching.release_caches()
            bits = similarity.auto_bucket_bits(emb)
            best = None
            for _ in range(2):
                t0 = time.time(); fn(); dt = time.time() - t0
                best = dt if best is None or dt < best else best
            print(json.dumps({"corpus": f"2000k_{shape}", "whale": whale,
                              "cell": name, "auto_bits": bits, "reps": 2,
                              "sec": round(best, 2)}), flush=True)
        emb.unpersist(); caching.release_caches()
    shutil.rmtree(out_root, ignore_errors=True)
    spark.stop()

main()

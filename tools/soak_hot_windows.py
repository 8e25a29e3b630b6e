"""Directed soak for the AUTOMATIC hot-key window chooser (r12).

Re-measures the SOAK_r11 §2/§2b corpora — 30% hot key over ~1000
keys — through the NO-PARAM default paths of ``sessionize`` and
``asof_join``, which since r12 gate segmentation automatically from a
memoized per-key counting pass (VERDICT r11 item 1). Also times the
flat corpora both ways to bound the gate's overhead on the common
case (the gate must keep the single-window plan there).

Usage::

    python tools/soak_hot_windows.py [n_events_millions ...]

Prints one JSON line per (corpus, operator, plan) cell. Warm minima
of --reps runs in one session; run with the box otherwise idle.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def make_events(spark, n, hot_share, n_keys=1000, span_s=30 * 24 * 3600):
    """Deterministic event frame: key 0 owns ``hot_share`` of rows."""
    from pyspark.sql import functions as F

    hot_mod = int(hot_share * 100)
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.when(
                F.pmod(F.xxhash64("id"), 100) < hot_mod, F.lit(0)
            )
            .otherwise(1 + F.pmod(F.xxhash64("id", F.lit(1)), n_keys - 1))
            .alias("user_id"),
            F.pmod(F.abs(F.xxhash64("id", F.lit(2))), span_s).alias("sec"),
        )
        .select(
            "event_id",
            "user_id",
            F.timestamp_seconds("sec").alias("ts"),
            F.col("sec").cast("double").alias("tsd"),
        )
    )


def timeit(fn, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best


def main() -> None:
    from pyspark.sql import SparkSession

    from data_lake_for_citi_bike_trip_spark import caching
    from data_lake_for_citi_bike_trip_spark.operators import analytics, asof

    sizes = [int(a) for a in sys.argv[1:]] or [4, 8]
    reps = 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for m in sizes:
        n = m * 1_000_000
        for shape, share in (("flat", 0.001), ("hot30", 0.30)):
            ev = make_events(spark, n, share)
            ev = ev.cache()
            ev.count()  # materialize input out of the timings

            def sess_auto():
                caching.release_caches()  # re-decide: no memo credit
                analytics.sessionize(ev).agg({"n_events": "sum"}).collect()

            def sess_plain():
                analytics.sessionize(ev, auto_segment=False).agg(
                    {"n_events": "sum"}
                ).collect()

            left = ev.select("user_id", "tsd", "event_id")
            right = ev.sample(0.25, seed=7).selectExpr(
                "user_id", "tsd AS rts", "CAST(event_id AS DOUBLE) AS v"
            )

            def asof_auto():
                caching.release_caches()
                asof.asof_join(
                    left, right, on="user_id", left_ts="tsd",
                    right_ts="rts", right_cols=["v"],
                ).agg({"asof_v": "max"}).collect()

            def asof_plain():
                asof.asof_join(
                    left, right, on="user_id", left_ts="tsd",
                    right_ts="rts", right_cols=["v"],
                    auto_segment=False,
                ).agg({"asof_v": "max"}).collect()

            cells = {
                "sessionize_auto": sess_auto,
                "sessionize_single_window": sess_plain,
                "asof_auto": asof_auto,
                "asof_single_window": asof_plain,
            }
            for name, fn in cells.items():
                sec = timeit(fn, reps)
                print(
                    json.dumps(
                        {
                            "corpus": f"{m}M_{shape}",
                            "cell": name,
                            "sec": round(sec, 2),
                        }
                    ),
                    flush=True,
                )
            ev.unpersist()
            caching.release_caches()
    spark.stop()


if __name__ == "__main__":
    main()

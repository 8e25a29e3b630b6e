"""Directed soak for the audited user-keyed raw-event windows
(VERDICT r11 item 5): `user_paths`, `transition_latency`,
`visit_cadence` under a 30% bot user vs a flat corpus.

`user_paths` is not a window but a per-user collect_list — the whale
exposure there is one task materializing the bot's whole history as a
single in-memory array; the two lag/lead operators are the same
hot-key window class the r12 chooser fixed for sessionize/as-of.

Usage::

    python tools/soak_user_windows.py [n_events_millions ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from soak_hot_windows import make_events  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark import caching
    from data_lake_for_citi_bike_trip_spark.operators import behavior

    sizes = [int(a) for a in sys.argv[1:]] or [8]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def t(fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 2)

    types = F.element_at(
        F.array(*[F.lit(x) for x in
                  ["click", "view", "purchase", "signup", "error"]]),
        (F.pmod(F.xxhash64("event_id", F.lit(9)), 5) + 1).cast("int"),
    )
    for m in sizes:
        n = m * 1_000_000
        for shape, share in (("flat", 0.001), ("hot30", 0.30)):
            ev = (
                make_events(spark, n, share)
                .withColumn("event_type", types)
                .cache()
            )
            ev.count()
            cells = {
                "user_paths_plain": lambda: behavior.user_paths(
                    ev, auto_segment=False
                ).agg(F.max("n_events"), F.count(F.lit(1))).collect(),
                "user_paths_auto": lambda: behavior.user_paths(ev)
                .agg(F.max("n_events"), F.count(F.lit(1))).collect(),
                "transition_latency_plain": lambda:
                behavior.transition_latency(ev, auto_segment=False)
                .agg(F.max("median_gap_s"), F.count(F.lit(1))).collect(),
                "transition_latency_auto": lambda:
                behavior.transition_latency(ev)
                .agg(F.max("median_gap_s"), F.count(F.lit(1))).collect(),
                "visit_cadence_plain": lambda: behavior.visit_cadence(
                    ev, auto_segment=False
                ).agg(F.max("n_users")).collect(),
                "visit_cadence_auto": lambda: behavior.visit_cadence(ev)
                .agg(F.max("n_users")).collect(),
            }
            for name, fn in cells.items():
                print(
                    json.dumps(
                        {"corpus": f"{m}M_{shape}", "cell": name,
                         "sec": t(fn)}
                    ),
                    flush=True,
                )
            ev.unpersist()
            caching.release_caches()
    spark.stop()


if __name__ == "__main__":
    main()

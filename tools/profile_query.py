"""Per-query profiling harness for optimization rounds.

For each named query: runs it end-to-end with the noop sink N times
(same methodology as bench.py), prints the run times, and writes the
``.explain("formatted")`` output to ``plans/<tag>/<query>_<suffix>.txt``.

Usage:
  python tools/profile_query.py [--sf SF_DIR] [--n N] [--tag r15]
                                [--suffix before] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from data_lake_for_citi_bike_trip_spark.session import get_session

    spark = get_session("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    allq = entrymod.queries()
    outdir = os.path.join("/root/repo/plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    for name in args.queries:
        fn = allq[name]
        spark.sparkContext.setJobDescription(name)
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        if not args.no_plan:
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
        print(f"{name}: runs={runs} min={min(runs)}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

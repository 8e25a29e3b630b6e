"""Peak-memory receipt for interval_union_length's byte gate
(VERDICT r12 item 2 / SOAK_r13 §3b): run the PLAIN single-window plan
over a hot corpus and read the max per-task peakExecutionMemory from
the Spark UI REST API, next to the gate's byte ESTIMATE
(max per-user rows x _INTERVAL_ROW_BYTES) and the firing bound.

Usage: python tools/measure_interval_peak.py [n_events_millions]
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark.operators import intervals
    from soak_hot_windows import make_events

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    n = m * 1_000_000
    ev = make_events(spark, n, 0.30).cache()
    ev.count()

    # the gate's own estimate, from the same counting pass it runs
    from data_lake_for_citi_bike_trip_spark.operators.skew import (
        hot_window_gate,
    )

    stats = ev.select(
        F.col("user_id").alias("__k"),
        F.unix_micros("ts").cast("double").alias("__t"),
    )
    max_rows, _ = hot_window_gate(stats, 1)
    est = max_rows * intervals._INTERVAL_ROW_BYTES

    intervals.interval_union_length(ev, auto_segment=False).agg(
        F.max("covered_us")
    ).collect()

    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    peak = 0
    peak_stage = None
    for st in stages:
        p = st.get("peakExecutionMemory", 0) or 0
        if p > peak:
            peak, peak_stage = p, st.get("stageId")
    # stage-level peakExecutionMemory aggregates tasks; the gate's
    # claim is about ONE task, so read the max-task quantile too
    task_max = None
    if peak_stage is not None:
        try:
            summ = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{peak_stage}/0/"
                    "taskSummary?quantiles=0.5,1.0"
                )
            )
            task_max = summ.get("peakExecutionMemory", [None, None])[-1]
        except Exception:
            pass
    print(
        json.dumps(
            {
                "corpus": f"{m}M_hot30",
                "max_user_rows": max_rows,
                "gate_estimate_bytes": est,
                "gate_bound_bytes": intervals.INTERVAL_UNION_HOT_BYTES,
                "plain_stage_peak_execution_memory": peak,
                "plain_max_task_peak_execution_memory": task_max,
                "peak_stage": peak_stage,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

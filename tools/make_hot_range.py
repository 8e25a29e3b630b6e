"""Generate a HOT VALUE RANGE corpus for the range-join soak.

VERDICT r10 item 1's adversary for ``asof.range_join_bucketed``: one
narrow value range (a popular price band) owning a corpus-scale share
of BOTH points and overlapping intervals. All of that band's points
and intervals land on ONE bucket id, so the plain bucket equi-join
emits the band's points×intervals candidate pairs inside a single
task — AQE's skew split keys on input bytes and cannot see quadratic
OUTPUT from a kilobyte-scale hot bucket (the vector-whale blind spot,
one operator over). ``salted_candidates``' pair-product gate must see
it (hot pairs = hot_points × hot_intervals >= whale_min² even though
the interval count alone never crosses whale_min).

Construction (deterministic):
- hot band: ``hot_points`` points uniform in [50, 60) (bucket 5 at
  width 10) and ``hot_ivs`` intervals of width ~3 sliding across the
  same band — every hot point matches ~30% of hot intervals, so the
  contract output itself is near-quadratic in the band (the honest
  adversary: output must scale, only single-tasking is the bug).
- tail: ``tail_points`` points spread over [1000, 1000+tail) with
  disjoint width-3 intervals every 3 units — linear matches, many
  distinct buckets.

Usage: python tools/make_hot_range.py OUT_DIR HOT_POINTS HOT_IVS TAIL_POINTS
Writes OUT_DIR/points.parquet (okey int64, lnum int64, v double) and
OUT_DIR/intervals.parquet (iv_id int64, lo double, hi double).
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    out_dir = sys.argv[1]
    hot_points, hot_ivs, tail_points = (
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260816)

    n = hot_points + tail_points
    v = np.empty(n, dtype=np.float64)
    v[:hot_points] = 50.0 + 10.0 * rng.random(hot_points)
    v[hot_points:] = 1000.0 + 3.0 * np.arange(tail_points, dtype=np.float64)
    okey = np.arange(n, dtype=np.int64) // 7
    lnum = np.arange(n, dtype=np.int64) % 7
    pq.write_table(
        pa.table({"okey": okey, "lnum": lnum, "v": v}),
        os.path.join(out_dir, "points.parquet"),
    )

    m = hot_ivs + tail_points
    lo = np.empty(m, dtype=np.float64)
    lo[:hot_ivs] = 50.0 + 7.0 * rng.random(hot_ivs)
    lo[hot_ivs:] = 1000.0 + 3.0 * np.arange(tail_points, dtype=np.float64)
    hi = lo + 3.0
    pq.write_table(
        pa.table(
            {"iv_id": np.arange(m, dtype=np.int64), "lo": lo, "hi": hi}
        ),
        os.path.join(out_dir, "intervals.parquet"),
    )
    print(f"wrote {n} points, {m} intervals -> {out_dir}")


if __name__ == "__main__":
    main()

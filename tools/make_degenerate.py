"""Build degenerate testdata variants for robustness sweeps.

Modes (second arg, default ``empty``):

- ``empty``  — zero rows, schema copied byte-for-byte from the real
  testdata (including the naive-micros timestamp physical type the
  readers special-case).
- ``single`` — exactly one row per table (the first row of sf0.001):
  every window frame, self-join, and variance/covariance reduce hits
  its n=1 edge.
- ``nulls`` — full sf0.001 row count, but every non-key payload column
  is NULL (keys and foreign keys keep their values so joins still
  resolve). NULL timestamps, NULL texts, NULL prices: the dirty-feed
  shape every 100 TB ingest eventually sees.

Usage::

    python tools/make_degenerate.py /tmp/emptydata [empty|single]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: columns that keep their values in ``nulls`` mode (identity + join keys)
KEEP = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "event_id", "user_id", "doc_id", "vec_id",
}

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.001")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    dst = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "empty"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if mode == "empty":
            out = tbl.schema.empty_table()
        elif mode == "single":
            out = tbl.slice(0, 1)
        elif mode == "nulls":
            import pyarrow as pa

            arrays = [
                tbl.column(i)
                if f.name in KEEP
                else pa.nulls(tbl.num_rows, type=f.type)
                for i, f in enumerate(tbl.schema)
            ]
            out = pa.table(arrays, schema=tbl.schema)
        else:
            raise SystemExit(f"unknown mode {mode!r}")
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {out.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Build degenerate testdata variants for robustness sweeps.

Modes (second arg, default ``empty``):

- ``empty``  — zero rows, schema copied byte-for-byte from the real
  testdata (including the naive-micros timestamp physical type the
  readers special-case).
- ``single`` — exactly one row per table (the first row of sf0.001):
  every window frame, self-join, and variance/covariance reduce hits
  its n=1 edge.

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
        out = tbl.schema.empty_table() if mode == "empty" else tbl.slice(0, 1)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {out.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Synthesize a k-times larger testdata set by key-shifted replication.

Purpose: empirical scale soak. The sf sweeps prove CORRECTNESS at small
scale; this tool lets ``tools/scale_soak.py`` measure how runtime GROWS
— a bounded operator should scale ~linearly in rows, and anything
super-linear here would be a cliff at 100 TB.

Replica ``i`` shifts every entity key by ``i * (max_key + 1)`` so
cardinalities (users, orders, docs, vectors) scale with the corpus
while referential joins stay consistent across replicas. Fixed dims
(region, nation) are copied unchanged — exactly how a real corpus
grows. Payload columns are left as-is: duplicated texts/vectors across
replicas deliberately stress the dedup/ANN candidate-pruning guards
(10 exact copies of every doc is a worst-ish case for bucket joins).

Usage::

    python tools/synth_scale.py /tmp/sf1_synth 10         # 10x sf0.1
    python tools/synth_scale.py /tmp/sf1_skew 10 skew     # + hot keys

``skew`` additionally collapses the entity keys of the first third of
replicas onto key 0 — one "bot" user owns ~30% of all events and one
whale customer ~30% of orders. This deliberately violates the
bounded-per-user assumption the behavior operators document, to
measure what a hot key actually costs (AQE skew handling, per-key
walks, window partitions).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")

#: table -> columns that are entity keys (shift per replica)
KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    dst = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    skew = len(sys.argv) > 3 and sys.argv[3] == "skew"
    hot = {"events": "user_id", "orders": "o_custkey"}
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        src = f"{SRC}/{table}.parquet"
        out = f"{dst}/{table}.parquet"
        if not keys:
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{out}' (FORMAT parquet)"
            )
            print(f"{table}: copied (fixed dim)")
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}'"
            ).fetchall()
        ]
        strides = {
            key: con.execute(
                f"SELECT max({key}) + 1 FROM '{src}'"
            ).fetchone()[0]
            for key in keys
        }
        def shift(c: str) -> str:
            if c not in strides:
                return c
            expr = f"{c} + i * {strides[c]}"
            if skew and hot.get(table) == c:
                # first third of replicas: collapse onto key 0
                expr = f"CASE WHEN i < {max(k // 3, 1)} THEN 0 ELSE {expr} END"
            return f"{expr} AS {c}"

        proj = ", ".join(shift(c) for c in cols)
        con.execute(
            f"COPY (SELECT {proj} FROM '{src}', range({k}) r(i) "
            f"ORDER BY i) TO '{out}' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows (x{k})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

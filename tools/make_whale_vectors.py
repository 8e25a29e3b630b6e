"""Generate a NEAR-identical VECTOR whale corpus for the embedding soaks.

The vector analogue of make_whale_neardup.py: the r9/r10 collapses merge
byte-identical embeddings before candidate generation, so a whale of
*near*-identical vectors (every float array distinct, pairwise cosine
>= 0.9999) is the corpus that defeats `_exact_vector_members` /
`_collapsed_knn_edges`' collapse while still landing every whale member
in ONE sign-LSH bucket — the hot-bucket adversary for
`embedding_dup_pairs` (quadratic contract output) and the blocked kNN
family (quadratic within-block compute, k-bounded output).

Construction (deterministic, no RNG state shared with tests):
- whale member i: first 8 coords fixed at +0.5 (sign_bucket(bits<=8) is
  all-ones for every member), the remaining 56 coords carry a shared
  base profile plus one i-dependent perturbation of ~1e-3 at coordinate
  8 + (i % 56) with an i-proportional sub-ulp-of-corpus tweak — arrays
  pairwise DISTINCT, pairwise cosine ~= 1 - O(1e-6) >= 0.999.
- tail member j: signs of the first 8 coords drawn from j's bits
  (spreads the tail across all 2^8 buckets; ~1/256 of it shares the
  whale's bucket and is scored-but-rejected, the linear leak the
  operator must absorb), remaining coords pseudo-random in [-1, 1] —
  cosine between distinct tail members concentrates near 0 << 0.999.

Usage: python tools/make_whale_vectors.py OUT_DIR WHALE_N TAIL_N
Writes OUT_DIR/embeddings.parquet (vec_id int64, embedding list<float>,
label int32 — the testdata schema).
"""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def main() -> None:
    out_dir, whale_n, tail_n = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    rng = np.random.default_rng(20260815)

    base = np.zeros(DIM, dtype=np.float64)
    base[:8] = 0.5
    # shared whale profile on the free coords: fixed, moderately sized
    base[8:] = 0.1 + 0.8 * rng.random(56)

    vecs = np.empty((whale_n + tail_n, DIM), dtype=np.float64)
    for i in range(whale_n):
        v = base.copy()
        # one perturbed coordinate per member: ~1e-3 magnitude keeps
        # pairwise cosine >= 0.999; the i-proportional term keeps every
        # array distinct even when i % 56 collides
        v[8 + (i % 56)] += 1e-3 + 1e-9 * i
        vecs[i] = v
    tail = rng.uniform(-1.0, 1.0, size=(tail_n, DIM))
    # put the tail's bucket signs under j's control so it spreads
    # across all 256 sign buckets deterministically
    for j in range(tail_n):
        for b in range(8):
            s = 1.0 if (j >> b) & 1 else -1.0
            tail[j, b] = s * (0.25 + abs(tail[j, b]) / 2)
    vecs[whale_n:] = tail

    n = whale_n + tail_n
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([int(i < whale_n) for i in range(n)], pa.int32()),
        }
    )
    # multiple row groups: a single-row-group file defeats Spark's
    # byte-range splitting (only the split containing the group START
    # yields rows) and silently serializes every consumer onto one
    # core (SOAK_r13 §4b). Real lakes write many groups; so do we.
    pq.write_table(table, f"{out_dir}/embeddings.parquet",
                   row_group_size=65536)
    print(f"wrote {n} vectors ({whale_n} near-dup whale) -> {out_dir}")


if __name__ == "__main__":
    main()

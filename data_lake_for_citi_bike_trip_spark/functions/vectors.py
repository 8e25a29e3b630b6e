"""Vector column expressions over array<double> embeddings.

Built-in higher-order functions only (zip_with/aggregate): the math runs
JVM-side, no Python round-trip. Per-row reductions are sequential left
folds — deterministic — but engines may differ in the last float bits,
so any value used for thresholding/ordering should pass through round6
first (see oracles.py parity rules).

UNROLLED-DOT NEGATIVE RESULT (r16, VERDICT r15 item 5): Spark's HOFs
are CodegenFallback (interpreted per row), so an ``element_at`` product
chain unrolled at the data-model width (64) with a ``when(size==64)``
guard looked like the §4.2 move — and in a bare cached-scan projection
it measured 2.3x FASTER (0.82 -> 0.33 s / 2M pairs). In the real knn
query stages (pair scoring inside join+window plans) it measured
consistently SLOWER across the whole family — knn_mutual_pairs
3.10 -> 3.60 s, blocked_pairs 1.47 -> 2.15 s, multiprobe_pairs
1.50 -> 2.10 s, blocked_recall 2.57 -> 4.04 s, multiprobe_recall
3.24 -> 6.45 s (min-of-3, same harness back-to-back) — the giant
inlined expression pushes the enclosing whole-stage-codegen method past
JIT-friendly size inside complex stages (no Spark fallback warning;
the stage silently runs un-JIT-compiled). A seq-indexed HOF
(``aggregate(sequence(...))`` without zip_with's intermediate array)
measured a wash (0.81 vs 0.82 s). The HOF fold therefore stays.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance — same HOF left fold as ``dot``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_r6(a: Column, b: Column) -> Column:
    """Cosine rounded to 6 decimals — the cross-engine-stable form."""
    return F.round(cosine(a, b), 6)


def cosine_r6_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """``cosine_r6`` with the norms precomputed as columns.

    BIT-IDENTICAL to cosine_r6 (same dot / (norm_a * norm_b) double
    arithmetic — norms are just evaluated once per VECTOR instead of
    once per PAIR), so oracle parity is unaffected while an all-pairs
    scorer drops from three array reductions per pair to one. Pass
    norms built with ``norm()`` on each side, in (left, right) order to
    preserve the multiplication order of ``cosine``."""
    return F.round(dot(a, b) / (norm_a * norm_b), 6)


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign pattern of the first ``bits``
    coordinates (axis-aligned random-hyperplane family; chosen over
    random planes so the oracle can reproduce it exactly)."""
    return F.concat_ws(
        "",
        F.transform(
            F.slice(vec, 1, bits),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )

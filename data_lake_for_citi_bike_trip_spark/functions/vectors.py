"""Vector column expressions over array<double> embeddings.

Built-in higher-order functions only (zip_with/aggregate): the math runs
JVM-side inside codegen, no Python round-trip. Per-row reductions are
sequential left folds — deterministic — but engines may differ in the
last float bits, so any value used for thresholding/ordering should pass
through round6 first (see oracles.py parity rules).
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

"""Text column expressions — tokens, shingles, deterministic hashes.

Everything is built-in-expression based (JVM-side, whole-stage codegen):
no Python UDFs in any hot path. Hashes derive from md5 because md5 is
bit-identical across engines (the DuckDB oracle mirrors every formula).

Performance shape (learned from bench): doc-level signatures are computed
by EXPLODING shingles/tokens and aggregating with shallow expressions, not
by deep nested higher-order functions over arrays — a 16-permutation HOF
formulation re-evaluated the shingle construction per permutation and fell
out of codegen (~10x slower at sf0.1). The explode->partial-agg shape also
scales: map-side combine collapses to one row per (partition, doc) before
any shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: MinHash configuration: 16 permutations in 4 bands of 4 rows each.
#: P(candidate | jaccard=j) = 1-(1-j^4)^4 -> ~0.5 at j~0.45, steep S-curve.
MINHASH_PERMS = 16
MINHASH_BAND_SIZE = 4
MINHASH_BANDS = MINHASH_PERMS // MINHASH_BAND_SIZE

SIMHASH_BITS = 32


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def shingles_of(w: Column, n: int = 3) -> Column:
    """Distinct word n-grams (single-space joined) over an already
    tokenized array column.

    Prefer this two-step form (project ``tokens()`` to a column, then
    shingle the ATTRIBUTE) whenever the result feeds an ``explode``:
    a non-outer Generate makes Catalyst infer a ``size(...) > 0``
    filter and push it below the projection, re-inlining the whole
    tokenize+shingle expression into a per-row Filter — the work runs
    twice more per row. With an attribute input the inferred filter is
    cheap (or use explode_outer, which infers none).

    Guarded for short docs: Spark's sequence(1, 0) counts *down*, so
    the window index list is only built when size(w) >= n.
    """
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of raw text — ``shingles_of(tokens(text))``."""
    return shingles_of(tokens(text), n)


#: Pairwise-independent permutation family h_i(x) = (a_i*x + b_i) mod p
#: over 32-bit base hashes. One md5 per shingle; 16 permutations derived
#: arithmetically. A naive "h1 + i*h2" (no modulus) leaves permutations
#: correlated and inflates Jaccard estimates ~5x (observed) — the modulus
#: is load-bearing. Constants are fixed so the DuckDB oracle derives the
#: exact same SQL from this module.
MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32
MINHASH_COEFFS: list[tuple[int, int]] = [
    ((((i + 1) * 2_654_435_761) % (1 << 29)) | 1, ((i + 1) * 40_503) % MINHASH_PRIME)
    for i in range(MINHASH_PERMS)
]
# overflow check: a < 2^29, x < 2^32 -> a*x + b < 2^61 + 2^32, fits int64


def minhash_agg_columns(h: Column, perms: int = MINHASH_PERMS) -> list[Column]:
    """Aggregate expressions for a per-doc signature over *exploded*
    shingles: sig_i = min((a_i*h + b_i) mod p)."""
    return [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:perms])
    ]


def band_key(sig_cols: list[Column], band: int, band_size: int = MINHASH_BAND_SIZE) -> Column:
    """LSH band bucket id: md5 of the band's signature slice."""
    start = band * band_size
    return F.md5(F.concat_ws(",", *sig_cols[start : start + band_size]))


def token_hash32(token: Column) -> Column:
    """First 32 bits of md5 as a bigint (oracle mirror:
    CAST('0x' || substr(md5(t), 1, 8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("bigint")


def simhash_agg(hash_col: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash as a groupBy aggregate over *exploded* token hashes: bit j
    is set where at least half the token hashes have bit j set
    (2*ones >= n). Integer-only arithmetic — exact, order-insensitive,
    oracle-mirrorable."""
    n = F.count(F.lit(1))
    total = F.lit(0).cast("bigint")
    for j in range(bits):
        ones = F.sum(F.shiftright(hash_col, j).bitwiseAND(F.lit(1)))
        total = total + F.when(
            ones * 2 >= n, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return total

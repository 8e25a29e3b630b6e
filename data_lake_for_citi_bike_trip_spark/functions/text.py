"""Text column expressions — tokens, shingles, deterministic hashes.

Everything is built-in-expression based (JVM-side, whole-stage codegen):
no Python UDFs in any hot path. Hashes use md5 hex strings because md5 is
bit-identical across engines (the DuckDB oracle mirrors every formula);
lexicographic MIN over hex strings is a valid uniform min-hash.

At 100 TB the per-row work here (split/transform/md5) scales linearly and
stays inside codegen; the expensive parts are the *joins* built on top
(operators/dedup.py), not these expressions.
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


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces.

    Guarded for short docs: Spark's sequence(1, 0) counts *down*, so the
    window index list is only built when size(w) >= n.
    """
    w = tokens(text)
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def _seeded_hash(seed: int):
    # NB: a plain `lambda s, seed=seed:` would change the lambda's arity —
    # pyspark's HOFs bind extra params to the element *index* column.
    return lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))


def minhash_signature(shingles: Column, perms: int = MINHASH_PERMS) -> list[Column]:
    """One min-hash per seeded permutation: min(md5('<seed>:' || s))."""
    return [
        F.array_min(F.transform(shingles, _seeded_hash(seed))).alias(f"mh_{seed}")
        for seed in range(perms)
    ]


def band_key(sig_cols: list[Column], band: int, band_size: int = MINHASH_BAND_SIZE) -> Column:
    """LSH band bucket id: md5 of the band's signature slice."""
    start = band * band_size
    return F.md5(F.concat_ws(",", *sig_cols[start : start + band_size]))


def token_hash32(token: Column) -> Column:
    """First 32 bits of md5 as a bigint (oracle mirror:
    CAST('0x' || substr(md5(t), 1, 8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("bigint")


def simhash(tokens_col: Column) -> Column:
    """32-bit SimHash over a token array, as a single expression tree.

    Per-bit balance = sum over tokens of +-1 by that bit of the token's
    hash; bit set where balance >= 0. Integer arithmetic only — exact and
    order-insensitive, so Spark and the oracle agree.
    """
    hashes = F.transform(tokens_col, token_hash32)
    total = F.lit(0).cast("bigint")
    n = F.size(tokens_col)

    def bit_adder(j: int):
        return lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int")

    for j in range(SIMHASH_BITS):
        ones = F.aggregate(hashes, F.lit(0), bit_adder(j))
        # balance = ones - (n - ones) >= 0  <=>  2*ones >= n
        total = total + F.when(ones * 2 >= n, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return total

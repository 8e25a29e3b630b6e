"""Physical-layout operators: Z-order clustering writes and file-level
min/max skipping indexes.

Lakehouse table formats (Delta/Iceberg/Hudi) cluster rows so multi-column
range predicates touch few files, and keep per-file column min/max stats
to prune scans. Both are plain Spark here:

- ``zvalue``           — bit-interleaved Morton code over two quantized
                         columns (pure integer expressions, codegen'd).
- ``zorder_write``     — repartitionByRange + sortWithinPartitions on the
                         z-value, so each output file covers a compact
                         rectangle of (a, b) space.
- ``file_skipping_index`` — per-file row counts and column min/max via
                         ``input_file_name`` (the stats a format's
                         manifest would hold, derived from the data).
- ``prune_files``      — which files can contain rows in [lo, hi]; the
                         index is file-level METADATA (one row per file),
                         so a driver-side collect is the point, not a
                         scale bug.

Scale notes (100 TB): the z-value is one integer expression per row (no
shuffle of its own); the write is one range shuffle — the same cost as
any clustered write. The skipping index is a single groupBy over file
names: ~#files rows out, and min/max partials combine map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton (Z-curve) code interleaving the low ``bits`` of two
    non-negative integer columns: bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1. Pure integer arithmetic — identical in any
    engine, whole-stage-codegen'd in Spark."""
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
        parts.append(
            F.shiftleft(
                F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    z = parts[0]
    for p in parts[1:]:
        z = z + p
    return z


def quantize(c: Column, lo: float, hi: float, bits: int = 8) -> Column:
    """Linear quantization of ``c`` into [0, 2**bits): the per-column
    normalization step before interleaving. Degenerate ranges map to 0."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("bigint")
    return F.floor(
        (c.cast("double") - F.lit(float(lo))) * ((1 << bits) - 1) / F.lit(float(span))
    ).cast("bigint")


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered on the Z-curve of (col_a, col_b).

    One small agg action fetches the four min/max scalars for
    quantization (metadata-sized), then ONE range shuffle orders the data
    by z-value; each output file covers a compact rectangle of the value
    space so range predicates on either column prune files (see
    ``prune_files``)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    if lo_a is None or lo_b is None:
        # empty input: no value space to quantize — zero bounds give a
        # constant z, and the write below emits a typed empty table
        lo_a = hi_a = lo_b = hi_b = 0.0
    z = zvalue(
        quantize(F.col(col_a), float(lo_a), float(hi_a), bits),
        quantize(F.col(col_b), float(lo_b), float(hi_b), bits),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skipping_index(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file stats (row count + min/max per column) keyed on the file
    base name — the data-skipping manifest a lakehouse format maintains,
    computed from the files themselves."""
    base = df.withColumn(
        "file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return base.groupBy("file").agg(*aggs)


def prune_files(index: DataFrame, col: str, lo, hi) -> list[str]:
    """File names whose [min, max] for ``col`` overlaps [lo, hi] — the
    scan list after skipping. The index is one row per FILE (metadata
    scale), so collecting it on the driver mirrors what a query planner
    does with manifest stats."""
    rows = (
        index.where(
            (F.col(f"min_{col}") <= F.lit(hi)) & (F.col(f"max_{col}") >= F.lit(lo))
        )
        .select("file")
        .collect()
    )
    return sorted(r.file for r in rows)


def zorder_sample(lineitem: DataFrame, bits: int = 8, k: int = 100) -> DataFrame:
    """Contract query for the Morton code itself: z-values over
    (l_orderkey % 2^bits, l_partkey % 2^bits), smallest ``k`` rows by the
    total order (zval, l_orderkey, l_linenumber). Plans as
    TakeOrderedAndProject — no global sort materialization."""
    mask = (1 << bits) - 1
    z = zvalue(
        F.col("l_orderkey").bitwiseAND(F.lit(mask)),
        F.col("l_partkey").bitwiseAND(F.lit(mask)),
        bits,
    )
    return (
        lineitem.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            z.alias("zval"),
        )
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(k)
    )

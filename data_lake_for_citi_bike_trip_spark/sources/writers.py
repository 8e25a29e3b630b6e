"""Partitioned parquet sink matrix (SURVEY.md §2.1 S8-S10).

The reference writes the fact and time dims ``mode="append"`` partitioned
by (year, month) and the user dim ``mode="overwrite"`` partitioned by
(usertype, birth_year); remaining dims are unpartitioned overwrites
(spark_elt_emr.py:82-185). ``mode="append"`` on a monthly pipeline with
retries duplicates partitions (SURVEY.md §2.12 #4) — the scale-safe
equivalent is *dynamic partition overwrite*: rewrite exactly the
partitions present in this batch, leave the rest untouched, rerunnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet with the engine's layout rules.

    mode:
      - "overwrite"            — full snapshot refresh (dims).
      - "append"               — blind append (reference-compatible; avoid).
      - "overwrite_partitions" — dynamic partition overwrite: idempotent
        incremental load (requires
        spark.sql.sources.partitionOverwriteMode=dynamic, set by session).

    File hygiene at scale: ``compression`` (zstd beats snappy ~30% on
    text-heavy tables at similar CPU) and ``max_records_per_file`` (bound
    file sizes so downstream scans split evenly; pair with AQE coalescing
    so partitions don't fragment into many small files).
    """
    writer = df.write.format("parquet")
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if mode == "overwrite_partitions":
        writer = writer.mode("overwrite")
    else:
        writer = writer.mode(mode)
    writer.save(path)


def table_bytes(spark, path: str) -> int:
    """Total on-disk bytes of a parquet table (driver-side FS metadata
    only — works for any Hadoop-compatible store, no data read)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    summary = fs.getContentSummary(hpath)
    return int(summary.getLength())


def compact_table(
    spark,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet table into ~target-sized
    files. Returns the output file count.

    The maintenance half of the file-hygiene story: streaming /
    incremental loads fragment partitions into many small files, and scan
    cost at 100 TB is dominated by per-file open overhead once files drop
    well below the HDFS/S3 sweet spot. ``coalesce`` (not repartition)
    merges input splits WITHOUT a shuffle. Writes to a NEW path — the
    atomic swap belongs to a transactional table format or orchestrator,
    not a blind in-place overwrite of a table readers may be scanning.
    """
    import math

    df = spark.read.parquet(src_path)
    n_out = max(1, math.ceil(table_bytes(spark, src_path) / target_file_bytes))
    df.coalesce(n_out).write.mode("overwrite").parquet(dest_path)
    return n_out

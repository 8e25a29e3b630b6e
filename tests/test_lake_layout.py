"""Lake layout behavior: partition pruning, codecs, file sizing."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import staging, star
from data_lake_for_citi_bike_trip_spark.plans.explain import formatted_plan
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table
from data_lake_for_citi_bike_trip_spark.sources.writers import write_table


def _write_fact(spark, sf_dir, path, **kw):
    events = load_table(spark, sf_dir, "events")
    fact = star.fact_trips(
        staging.trips(events), staging.covid(events), staging.weather(events)
    )
    write_table(fact, path, partition_by=["year", "month"], **kw)
    return fact


def test_partition_pruning_on_written_lake(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fact")
    _write_fact(spark, sf_dir, path)
    lake = spark.read.parquet(path)
    one_month = lake.where((F.col("year") == 2024) & (F.col("month") == 1))
    plan = formatted_plan(one_month)
    # the filter must prune at the directory level, not post-scan
    assert "PartitionFilters" in plan
    assert "year#" in plan.split("PartitionFilters")[1][:200]
    assert one_month.count() == lake.count()  # testdata is all 2024-01


def test_writer_codec_and_file_sizing(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fact_zstd")
    _write_fact(spark, sf_dir, path, compression="zstd", max_records_per_file=200)
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    assert files
    meta = pq.ParquetFile(files[0]).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"
    assert all(pq.ParquetFile(f).metadata.num_rows <= 200 for f in files)

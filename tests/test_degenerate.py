"""Degenerate-input robustness: empty tables must degrade, not raise.

At 100 TB any predicate can legitimately yield an empty intermediate (a
new partition, a quiet tenant, a filtered backfill), so "crashes on
zero rows" is a scale bug even when every sf sweep passes. The full
382-query sweep lives in ``tools/robustness_sweep.py`` (run per-round);
these tests pin the classes that actually failed it once:

- PQ codebook training / encode / search dereferenced ``first()[0]`` on
  an empty corpus (similarity.py).
- The parquet/ORC roundtrips inferred schema from written files — an
  empty write produces no files at all (UNABLE_TO_INFER_SCHEMA).
- A zero-row CDC batch skipped schema reconciliation entirely, so a
  widening merge (evolve_schema=True) silently failed to widen and the
  downstream projection died on the missing column (txn.py).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("emptydata")
    for t in TABLES:
        sch = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(sch.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.parametrize(
    "name",
    [
        "txn_schema_evolution",
        "ann_pq_recall",
        "ann_pq_topk",
        "lake_roundtrip",
        "orc_roundtrip",
        # structurally adjacent: driver-collected scalars / trained indexes
        "ann_ivf_topk",
        "debounce_events",
        "capped_running_sum",
        "pareto_8020",
        "jsonl_roundtrip",
    ],
)
def test_contract_query_survives_empty_corpus(spark, empty_sf_dir, name):
    df = entrymod.queries()[name](spark, empty_sf_dir)
    df.count()  # must evaluate without raising
    assert df.schema.simpleString()  # schema stays constructible


def test_empty_merge_batch_still_evolves_schema(spark, tmp_path):
    """Delta semantics: a widening MERGE evolves the table from the
    batch's DECLARED schema even when the batch carries zero rows —
    carried-by-reference files read the new column as NULL."""
    import pyspark.sql.functions as F

    from data_lake_for_citi_bike_trip_spark.sources.txn import TxnTable

    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = TxnTable.create(spark, str(tmp_path / "t"), base, key="k")
    empty_widening = (
        spark.range(0)
        .select(
            F.col("id").alias("k"),
            F.lit(1).cast("bigint").alias("seq"),
            F.lit("U").alias("op"),
            F.col("id").alias("v"),
            F.lit("x").alias("tag"),
        )
    )
    t.merge(spark, empty_widening, "seq", "op", evolve_schema=True)
    latest = t.read(spark)
    assert "tag" in latest.columns
    assert latest.count() == 10
    assert latest.where(F.col("tag").isNull()).count() == 10


def test_empty_merge_batch_with_missing_columns_errors(spark, tmp_path):
    """The CDC contract (batch must carry the full row) binds no matter
    how many rows the batch has — an empty malformed batch is an error,
    not a silent no-op commit."""
    import pyspark.sql.functions as F

    from data_lake_for_citi_bike_trip_spark.sources.txn import TxnTable

    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = TxnTable.create(spark, str(tmp_path / "t"), base, key="k")
    bad = spark.range(0).select(
        F.col("id").alias("k"),
        F.lit(1).cast("bigint").alias("seq"),
        F.lit("U").alias("op"),
        # lacks "v"
    )
    with pytest.raises(ValueError, match="lacks table columns"):
        t.merge(spark, bad, "seq", "op")


def test_negative_samples_one_part_catalog(spark):
    """A one-part catalog whose only key is 0 makes max_pk == 0 — the
    draw modulo must stay defined (greatest guard), not REMAINDER_BY_ZERO."""
    import pyspark.sql.functions as F

    from data_lake_for_citi_bike_trip_spark.operators import corpus

    lineitem = spark.range(1).select(
        F.lit(7).alias("l_orderkey"), F.lit(0).alias("l_partkey")
    )
    part = spark.range(1).select(F.lit(0).alias("p_partkey"))
    out = corpus.negative_samples(lineitem, part).collect()
    assert all(r["neg_pk"] == 1 for r in out)  # % 1 + 1 == 1, never crashes


def test_null_payload_classes(spark):
    """NULL-payload tolerance: NULL blobs drop out of decode stages,
    NULL embeddings out of vector stats, NULL event_type out of map
    keys, NULL value out of the balance walk — none may raise. Pins the
    classes the all-NULL sweep (make_degenerate nulls) found."""
    import pyspark.sql.functions as F

    from data_lake_for_citi_bike_trip_spark.operators import (
        analytics,
        behavior,
        multimodal,
        similarity,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id bigint, n_chars bigint"
    )
    media = multimodal.synthetic_bmp_table(docs).select(
        "media_id",
        F.when(F.col("media_id") == 1, F.lit(None))
        .otherwise(F.col("payload"))
        .cast("binary")
        .alias("payload"),
    )
    decoded = multimodal.decode_images(media).collect()
    assert [r["media_id"] for r in decoded] == [2]

    emb = spark.range(2).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") == 0, F.array(F.lit(1.0), F.lit(2.0))).alias(
            "embedding"
        ),
    )
    rows = similarity.arrow_vector_stats(emb).collect()
    assert [r["vec_id"] for r in rows] == [0]

    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, None, None),
         (1, "2024-01-01 01:00:00", 2, "purchase", 5.0)],
        "user_id bigint, ts string, event_id bigint, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = behavior.capped_running_sum(events).first()
    assert r["n_events"] == 2 and r["final_balance"] == 0  # purchase debits clamp at 0

    m = analytics.map_rollup(events).collect()
    assert all(row["event_type"] is not None for row in m)

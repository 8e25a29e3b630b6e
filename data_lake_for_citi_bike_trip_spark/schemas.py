"""Explicit StructType schemas.

The reference reads CSV with ``header=True`` and never ``inferSchema``
(spark_elt_emr.py:32,48,55), so every CSV column lands as StringType, and
its JSON read relies on a schema-inference pass (:41). At 100 TB an
inference pass is a full extra scan and all-string columns defeat filter
pushdown — we declare schemas explicitly (SURVEY.md §1.5).

Two schema families live here:

1. The four reference staging sources (FIXTURES.md §1-4). ``LEGACY_STRING``
   variants keep the reference's all-string runtime types for
   bit-compatibility; typed variants are what a new deployment should use.
2. The driver's synthetic testdata tables (TESTDATA.md) — declared so scans
   prune columns at the parquet footer instead of trusting inference.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(pairs: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in pairs])


# ---------------------------------------------------------------------------
# Reference staging sources (FIXTURES.md). Column names are post-rename
# (spaces->underscores for trips, lowercase for covid; see sources.readers).
# ---------------------------------------------------------------------------

S = T.StringType()

TRIPS_LEGACY_STRING = _struct(
    [
        ("tripduration", S),
        ("starttime", S),
        ("stoptime", S),
        ("start_station_id", S),
        ("start_station_name", S),
        ("start_station_latitude", S),
        ("start_station_longitude", S),
        ("end_station_id", S),
        ("end_station_name", S),
        ("end_station_latitude", S),
        ("end_station_longitude", S),
        ("bikeid", S),
        ("usertype", S),
        ("birth_year", S),
        ("gender", S),
    ]
)

TRIPS_TYPED = _struct(
    [
        ("tripduration", T.IntegerType()),
        ("starttime", T.TimestampType()),
        ("stoptime", T.TimestampType()),
        ("start_station_id", S),
        ("start_station_name", S),
        ("start_station_latitude", T.DoubleType()),
        ("start_station_longitude", T.DoubleType()),
        ("end_station_id", S),
        ("end_station_name", S),
        ("end_station_latitude", T.DoubleType()),
        ("end_station_longitude", T.DoubleType()),
        ("bikeid", S),
        ("usertype", S),
        ("birth_year", T.IntegerType()),
        ("gender", T.IntegerType()),
    ]
)

STATIONS_LEGACY_STRING = _struct(
    [("_c0", S)]
    + [
        (name, S)
        for name in (
            "station_id external_id name short_name region_id legacy_id "
            "station_type lat lon capacity has_kiosk "
            "electric_bike_surcharge_waiver eightd_has_key_dispenser "
            "rental_methods"
        ).split()
    ]
)

COVID_LEGACY_STRING = _struct(
    [("_c0", S), ("date_of_interest", S)]
    + [
        (name, S)
        for name in (
            "case_count probable_case_count bx_case_count "
            "bx_probable_case_count bk_case_count bk_probable_case_count "
            "mn_case_count mn_probable_case_count qn_case_count "
            "qn_probable_case_count si_case_count si_probable_case_count "
            "incomplete"
        ).split()
    ]
)

# Weather JSON: the reference schema-infers (spark_elt_emr.py:41); we pin
# the inferred shape (FIXTURES.md §4) so the inference scan is skipped.
WEATHER = _struct(
    [
        ("valid_time_gmt", T.LongType()),
        ("temp", T.LongType()),
        ("dewPt", T.LongType()),
        ("rh", T.LongType()),
        ("day_ind", S),
        ("wspd", T.LongType()),
        ("gust", T.LongType()),
        ("pressure", T.DoubleType()),
        ("precip_hrly", T.DoubleType()),
        ("wx_phrase", S),
    ]
)


# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md). `events.ts` is stored as parquet
# TIMESTAMP(NANOS) which Spark 4 reads as int64 nanos under
# spark.sql.legacy.parquet.nanosAsLong; the registry converts it.
# ---------------------------------------------------------------------------

TESTDATA = {
    "region": _struct([("r_regionkey", T.IntegerType()), ("r_name", S)]),
    "nation": _struct(
        [
            ("n_nationkey", T.IntegerType()),
            ("n_name", S),
            ("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": _struct(
        [
            ("c_custkey", T.LongType()),
            ("c_name", S),
            ("c_nationkey", T.IntegerType()),
            ("c_acctbal", T.DoubleType()),
            ("c_mktsegment", S),
        ]
    ),
    "supplier": _struct(
        [
            ("s_suppkey", T.LongType()),
            ("s_name", S),
            ("s_nationkey", T.IntegerType()),
            ("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": _struct(
        [
            ("p_partkey", T.LongType()),
            ("p_name", S),
            ("p_brand", S),
            ("p_type", S),
            ("p_size", T.IntegerType()),
            ("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": _struct(
        [
            ("o_orderkey", T.LongType()),
            ("o_custkey", T.LongType()),
            ("o_orderstatus", S),
            ("o_totalprice", T.DoubleType()),
            ("o_orderdate", T.TimestampNTZType()),
            ("o_orderpriority", S),
        ]
    ),
    "lineitem": _struct(
        [
            ("l_orderkey", T.LongType()),
            ("l_partkey", T.LongType()),
            ("l_suppkey", T.LongType()),
            ("l_linenumber", T.IntegerType()),
            ("l_quantity", T.DoubleType()),
            ("l_extendedprice", T.DoubleType()),
            ("l_discount", T.DoubleType()),
            ("l_tax", T.DoubleType()),
            ("l_returnflag", S),
            ("l_linestatus", S),
            ("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": _struct(
        [
            ("event_id", T.LongType()),
            ("ts", T.LongType()),  # raw int64 nanos; registry converts
            ("user_id", T.LongType()),
            ("event_type", S),
            ("value", T.DoubleType()),
            ("props", S),
        ]
    ),
    "documents": _struct(
        [
            ("doc_id", T.LongType()),
            ("text", S),
            ("lang", S),
            ("source", S),
            ("n_chars", T.LongType()),
        ]
    ),
    "embeddings": _struct(
        [
            ("vec_id", T.LongType()),
            ("embedding", T.ArrayType(T.FloatType())),
            ("label", T.IntegerType()),
        ]
    ),
}

#: Star-schema output partitioning (SURVEY.md §1.2): table -> (partition
#: columns, write mode). The append tables use dynamic partition overwrite
#: for idempotent monthly re-runs (SURVEY.md §2.12 #4).
OUTPUT_LAYOUT = {
    "bikeshare_fact_table": (["year", "month"], "overwrite_partitions"),
    "dim_time_table": (["year", "month"], "overwrite_partitions"),
    "dim_user_agg_table": (["usertype", "birth_year"], "overwrite"),
    "dim_bike_table": ([], "overwrite"),
    "dim_covid_table": ([], "overwrite"),
    "dim_weather_table": ([], "overwrite"),
    "dim_station": ([], "overwrite"),
}

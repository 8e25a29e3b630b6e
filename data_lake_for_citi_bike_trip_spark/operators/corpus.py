"""Corpus-level data-prep operators for training pipelines.

Deterministic-by-hash everywhere: splits and samples must be reproducible
across runs, engines, and cluster sizes, so nothing here uses rand() —
assignment is pure arithmetic on md5 of a stable key. That also makes
every operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..session import spread

#: scrubbing patterns (mirrored verbatim in the DuckDB oracle)
URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def hash_bucket(key, buckets: int = 100):
    """Stable bucket in [0, buckets): first 8 md5 hex chars mod buckets."""
    return TX.token_hash32(key.cast("string")) % buckets


def train_test_split(
    docs: DataFrame, val_pct: int = 10, test_pct: int = 10, salt: str = "split-v1"
) -> DataFrame:
    """Reproducible three-way split keyed on md5(doc_id || salt).

    Salted so re-splitting with a new salt reshuffles; bucket arithmetic
    (not rand()) so membership is stable under any partitioning/retry.
    """
    bucket = hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", bucket.cast("bigint").alias("bucket"), split.alias("split"))


def sample_by_hash(docs: DataFrame, pct: int = 10, salt: str = "sample-v1") -> DataFrame:
    """Deterministic pct% sample (same keys selected on every run/engine)."""
    bucket = hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    return docs.where(bucket < pct).select("doc_id", "lang", "n_chars")


def vocabulary(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """Corpus vocabulary: token document-frequency and collection-frequency,
    top-k by collection frequency (deterministic tie-break on token).

    explode -> two-level aggregate: the shuffle carries (token, partial
    counts) after map-side combine; top-k is a single window over the
    aggregated (small) vocab table.
    """
    exploded = spread(docs).select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    counts = exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("cf"),
        F.count_distinct("doc_id").alias("df"),
    )
    # distributed top-k (TakeOrderedAndProject), then rank the k survivors —
    # a global row_number window would single-partition the whole vocab
    topk = counts.orderBy(F.desc("cf"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("cf"), F.asc("token"))
    return topk.withColumn("rank", F.row_number().over(w).cast("bigint"))


def scrub_text(docs: DataFrame) -> DataFrame:
    """PII/URL scrubbing: emails then URLs replaced with sentinel tokens.

    Order matters (emails first — a URL pattern could otherwise eat an
    embedded email); single regexp_replace pass each, whole-stage codegen.
    """
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_PATTERN, "<EMAIL>"),
        URL_PATTERN,
        "<URL>",
    )
    return docs.select(
        "doc_id",
        scrubbed.alias("clean_text"),
        (F.length("text") - F.length(scrubbed)).cast("bigint").alias("chars_removed"),
    )


def length_histogram(docs: DataFrame, bucket_chars: int = 100) -> DataFrame:
    """Doc-length histogram (fixed-width buckets) — the size profile a
    pipeline uses to set batch/sequence budgets."""
    # integer div, not float-div-then-cast: double->bigint casts truncate in
    # Spark but round in DuckDB
    bucket = F.expr(f"n_chars div {bucket_chars}")
    return docs.groupBy(bucket.alias("len_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )

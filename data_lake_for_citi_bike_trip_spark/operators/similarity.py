"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``  — brute-force exact top-k: queries broadcast against
  the corpus, per-query window rank. The baseline; at 100 TB this is the
  map-side-only plan (corpus never shuffles — the tiny query set is the
  broadcast side, ranking shuffles only (q, k) candidate rows if AQE
  chooses; acceptable because output is q*k rows).
- ``lsh_bucket_topk`` — the scale path: corpus pre-bucketed by a
  deterministic sign-pattern LSH; each query probes only its bucket, so
  per-query work drops by the bucket fan-out (2^bits). Recall/latency is
  tuned by ``bucket_bits`` (fewer bits = higher recall, more work). An
  IVF variant (k-means centroids) slots into the same shape with learned
  buckets.

Ordering is on round(cos, 6) with vec_id tie-break — deterministic and
cross-engine stable (see oracles.py parity rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..session import spread


def _prepared(embeddings: DataFrame) -> DataFrame:
    return spread(embeddings).select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    )


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force)."""
    corpus = _prepared(embeddings)
    q = _prepared(queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        V.cosine_r6(F.col("qv"), F.col("v")).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def lsh_bucket_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, bucket_bits: int = 8
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-pattern bucket."""
    corpus = _prepared(embeddings).withColumn(
        "bucket", V.sign_bucket(F.col("v"), bucket_bits)
    )
    q = (
        _prepared(queries)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
        .withColumn("bucket", V.sign_bucket(F.col("qv"), bucket_bits))
    )
    scored = corpus.join(F.broadcast(q), "bucket").where(
        F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        "vec_id",
        V.cosine_r6(F.col("qv"), F.col("v")).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )

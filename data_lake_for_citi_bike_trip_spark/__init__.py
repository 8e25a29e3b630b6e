"""data_lake_for_citi_bike_trip_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of the reference repo ``eulyzi/Data-Lake-for-Citi-Bike-Trip``
(surveyed in ``SURVEY.md``), re-expressed on the DataFrame/SQL API so the
logical plan is declared and Catalyst/Tungsten pick the physical strategy.

Layout
------
- ``session``    — SparkSession factory + runtime configuration (UTC, AQE).
- ``schemas``    — explicit StructType schemas (staging sources + testdata).
- ``sources``    — readers (csv/json/parquet), the table registry, writers
                   (partitioned parquet matrix with dynamic overwrite).
- ``functions``  — reusable column expressions (surrogate keys, text
                   shingles/hashes, vector math).
- ``operators``  — the query library: star-schema builds, analytics,
                   dedup (exact/MinHash/SimHash/Jaccard/embedding),
                   similarity search, text analysis, as-of/range joins,
                   multimodal column plumbing.
- ``plans``      — declarative data-quality checks + plan introspection.
- ``streaming``  — Structured Streaming pipelines (watermarked windows).

Everything here is public-API PySpark only; no custom Catalyst rules are
required for reference parity (SURVEY.md §4).
"""

__version__ = "0.1.0"

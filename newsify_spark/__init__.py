"""newsify_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of devgargd7/Newsify (reference snapshot
2025-03-14), re-expressed Spark-first.

The reference is a news aggregation + recommendation pipeline (Kafka +
MongoDB + Redis microservices with one PySpark ALS job). This package
re-implements every dataflow operator it contains as idiomatic Spark
DataFrame / SQL / Structured Streaming / MLlib programs, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that a 100 TB deployment needs.

Layout:
    session     — SparkSession factory tuned for local[32] testing and
                  cluster-scale defaults (AQE, UTC, Arrow).
    tables      — parquet fixture loading helpers.
    functions/  — column-level helpers (vector math, text, scalars).
    operators/  — reusable DataFrame->DataFrame operators (top-k, similarity
                  join, dedup family, merge/upsert writers, clustering).
    ml/         — MLlib ALS pipeline + deterministic inference stubs.
    streaming/  — watermarked dedup + foreachBatch stateful clustering.
    queries/    — the named query registry backing __spark_entry__.py.
"""

__version__ = "0.1.0"

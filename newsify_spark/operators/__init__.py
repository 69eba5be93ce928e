from newsify_spark.operators import dedup, merge, similarity, topk  # noqa: F401

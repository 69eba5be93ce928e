"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hybrid-recommendation query on
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full registry in
``newsify_spark.queries`` — one entry per implemented operator from
SURVEY.md §2 (oracle-checked where SQL-expressible, rows-only for
model-bound ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from newsify_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from newsify_spark.queries.recommend import hybrid_recommendations

    return hybrid_recommendations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle}

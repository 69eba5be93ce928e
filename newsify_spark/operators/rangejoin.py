"""Banded range join — equi-join-free interval matching at scale.

Spark turns a pure inequality join (a.ts BETWEEN b.lo AND b.hi) into a
BroadcastNestedLoopJoin (fine when one side broadcasts) or a cartesian
product (disaster). The scalable pattern: quantize the range key into
fixed-width buckets, equi-join on bucket id (replicating each interval
into every bucket it overlaps), then apply the exact predicate. Cost is
|rows| * avg_buckets_per_interval through one hash shuffle, never a
cross product; AQE can split skewed buckets.

Not in the reference (SURVEY §2.3: no range joins) — engine extension
for the time-series/training-data north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    lo: str,
    hi: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row (numeric/epoch ``point_key``) to every interval
    row with lo <= point <= hi. ``bucket_width`` in the key's units;
    choose ~ the typical interval length so replication stays small.
    """
    p = points.withColumn("__b", (F.col(point_key) / bucket_width).cast("long"))
    i = intervals.withColumn(
        "__bs",
        F.sequence(
            (F.col(lo) / bucket_width).cast("long"),
            (F.col(hi) / bucket_width).cast("long"),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    j = p.join(i, "__b", how).filter(
        (F.col(point_key) >= F.col(lo)) & (F.col(point_key) <= F.col(hi))
    )
    return j.drop("__b")

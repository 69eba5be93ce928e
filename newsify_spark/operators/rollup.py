"""Incremental rollup maintenance: re-aggregate from pre-aggregated
partials instead of rescanning raw data.

The 100 TB pattern: a nightly job appends one day-partition of partials
(sum/count/min/max per key — every metric kept in a MERGEABLE form);
coarser rollups (week/month, or the same grain after late data) are then
computed from partials alone. A month-end rollup over 30 daily partials
reads |keys|×30 rows instead of the month's raw events — typically a
4-6 order-of-magnitude scan reduction.

Correctness hinges on using only decomposable aggregates: sum-of-sums,
sum-of-counts, min-of-mins, max-of-maxs are exact; avg must be carried
as (sum, count) and finalized at read time (an avg-of-avgs is wrong
whenever group sizes differ). That is exactly how Spark's own partial
aggregation works (partial_sum/partial_count before the exchange) —
this operator applies the same algebra across JOBS rather than across
tasks, and the oracle-checked query (queries/extra.rel_incremental_rollup)
pins partial-then-merge equal to direct-from-raw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# metric name -> (partial aggregate over raw, merge aggregate over partials)
_ALGEBRA: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_rollup(
    raw: DataFrame, keys: list[str], value: str | Column, metrics: list[str]
) -> DataFrame:
    """One grain's partials: every metric in mergeable form. ``avg`` is
    accepted as sugar and stored as sum+count."""
    needed = set(metrics)
    if "avg" in needed:
        needed |= {"sum", "count"}
        needed.discard("avg")
    aggs = [_ALGEBRA[m][0](value).alias(f"{m}_p") for m in sorted(needed)]
    return raw.groupBy(*keys).agg(*aggs)


def merge_rollups(partials: DataFrame, keys: list[str], metrics: list[str]) -> DataFrame:
    """Collapse partials to a coarser grain (fewer key columns, or the
    same keys across more input partitions/days). Pure partial-agg
    merge: shuffles |partials| rows, never raw data."""
    needed = set(metrics)
    finalize_avg = "avg" in needed
    if finalize_avg:
        needed |= {"sum", "count"}
        needed.discard("avg")
    aggs = [_ALGEBRA[m][1](f"{m}_p").alias(f"{m}_p") for m in sorted(needed)]
    out = partials.groupBy(*keys).agg(*aggs)
    if finalize_avg:
        out = out.withColumn("avg_p", F.col("sum_p") / F.col("count_p"))
    return out

"""Frequent-items (heavy hitters) via a mergeable Misra-Gries sketch.

The φ-heavy-hitters problem — every item with frequency >= φ·N — is a
corpus/telemetry staple (vocabulary heads, hot keys, skew detection: the
same hot users/buckets the skew guards in operators.similarity and
operators.dedup cap). The naive plan is a full groupBy over all distinct
items; at 100 TB with billions of distinct keys that shuffle dwarfs the
answer, which is at most 1/φ items.

Two-phase plan (no full-cardinality shuffle):

1. SKETCH, map-side only: each partition folds its rows into a
   Misra-Gries summary of capacity k = ceil(capacity_factor/φ) inside
   one mapInPandas pass — O(k) memory per partition, zero shuffle, and
   each Arrow batch is pre-aggregated with value_counts before entering
   the summary (vectorized; the MG decrement applies to batch counts,
   the standard mergeable-summaries form).
2. EXACT RECOUNT: the unioned candidate set (≤ partitions·k rows,
   broadcastable) semi-joins the raw column; an exact groupBy over just
   the candidates (map-side combine, tiny shuffle) yields true counts,
   filtered to count >= φ·N.

Correctness of candidate generation (no false negatives): an item with
global count >= φ·N = φ·Σn_p must, by pigeonhole, have count_p >= φ·n_p
in at least one partition p; a Misra-Gries summary of capacity k retains
every item with in-partition count > n_p/(k+1), and φ·n_p > n_p/(k+1)
whenever k+1 > 1/φ. So with k >= 1/φ the union of per-partition
summaries contains EVERY true heavy hitter, and the exact recount makes
the final output exact — which is why the query built on this operator
is DuckDB-oracle-checkable despite the sketch route
(``capacity_factor`` > 1 just widens the margin).

Reference: Agarwal et al., "Mergeable Summaries" (PODS'12) — the MG
merge (combine counters, subtract the (k+1)-th largest, drop
non-positive) preserves the error bound; per-partition summaries here
are exactly that merge applied batch-wise.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(summary: dict, batch_counts, k: int) -> dict:
    """Merge pre-aggregated (item -> count) into a capacity-k MG summary:
    combine, then subtract the (k+1)-th largest count and drop the
    non-positive remainder (Agarwal et al. merge step)."""
    for item, c in batch_counts.items():
        summary[item] = summary.get(item, 0) + int(c)
    if len(summary) > k:
        cut = sorted(summary.values(), reverse=True)[k]
        summary = {i: c - cut for i, c in summary.items() if c > cut}
    return summary


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi: float,
    n_rows: int | None = None,
    capacity_factor: float = 2.0,
) -> DataFrame:
    """(item, cnt) for every item with EXACT count >= phi * N.

    ``n_rows`` skips the sizing count; ``capacity_factor`` scales the
    per-partition summary above the 1/phi minimum the no-false-negative
    guarantee needs. Output counts are exact (see module docstring).
    """
    import pandas as pd

    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    n = n_rows if n_rows is not None else df.count()
    k = max(1, math.ceil(capacity_factor / phi))

    def sketch(it):
        summary: dict = {}
        for pdf in it:
            summary = _mg_fold(summary, pdf[col].value_counts().to_dict(), k)
        yield pd.DataFrame({col: list(summary.keys())})

    src = df.select(col)
    dt = dict(src.dtypes)[col]
    cands = src.mapInPandas(sketch, schema=f"{col} {dt}").distinct()
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(phi) * F.lit(float(n)))
    )

"""Top-k-per-group — the window idiom behind the reference's sort+slice
loops (W1/W2: duplication_service.py:81-84 argmax, recommendation-
trainer.py:169-170 top-10 slice).

At scale this is a single shuffle on the partition keys; rank+filter runs
map-side within each partition after the shuffle, and AQE handles skewed
groups. For very hot groups (one user with millions of candidates) prefer
pre-aggregating candidates before ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rnk",
    keep_rank: bool = False,
) -> DataFrame:
    """row_number() over (partition by group order by order_cols) <= k.

    Callers MUST pass a total order (include a unique tiebreaker column)
    when results feed the DuckDB oracle, otherwise ties are
    nondeterministic across engines.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def argmax_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Top-1 (the reference's np.argmax over similarities, W1)."""
    return top_k_per_group(df, group_cols, order_cols, 1)

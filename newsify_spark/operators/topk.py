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
    if not group_cols:
        # ungrouped top-k: route to TakeOrderedAndProject instead of a
        # single-partition WindowExec (VERDICT round-3 item #8)
        return global_top_k(df, order_cols, k, rank_col if keep_rank else None)
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def global_top_k(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Global (ungrouped) top-k. ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — each partition keeps a k-row heap and the
    driver merges heaps — instead of the single-partition WindowExec that
    ``top_k_per_group(df, [], ...)`` produces (VERDICT round-3 item #8).

    If ``rank_col`` is given, ranks are minted AFTER the limit over the
    k-row result — one-partition sort + monotonically_increasing_id,
    which is consecutive from 0 within partition 0, so id+1 IS the
    row_number. No WindowExec at all: a constant partitionBy would not
    help (Catalyst folds literal partition keys away and the empty-spec
    warning returns), and the expensive part already ran as
    TakeOrderedAndProject. Callers must pass a total order (unique
    tiebreaker) for deterministic ranks, as with top_k_per_group.
    """
    out = df.orderBy(*order_cols).limit(k)
    if rank_col is not None:
        out = (
            out.repartition(1)
            .sortWithinPartitions(*order_cols)
            .withColumn(
                rank_col, (F.monotonically_increasing_id() + 1).cast("int")
            )
        )
    return out


def argmax_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Top-1 (the reference's np.argmax over similarities, W1)."""
    return top_k_per_group(df, group_cols, order_cols, 1)

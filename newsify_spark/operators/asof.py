"""As-of join — the temporal lookup join Spark lacks natively.

Not in the reference's operator set (SURVEY §2.3 notes its absence), but
required by the engine's north star (time-series enrichment at 100 TB).

Implementation: the scalable union+window idiom, NOT merge_asof-per-group:
tag both sides, union, then one window per key ordered by (time, side)
carrying the right side's payload forward with last(ignorenulls). Cost is
a single shuffle on the key — same as the equi join you'd pay anyway —
and it never materializes a per-key cross product. Skewed keys behave
like any window (AQE does not split windows, so extremely hot keys would
need a coarse time-bucket pre-partition; noted for 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    inclusive: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    right_time <= left_time (strictly < when inclusive=False) within the
    same ``on`` key. Left rows with no prior right row keep NULL payloads
    (left-join semantics, matching DuckDB's ASOF LEFT JOIN oracle).

    ``direction='forward'`` flips the semantics: the EARLIEST right row
    with right_time >= left_time (next-event-after — SLA lookups, next
    maintenance window, label-at-horizon joins). Same plan shape: the
    window just traverses time descending, so cost is identical.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # side marker orders equal timestamps: right rows first when
    # inclusive (so a left row at t sees a right row at t), after when not.
    # The payload travels as ONE struct so a single last(ignorenulls)
    # attaches the whole latest right row — per-column fills would mix
    # columns from different right rows whenever a payload value is NULL
    # (ADVICE round-1; DuckDB ASOF attaches the row, NULLs included).
    lcols = left.columns
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0 if inclusive else 2).alias("__side"),
        F.struct(*payload_cols).alias("__p"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    u = l.unionByName(r)
    # forward = the same carry-forward traversal over DESCENDING time:
    # the first right row at-or-after each left row is the last one seen
    # walking from the future backwards. The __side marker keeps
    # equal-timestamp semantics identical in both directions (right rows
    # visited before left at the same t iff inclusive).
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "__l",
        "__side",
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__p")[c].alias(c) for c in payload_cols],
    )
    return out

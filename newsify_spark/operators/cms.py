"""Count-Min sketch — mergeable point-frequency estimates.

The third sketch in the engine's mergeable-summary family: HLL
(operators/rollup.py) answers "how many distinct", Misra-Gries
(operators/frequent.py) answers "which keys are heavy", Count-Min
(Cormode & Muthukrishnan, J.Alg 2005) answers "how often does THIS key
occur" in d*w counters regardless of stream size — the structure
streaming frequency caps, per-key rate limits, and join-skew detectors
keep per window at 100 TB.

Spark-first shape: the sketch IS a (row, col, cnt) DataFrame.

- BUILD: d hash positions per item (md5-derived, the same
  cross-engine-portable hashing the MinHash/shard operators use) ->
  groupBy(row, col) count — one partial-agg-combined shuffle carrying
  at most d*w rows per map partition.
- MERGE: counter-wise sum — union + the same groupBy. Per-day or
  per-partition sketches compose exactly (the algebra that makes the
  sketch a rollup-friendly column, like the HLL rollup).
- ESTIMATE: min over the d counters a key hashes to — one equi join
  against the d*w-bounded sketch (broadcastable at any realistic w).

Guarantees: estimates NEVER undercount (every counter upper-bounds the
true count); overcount <= (e/w)*N with probability 1-(1/e)^d. Both are
pinned in tests; the whole build/estimate chain is deterministic
expressions, so it is hash-checked end to end against a DuckDB oracle
(queries/llmops.py::doc_cms_token_counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_pos(key_col: str | Column, row: int, width: int) -> Column:
    """Column: the sketch column this key hashes to in ``row`` —
    md5('<row>|<key>') high 8 hex chars as a long, mod width. Mirrored
    exactly by CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) % w in
    DuckDB."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    d = F.md5(F.concat_ws("|", F.lit(str(row)), key))
    return F.conv(F.substring(d, 1, 8), 16, 10).cast("long") % width


def cm_build(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(r, c, cnt) sketch rows from a stream of key occurrences (one
    input row = one occurrence). At most depth*width rows come out of
    the aggregation no matter the input size."""
    pos = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), cm_pos(key_col, r, width).alias("c")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    )
    return (
        pos.select(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise sum — sketches over disjoint streams compose to the
    sketch of the union, exactly."""
    return (
        a.unionByName(b).groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, est): min over the key's d counters. ``keys`` should be
    distinct; the join side is the d*w-bounded sketch (broadcast).

    Counters the sketch never touched are EMPTY rows in the sparse
    (r, c, cnt) representation — they mean 0, not "absent", so the
    lookup is a LEFT join with coalesce(cnt, 0): a never-seen key whose
    cells are all empty estimates 0 (true CMS), and a key hashing to
    >=1 empty cell keeps the (e/w)*N overcount bound instead of taking
    min() over only its occupied cells."""
    pos = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), cm_pos(key_col, r, width).alias("c")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.r").alias("r"), F.col("p.c").alias("c"))
    return (
        pos.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)).cast("long")).alias("est"))
    )

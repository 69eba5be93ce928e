"""MMR (maximal marginal relevance) diversification re-rank.

Reference parity: the reference MEASURES recommendation diversity in its
bias report (bias_detection_service.py computes a diversity ratio; this
repo's `rec_bias_report`) but never ACTS on it. MMR is the standard
serving-layer action: greedily pick the item maximizing
``lam * relevance - (1 - lam) * max_similarity_to_already_picked`` —
relevance-ordered results without near-duplicate items (Carbonell &
Goldstein, SIGIR'98).

Spark-first shape: MMR is sequential in k, but k is the SERVING page
size (3-10) while users are millions — so the right distribution is to
UNROLL the k greedy steps into k relational stages (each one join +
group-max + per-user top-1), all keyed by user. The Python ``for`` loop
below builds the PLAN (k iterations); no data ever reaches the driver
and every stage shuffles only per-user candidate pools. Candidate pools
are pre-bounded (pool_k per user) upstream, so pairwise similarity is
pool_k² per user — serving-sized, not corpus-sized.

Everything is expressions (cosine via the fold-form HOF, rounded 6 dp
before every ranking), so the full greedy chain is deterministic and
reproduced in a DuckDB oracle as unrolled CTEs
(queries/recommend.py::rec_mmr_rerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.functions.vectors import cosine
from newsify_spark.operators.topk import top_k_per_group


def mmr_rerank(
    cand: DataFrame,
    k: int = 3,
    lam: float = 0.7,
    user_col: str = "user_id",
    item_col: str = "item",
    rel_col: str = "rel",
    vec_col: str = "vec",
) -> DataFrame:
    """Greedy MMR over per-user candidate pools.

    ``cand``: (user, item, rel, vec) — rel MUST already be rounded (6 dp)
    by the caller so ranking is engine-stable. Returns
    (user, rk 1..k, item, score) where score is rel for the first pick
    and the rounded MMR objective afterwards. Users with fewer than k
    candidates yield fewer rows.
    """
    a = cand.select(
        user_col, F.col(item_col).alias("_ia"), F.col(vec_col).alias("_va")
    )
    b = cand.select(
        user_col, F.col(item_col).alias("_ib"), F.col(vec_col).alias("_vb")
    )
    sims = (
        a.join(b, user_col)
        .filter(F.col("_ia") != F.col("_ib"))
        .select(
            user_col,
            "_ia",
            "_ib",
            F.round(cosine("_va", "_vb"), 6).alias("_s"),
        )
    )

    first = top_k_per_group(
        cand, [user_col], [F.col(rel_col).desc(), F.col(item_col).asc()], 1
    ).select(
        user_col,
        F.lit(1).alias("rk"),
        item_col,
        F.col(rel_col).alias("score"),
    )
    picks = first
    chosen = first.select(user_col, item_col)

    for step in range(2, k + 1):
        rem = cand.join(chosen, [user_col, item_col], "left_anti")
        # max similarity of each remaining item to ANY chosen item
        maxsim = (
            sims.join(
                chosen.withColumnRenamed(item_col, "_ib"), [user_col, "_ib"]
            )
            .groupBy(user_col, "_ia")
            .agg(F.max("_s").alias("_ms"))
            .withColumnRenamed("_ia", item_col)
        )
        scored = rem.join(maxsim, [user_col, item_col]).withColumn(
            "score",
            F.round(
                F.lit(lam) * F.col(rel_col) - F.lit(1.0 - lam) * F.col("_ms"), 6
            ),
        )
        pick = top_k_per_group(
            scored, [user_col], [F.col("score").desc(), F.col(item_col).asc()], 1
        ).select(user_col, F.lit(step).alias("rk"), item_col, "score")
        picks = picks.unionByName(pick)
        chosen = chosen.unionByName(pick.select(user_col, item_col))

    return picks

"""Rank fusion for multi-leg retrieval.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal Rank
Fusion outperforms Condorcet and individual Rank Learning Methods",
SIGIR 2009) is the production-default way to combine heterogeneous
rankers — lexical BM25, embedding ANN, recency/popularity — because it
needs no score normalization across legs: each leg contributes
1/(k0 + rank) and the sums re-rank. Elasticsearch, OpenSearch and Vespa
ship exactly this as their hybrid-search default.

Spark shape: legs are (query_id, item_id, rank) DataFrames (any
``vec_knn_*`` index, ``bm25_topk``, or a window-ranked popularity table
produces one); fusion is a union + per-(query, item) aggregate + top-k
window — all partial-aggregating on the (query, item) key, no leg ever
re-scored. At 100 TB the legs are each already k-bounded per query, so
the fusion input is |queries| x k x n_legs rows — serving-sized
regardless of corpus size.

The reference serves stories by one ranker at a time
(recommendation-service.py); this is the composed multi-ranker serving
stack its UI would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.operators.topk import top_k_per_group


def rrf_fuse(
    legs: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    query_col: str = "query_id",
    item_col: str = "doc_id",
    rank_col: str = "r",
    round_dp: int = 6,
) -> DataFrame:
    """Fuse ranked legs into (query, item, rrf_score, n_legs, rank).

    Each leg must carry (query_col, item_col, rank_col) with rank
    starting at 1; extra columns are dropped. ``n_legs`` counts how many
    legs returned the item (consensus signal). Scores round to
    ``round_dp`` before the final ranking so float-sum order agrees
    across engines (ties break on item id) — the same contract every
    oracle-checked ranking in the registry follows.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one ranked leg")
    contrib = None
    for leg in legs:
        c = leg.select(
            F.col(query_col),
            F.col(item_col),
            (F.lit(1.0) / (F.lit(k0) + F.col(rank_col))).alias("_c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    fused = contrib.groupBy(query_col, item_col).agg(
        F.round(F.sum("_c"), round_dp).alias("rrf_score"),
        F.count("*").alias("n_legs"),
    )
    return top_k_per_group(
        fused,
        [query_col],
        [F.col("rrf_score").desc(), F.col(item_col).asc()],
        k,
        rank_col="rank",
        keep_rank=True,
    )

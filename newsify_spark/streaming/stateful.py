"""T4 stateful online clustering via applyInPandasWithState — the
message-at-a-time fidelity path.

The foreachBatch body (streaming.pipeline) approximates the reference's
sequencing to within a micro-batch (2-pass). This operator reproduces it
EXACTLY: articles are processed one by one against the evolving centroid
state, precisely duplication_service.py:142-170 + 74-92 — assign to the
nearest story if cosine > τ, else mint a new story that immediately
becomes a candidate for the next article.

State shape (GroupState supports flat structs of arrays): story ids,
member counts, centroids flattened row-major, the next story ordinal,
and dim. A single state key carries global story state, matching the
reference's one consumer process; a sharded deployment would key by
topic/category and merge periodically (the batch-cluster-refinement
stage exists for exactly that reconciliation).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "article_id string, story_id string, similarity double, is_new boolean"
STATE_SCHEMA = (
    "ids array<string>, counts array<int>, flat array<double>, next_id int, dim int"
)


def assign_sequential(
    articles: list[tuple[str, np.ndarray]],
    ids: list[str],
    counts: list[int],
    cents: list[np.ndarray],
    next_id: int,
    threshold: float,
) -> tuple[list[dict], int]:
    """The reference loop, verbatim semantics: per article, cosine vs ALL
    current centroids, argmax, threshold; matched stories update their
    running-mean centroid; misses mint story_{next_id}. Mutates
    ids/counts/cents in place; returns (assignments, next_id)."""
    out = []
    for aid, v in articles:
        nv = np.linalg.norm(v)
        best_i, best_sim = -1, -1.0
        if cents:
            mat = np.stack(cents)
            norms = np.linalg.norm(mat, axis=1) * (nv if nv > 0 else 1.0)
            norms[norms == 0] = 1.0
            sims = (mat @ v) / norms
            best_i = int(np.argmax(sims))
            best_sim = float(sims[best_i])
        if best_i >= 0 and best_sim > threshold:
            n = counts[best_i]
            cents[best_i] = (cents[best_i] * n + v) / (n + 1)
            counts[best_i] = n + 1
            out.append(
                {"article_id": aid, "story_id": ids[best_i], "similarity": best_sim, "is_new": False}
            )
        else:
            sid = f"story_{next_id}"
            next_id += 1
            ids.append(sid)
            counts.append(1)
            cents.append(v.astype(np.float64))
            out.append(
                {"article_id": aid, "story_id": sid, "similarity": 1.0, "is_new": True}
            )
    return out, next_id


def _make_fn(threshold: float):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, counts, flat, next_id, dim = state.get
            ids, counts = list(ids), list(counts)
            cents = [
                np.array(flat[i * dim : (i + 1) * dim], dtype=np.float64)
                for i in range(len(ids))
            ]
        else:
            ids, counts, cents, next_id, dim = [], [], [], 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values("article_id", key=lambda s: s.astype("int64"))
            articles = [
                (str(a), np.asarray(list(v), dtype=np.float64))
                for a, v in zip(pdf["article_id"], pdf["embedding"])
            ]
            if articles and dim == 0:
                dim = len(articles[0][1])
            out, next_id = assign_sequential(
                articles, ids, counts, cents, next_id, threshold
            )
            yield pd.DataFrame(out)
        flat = [float(x) for c in cents for x in c]
        state.update((ids, counts, flat, int(next_id), int(dim)))

    return fn


def streaming_cluster_stateful(
    article_stream: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """article_stream(article_id string, embedding array<float>) →
    append-mode assignments with evolving story state."""
    return (
        article_stream.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandasWithState(
            _make_fn(threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming φ-heavy-hitters: the Misra-Gries summary (operators.frequent)
# carried as applyInPandasWithState state. Each micro-batch folds its
# pre-aggregated counts into the capacity-k summary and emits the current
# CANDIDATE set — every item whose MG count could still reach φ·n given
# the summary's worst-case undercount n/(k+1). No true heavy hitter is
# ever absent from an emission (same retention bound as the batch
# operator); exact counts come from a downstream recount over candidates,
# exactly like operators.frequent.heavy_hitters phase 2.
# ---------------------------------------------------------------------------

HH_OUTPUT_SCHEMA = "item string, mg_count bigint, n_seen bigint"
HH_STATE_SCHEMA = "items array<string>, counts array<long>, n bigint"


def _make_hh_fn(phi: float, capacity_factor: float = 2.0):
    import math

    from newsify_spark.operators.frequent import _mg_fold

    k = max(1, math.ceil(capacity_factor / phi))

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            summary = dict(zip(items, counts))
            n = int(n)
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            vc = pdf["item"].value_counts().to_dict()
            n += int(sum(vc.values()))
            summary = _mg_fold(summary, vc, k)
        # candidate emission: mg_count >= phi*n - n/(k+1). A true heavy
        # hitter (count >= phi*n) is undercounted by at most n/(k+1), so
        # it always clears this bar; items the summary dropped entirely
        # have count <= n/(k+1) < phi*n for k+1 > 1/phi.
        thr = phi * n - n / (k + 1)
        rows = [(i, int(c), n) for i, c in sorted(summary.items()) if c >= thr]
        state.update(
            (list(summary.keys()), [int(c) for c in summary.values()], int(n))
        )
        yield pd.DataFrame(rows, columns=["item", "mg_count", "n_seen"])

    return fn


def streaming_heavy_hitters(
    stream: DataFrame, item_col: str, phi: float, capacity_factor: float = 2.0
) -> DataFrame:
    """stream(item_col) -> per-micro-batch heavy-hitter CANDIDATES
    (item, mg_count, n_seen) with the cumulative MG summary as state.
    One global state key mirrors the reference's single consumer; shard
    by a stable hash of the item for parallel state (candidates then
    union across shards, the MG merge bound still holds per shard)."""
    return (
        stream.select(F.col(item_col).cast("string").alias("item"))
        .withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandasWithState(
            _make_hh_fn(phi, capacity_factor),
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""MMR diversification (operators/mmr.py): greedy-objective semantics,
diversity effect vs plain top-k, and the all-relational plan."""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import functions as F

from newsify_spark.operators.mmr import mmr_rerank


def _cand(spark):
    # user 1: items 1,2 nearly identical high-rel vectors; item 3
    # orthogonal lower-rel — plain top-2 = {1,2}, MMR top-2 = {1,3}
    rows = [
        (1, 1, 0.9, [1.0, 0.0, 0.0]),
        (1, 2, 0.89, [0.999, 0.01, 0.0]),
        (1, 3, 0.5, [0.0, 1.0, 0.0]),
        (1, 4, 0.4, [0.0, 0.9, 0.1]),
    ]
    return spark.createDataFrame(
        rows, "user_id long, item long, rel double, vec array<double>"
    )


def test_mmr_prefers_diverse_over_near_duplicate(spark):
    out = mmr_rerank(_cand(spark), k=2, lam=0.7)
    picks = {r["rk"]: r["item"] for r in out.collect()}
    assert picks[1] == 1  # highest relevance first
    assert picks[2] == 3  # near-duplicate 2 loses to diverse 3


def test_mmr_matches_numpy_reference(spark):
    """Exhaustive greedy reference on the same pool."""
    rows = _cand(spark).collect()
    rel = {r["item"]: r["rel"] for r in rows}
    vec = {r["item"]: np.array(r["vec"]) for r in rows}

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    lam, picked = 0.7, []
    remaining = sorted(rel)
    for step in range(3):
        if step == 0:
            best = max(remaining, key=lambda i: (rel[i], -i))
        else:
            best = max(
                remaining,
                key=lambda i: (
                    round(lam * rel[i] - (1 - lam) * max(cos(vec[i], vec[p]) for p in picked), 6),
                    -i,
                ),
            )
        picked.append(best)
        remaining.remove(best)

    got = [r["item"] for r in mmr_rerank(_cand(spark), k=3, lam=0.7).orderBy("rk").collect()]
    assert got == picked


def test_mmr_picks_are_distinct_and_plan_is_relational(spark):
    cand = _cand(spark)
    out = mmr_rerank(cand, k=3, lam=0.7)
    rows = out.collect()
    items = [r["item"] for r in rows]
    assert len(items) == len(set(items)) == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

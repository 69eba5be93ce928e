"""Item-graph PageRank (operators/pagerank.py): mass conservation,
skew guard, centrality ordering on a known graph, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsify_spark.operators.pagerank import cooccurrence_edges, pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_hub_outranks_leaves(spark):
    # star graph: 1 <-> {2,3,4}; hub 1 must get the highest rank
    rows = []
    for leaf in (2, 3, 4):
        rows += [(1, leaf, 1), (leaf, 1, 1)]
    pr = {r["item"]: r["pr"] for r in pagerank(_edges(spark, rows), iterations=5).collect()}
    assert pr[1] > pr[2] == pr[3] == pr[4]


def test_mass_approximately_conserved(spark):
    rows = [(1, 2, 1), (2, 1, 1), (2, 3, 2), (3, 2, 2), (1, 3, 1), (3, 1, 1)]
    pr = pagerank(_edges(spark, rows), iterations=3)
    total = pr.agg(F.sum("pr")).first()[0]
    # symmetric co-occurrence graph has no dangling mass; 6-dp rounding
    # perturbs the sum by < 1e-4
    assert abs(total - 1.0) < 1e-3, total


def test_cooccurrence_skew_guard_drops_bot_basket(spark):
    rows = [(1, i) for i in range(50)] + [(2, 1), (2, 2), (3, 1), (3, 3)]
    ui = spark.createDataFrame(rows, "user_id long, item long")
    edges = cooccurrence_edges(ui, max_user_items=10)
    # user 1's 50-item basket (2450 directed pairs) is dropped entirely
    pairs = {(r["src"], r["dst"]) for r in edges.collect()}
    assert pairs == {(1, 2), (2, 1), (1, 3), (3, 1)}


def test_deterministic_across_runs(spark):
    rows = [(1, 2, 3), (2, 1, 1), (2, 3, 2), (3, 2, 2), (3, 1, 5), (1, 3, 1)]
    a = sorted(map(tuple, pagerank(_edges(spark, rows), iterations=4).collect()))
    b = sorted(map(tuple, pagerank(_edges(spark, rows), iterations=4).collect()))
    assert a == b

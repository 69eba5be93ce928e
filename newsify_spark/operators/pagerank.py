"""PageRank over an item co-occurrence graph — graph centrality as a
content-ranking signal.

Reference parity: the reference ranks stories by popularity counts and
recency (recommendation-trainer.py:222-231). Graph centrality is the
standard next signal: items co-consumed with central items rank higher
even with few direct events. The graph here is the item-item
co-occurrence graph (edges = pairs of items interacted with by the same
user, weighted by co-count) — the same construction recommender
item-graphs (Pixie, item2vec randow-walk bases) start from.

Spark-first shape: each power iteration is one join (rank → edges) and
one groupBy-sum keyed by destination item — partial-agg-combined, no
driver state. The Python ``for`` builds the PLAN for a FIXED iteration
count (deterministic, oracle-checkable, and what production runs do:
convergence-to-fixed-iterations, typically 10-20). The edge list is
materialized once and reused across iterations (checkpoint/persist at
scale: lineage grows linearly with iterations otherwise — callers pass
``persist_edges=True`` (default) to cache it).

At 100 TB: the co-occurrence self-join is the expensive stage — it is
keyed by user with a per-user item-count cap upstream (heavy users are
capped exactly like LSH mega-buckets, ``max_user_items``), so the pair
count is bounded by |events|·cap, never quadratic in a hot user's
basket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    interactions: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    max_user_items: int | None = 100,
) -> DataFrame:
    """Directed weighted edges (src, dst, w) from per-user co-occurrence:
    both directions of every distinct item pair sharing a user, w =
    number of co-occurring users. ``max_user_items`` drops users with
    degenerate basket sizes (the skew guard — a 10^5-item bot basket
    would contribute 10^10 pairs)."""
    ui = interactions.select(user_col, item_col).distinct()
    if max_user_items is not None:
        ok = (
            ui.groupBy(user_col)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_user_items)
            .select(user_col)
        )
        ui = ui.join(ok, user_col, "left_semi")
    a = ui.withColumnRenamed(item_col, "src")
    b = ui.withColumnRenamed(item_col, "dst")
    return (
        a.join(b, user_col)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    persist_edges: bool = True,
) -> DataFrame:
    """(item, pr) after ``iterations`` weighted power steps from a
    uniform start. Dangling mass is ignored (co-occurrence edges are
    symmetric, so every node has out-edges). pr is rounded to 6 dp
    AFTER each iteration so the chain stays engine-reproducible
    (the DuckDB oracle unrolls the same steps).

    ``persist_edges=True`` caches the node set and the NORMALIZED edge
    table (``norm``) for the duration of the iteration loop, then
    materializes the bounded (item, pr) result via localCheckpoint and
    unpersists both — no cached partitions leak past the call, and the
    returned plan's lineage is truncated (it would otherwise grow
    linearly with iterations)."""
    nodes = (
        edges.select(F.col("src").alias("item"))
        .unionByName(edges.select(F.col("dst").alias("item")))
        .distinct()
    )
    if persist_edges:
        nodes = nodes.persist()
    n = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    norm = edges.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    )
    if persist_edges:
        norm = norm.persist()
    pr = nodes.withColumn("pr", F.round(F.lit(1.0 / n), 6))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            pr.join(norm, pr.item == norm.src)
            .groupBy(F.col("dst").alias("item"))
            .agg(F.sum(F.col("pr") * F.col("p")).alias("_in"))
        )
        pr = (
            nodes.join(contrib, "item", "left")
            .select(
                "item",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce("_in", F.lit(0.0)), 6
                ).alias("pr"),
            )
        )
    if persist_edges:
        # materialize the bounded (item, pr) result, then drop the caches
        # (ADVICE r5: these previously leaked for the session lifetime)
        pr = pr.localCheckpoint(eager=True)
        nodes.unpersist()
        norm.unpersist()
    return pr

"""Connected components over a duplicate-pair edge list.

The reference collapses duplicate groups greedily — each article joins
the first existing story it matches (duplication_service.py:74-92), so
A~B, B~C can land in one group only if they arrive in the right order.
Corpus-scale dedup needs the transitive closure regardless of order:
this implements connected components as pure DataFrame ops via
min-label propagation.

Scale design (100 TB):
- Per round: ONE equi-join (labels onto the symmetric edge list) and
  ONE groupBy-min — the min is partial-aggregated map-side, so
  high-degree nodes (a doc duplicated millions of times) don't
  concentrate rows on one reducer.
- ``localCheckpoint(eager=True)`` after every round truncates lineage;
  without it the plan doubles per iteration and Catalyst analysis time
  blows up long before the data does (the classic failure mode of
  iterative DataFrame algorithms).
- Convergence = the sum of labels stops decreasing (labels are
  monotonically non-increasing), one lightweight agg action per round.
- Rounds needed = graph diameter. Near-dup graphs are cliquey
  (diameter 2-3), so plain propagation beats the O(log^2 n)
  large-star/small-star scheme (Kiveris et al., "Connected Components
  in MapReduce and Beyond", SoCC'14) in practice; swap it in only for
  high-diameter graphs (e.g. citation chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "node",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``nodes`` must carry ``id_col`` (singletons allowed — they keep
    their own id as the component); ``edges`` carries undirected pairs
    in (``src_col``, ``dst_col``). Returns (node, comp); survivors of a
    dedup pass are the rows with node == comp.
    """
    sym = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("t")
    ).union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("t")))
    # materialize the edge list once; every round re-reads it
    sym = sym.localCheckpoint(eager=True)

    labels = (
        nodes.select(F.col(id_col).alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev = labels.agg(F.sum("comp")).first()[0]
    for _ in range(max_iter):
        prop = (
            sym.join(labels.withColumnRenamed("node", "s"), "s")
            .groupBy(F.col("t").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        labels = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        cur = labels.agg(F.sum("comp")).first()[0]
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph diameter exceeds max_iter; raise it or switch to "
        "large-star/small-star"
    )

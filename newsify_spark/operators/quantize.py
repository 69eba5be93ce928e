"""Scalar (int8) quantization for embedding columns — the
storage-compression layer between full-precision vectors and PQ codes.

Reference parity: the reference keeps FAISS vectors in float32
(recommendation-trainer.py:89-100); at 100 TB the index IS the cost, and
per-dimension int8 scalar quantization is the standard first rung
(FAISS ``IndexScalarQuantizer(QT_8bit)``, the same min/max-per-dim
affine scheme): 4x smaller than float32, decode is one fused
multiply-add, and recall loss at 8 bits is negligible for cosine
ranking. PQ (operators/similarity.py::pq_*) compresses harder (sub-byte
per dim) at more recall cost; int8 is the "almost-free" default.

Everything here is pure column expressions — ``transform`` with the
index lambda does encode/decode elementwise JVM-side; the per-dimension
(min, scale) vectors ride the plan as two array literals (8 bytes/dim —
trivial closure cost at any dim). Training is one partial-agg-combined
groupBy over (pos, value) pairs; at 100 TB you train on a sample
exactly like pq_train, but min/max is so cheap the full pass is fine
too.

The kNN form scores candidates against DECODED int8 vectors, then
reranks the short candidate list with exact float cosine — so returned
scores are exact and the only approximation is candidate selection
(recall pinned in tests; the whole chain is deterministic and
hash-checked against a DuckDB oracle, queries/vector.py::vec_knn_int8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sq_train(items: DataFrame, vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Per-dimension (min, scale) over ``items[vec_col]``: scale maps
    [min, max] onto [0, 255]; constant dimensions get scale 1.0 (code 0).
    One narrow posexplode + groupBy(pos) pass — partial min/max combine
    map-side, the shuffle carries dim-count rows per partition."""
    rows = (
        items.select(F.posexplode(vec_col).alias("pos", "v"))
        .select("pos", F.col("v").cast("double").alias("v"))
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("pos")
        .collect()
    )
    mins = [r["mn"] for r in rows]
    scales = [((r["mx"] - r["mn"]) / 255.0) if r["mx"] > r["mn"] else 1.0 for r in rows]
    return mins, scales


def sq_encode_col(vec_col: str | Column, mins: list[float], scales: list[float]) -> Column:
    """array<bigint> of codes: clamp(floor((x - min_i)/scale_i + 0.5),
    0, 255) — floor(x+0.5) (not round()) so the DuckDB oracle reproduces
    the boundary behavior exactly."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    lm, ls = F.lit(mins), F.lit(scales)
    return F.transform(
        col,
        lambda x, i: F.least(
            F.lit(255.0),
            F.greatest(
                F.lit(0.0),
                F.floor(
                    (x.cast("double") - F.element_at(lm, i + 1)) / F.element_at(ls, i + 1)
                    + F.lit(0.5)
                ),
            ),
        ).cast("bigint"),
    )


def sq_decode_col(codes_col: str | Column, mins: list[float], scales: list[float]) -> Column:
    """array<double>: min_i + code_i * scale_i."""
    col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    lm, ls = F.lit(mins), F.lit(scales)
    return F.transform(
        col, lambda c, i: F.element_at(lm, i + 1) + c.cast("double") * F.element_at(ls, i + 1)
    )


def knn_join_sq(
    queries: DataFrame,
    items: DataFrame,
    k: int = 5,
    candidate_k: int = 25,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    item_id: str = "item_id",
    item_vec: str = "item_vec",
    mins: list[float] | None = None,
    scales: list[float] | None = None,
) -> DataFrame:
    """kNN over int8-quantized items: rank by cosine(query, decoded
    int8 item) to pick ``candidate_k`` candidates per query, then rerank
    those with exact float cosine and keep ``k``. Scores returned are
    EXACT cosine; the int8 layer only prunes candidates (rerank pool
    recall pinned in tests/test_quantize.py).

    Approx scores are rounded to 6 dp BEFORE ranking (ties broken by
    item_id) so candidate selection is stable across summation orders —
    the same discipline the other hash-checked ANN paths use.

    At fixture scale the candidate pass broadcasts items; the 100 TB
    form stores ONLY codes (4x smaller), feeds them through the same
    mapInPandas GEMM as knn_join_matmul on the decoded batch, or layers
    int8 under IVF/LSH candidate generation — the expressions here are
    the semantics contract those paths must match.
    """
    from newsify_spark.functions.vectors import cosine, cosine_with_norms, l2_norm
    from newsify_spark.operators.topk import top_k_per_group

    if mins is None or scales is None:
        mins, scales = sq_train(items, item_vec)
    # decoded vector AND its norm are computed once per ITEM on the
    # broadcast side; the per-pair cosine then folds only the dot
    # product (r12: 3 O(d) folds per pair -> 1, bit-identical — guide
    # §1.2 per-task work)
    enc = items.select(
        item_id,
        item_vec,
        sq_decode_col(sq_encode_col(item_vec, mins, scales), mins, scales).alias("_dec"),
    ).withColumn("_dn", l2_norm("_dec"))
    approx = (
        queries.withColumn("_qn", l2_norm(query_vec))
        .crossJoin(F.broadcast(enc))
        .filter(F.col(item_id) != F.col(query_id))
        .withColumn(
            "_approx",
            F.round(cosine_with_norms(query_vec, "_dec", "_qn", "_dn"), 6),
        )
        # project the decoded array + norms away BEFORE the ranking
        # exchange — only the rerank inputs cross the shuffle (guide §2.3)
        .select(query_id, query_vec, item_id, item_vec, "_approx")
    )
    cands = top_k_per_group(
        approx, [query_id], [F.col("_approx").desc(), F.col(item_id).asc()], candidate_k
    )
    exact = cands.withColumn("score", cosine(query_vec, item_vec))
    top = top_k_per_group(
        exact, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k
    )
    return top.select(query_id, item_id, "score")


def save_sq_index(
    spark,
    path: str,
    mins: list[float],
    scales: list[float],
    encoded_items: DataFrame,
) -> None:
    """Persist an int8 index as parquet: the per-dimension (min, scale)
    table (dim rows) plus the encoded codes — the 4x-compressed table
    that replaces raw vectors at serving time. Same table-shaped
    persistence contract as save_pq_index (S13/S14: the reference's
    faiss.write_index re-expressed as diffable, engine-agnostic
    parquet)."""
    rows = [(i, float(m), float(s)) for i, (m, s) in enumerate(zip(mins, scales))]
    dims = spark.createDataFrame(rows, "pos int, mn double, s double")
    dims.coalesce(1).write.mode("overwrite").parquet(f"{path}/dims")
    encoded_items.write.mode("overwrite").parquet(f"{path}/codes")


def load_sq_index(spark, path: str) -> tuple[list[float], list[float], DataFrame]:
    """(mins, scales, codes) back from :func:`save_sq_index`."""
    rows = spark.read.parquet(f"{path}/dims").orderBy("pos").collect()
    mins = [r["mn"] for r in rows]
    scales = [r["s"] for r in rows]
    codes = spark.read.parquet(f"{path}/codes")
    return mins, scales, codes

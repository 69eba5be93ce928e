"""int8 scalar quantization (operators/quantize.py): code range,
round-trip error bound, candidate recall vs exact kNN, and the
all-expression plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from newsify_spark.operators.quantize import (
    knn_join_sq,
    sq_decode_col,
    sq_encode_col,
    sq_train,
)
from newsify_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_codes_in_byte_range_and_roundtrip_error(spark):
    emb = load(spark, SF, "embeddings")
    mins, scales = sq_train(emb, "embedding")
    enc = emb.select(
        "embedding",
        sq_encode_col("embedding", mins, scales).alias("codes"),
    ).withColumn("dec", sq_decode_col("codes", mins, scales))
    stats = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.max(
            F.aggregate(
                F.zip_with("embedding", "dec", lambda a, b: F.abs(a.cast("double") - b)),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("max_err"),
    ).first()
    assert 0 <= stats["lo"] and stats["hi"] <= 255
    # affine int8: |x - decode(encode(x))| <= scale/2 per dimension
    assert stats["max_err"] <= max(scales) / 2 + 1e-9, stats["max_err"]


def test_int8_candidate_recall_vs_exact(spark):
    from newsify_spark.functions.vectors import cosine
    from newsify_spark.operators.topk import top_k_per_group

    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    items = emb.select(F.col("vec_id").alias("item_id"), F.col("embedding").alias("item_vec"))
    # exact top-5 with the SAME self-exclusion knn_join_sq applies
    scored = (
        q.crossJoin(F.broadcast(items))
        .filter(F.col("item_id") != F.col("query_id"))
        .withColumn("score", cosine("query_vec", "item_vec"))
    )
    exact = {
        (r["query_id"], r["item_id"])
        for r in top_k_per_group(
            scored, ["query_id"], [F.col("score").desc(), F.col("item_id").asc()], 5
        ).collect()
    }
    got = {
        (r["query_id"], r["item_id"])
        for r in knn_join_sq(q, items, k=5, candidate_k=25)
        .select("query_id", "item_id")
        .collect()
    }
    recall = len(exact & got) / len(exact)
    # 8-bit quantization at candidate_k=5x loses almost nothing
    assert recall >= 0.95, f"int8 recall {recall}"


def test_encode_is_all_expression(spark):
    emb = load(spark, SF, "embeddings")
    mins, scales = sq_train(emb, "embedding")
    plan = (
        emb.select(sq_encode_col("embedding", mins, scales).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_train_is_deterministic(spark):
    emb = load(spark, SF, "embeddings")
    a, b = sq_train(emb, "embedding"), sq_train(emb, "embedding")
    assert a == b
    assert all(s > 0 for s in a[1])
    assert not any(math.isnan(m) for m in a[0])


def test_sq_index_persistence_roundtrip(spark, tmp_path):
    from newsify_spark.operators.quantize import load_sq_index, save_sq_index

    emb = load(spark, SF, "embeddings")
    mins, scales = sq_train(emb, "embedding")
    enc = emb.select("vec_id", sq_encode_col("embedding", mins, scales).alias("codes"))
    save_sq_index(spark, str(tmp_path / "sq"), mins, scales, enc)
    m2, s2, codes = load_sq_index(spark, str(tmp_path / "sq"))
    assert m2 == mins and s2 == scales
    a = sorted((r["vec_id"], tuple(r["codes"])) for r in enc.collect())
    b = sorted((r["vec_id"], tuple(r["codes"])) for r in codes.collect())
    assert a == b

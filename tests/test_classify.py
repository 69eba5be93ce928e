"""Trained quality classifier (ml/classify.py): held-out agreement with
the weak labeler, determinism, JVM-side inference plan, and model
persistence."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsify_spark.ml.classify import (
    predict_labels,
    train_text_classifier,
    weak_quality_labels,
)
from newsify_spark.tables import load

SF = "/root/testdata/sf0.01"


def _split(spark):
    docs = weak_quality_labels(load(spark, SF, "documents"))
    return docs.filter(F.col("doc_id") % 5 != 0), docs.filter(F.col("doc_id") % 5 == 0)


def test_labels_balanced_and_heldout_agreement(spark):
    train, test = _split(spark)
    balance = {r["weak_label"]: r["count"] for r in train.groupBy("weak_label").count().collect()}
    assert len(balance) == 2 and min(balance.values()) / max(balance.values()) > 0.5
    model = train_text_classifier(train, label_col="weak_label")
    pred = predict_labels(model, test)
    agg = pred.select(
        F.avg((F.col("weak_label") == F.col("predicted")).cast("double")).alias("acc"),
        F.count("*").alias("n"),
    ).first()
    assert agg["n"] > 0
    # the n-gram model must actually distill the heuristic, not guess
    assert agg["acc"] >= 0.75, f"held-out agreement {agg['acc']}"


def test_train_and_apply_deterministic(spark):
    train, test = _split(spark)
    a = predict_labels(train_text_classifier(train, "weak_label"), test)
    b = predict_labels(train_text_classifier(train, "weak_label"), test)
    assert sorted(map(tuple, a.select("doc_id", "predicted").collect())) == sorted(
        map(tuple, b.select("doc_id", "predicted").collect())
    )


def test_inference_is_jvm_side(spark):
    train, test = _split(spark)
    model = train_text_classifier(train, "weak_label")
    plan = predict_labels(model, test)._jdf.queryExecution().executedPlan().toString()
    # Spark ML transform = JVM UDFs, never Python row-at-a-time
    assert "BatchEvalPython" not in plan


def test_model_persistence_roundtrip(spark, tmp_path):
    from pyspark.ml import PipelineModel

    train, test = _split(spark)
    model = train_text_classifier(train, "weak_label")
    path = str(tmp_path / "quality_model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    a = sorted(map(tuple, predict_labels(model, test).select("doc_id", "predicted").collect()))
    b = sorted(map(tuple, predict_labels(loaded, test).select("doc_id", "predicted").collect()))
    assert a == b

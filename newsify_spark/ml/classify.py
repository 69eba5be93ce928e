"""Trained text classifier — the fastText-shaped quality gate.

Reference parity: the reference never trains a text model in-pipeline
(its classifiers are downloaded HF checkpoints, e.g. sentiment at
bias_detection_service.py:61-62). A 100 TB corpus pipeline needs the
CCNet/fastText pattern instead: a tiny linear model over hashed
character n-grams, TRAINED INSIDE THE ENGINE on weak labels, then
applied as one broadcast matrix-vector product per document — quality
gating at ingest bandwidth, no external service.

Spark-first shape:
- featurize: ``RegexTokenizer`` (char n-grams via F.sexpr? no — pure
  expressions below) -> ``HashingTF`` sparse vectors. Feature hashing
  keeps the dimensionality FIXED regardless of vocabulary, so the model
  is a dense (n_classes x n_features) matrix that broadcasts to every
  executor — inference never shuffles.
- train: ``LogisticRegression`` (softmax, L2) on a deterministic
  id-based split. LBFGS on treeAggregate'd gradients — partial
  aggregation map-side, driver holds only the coefficient matrix.
- apply: ``model.transform`` — JVM-side, whole-stage friendly, no
  Python in the loop.

At 100 TB: training runs on a SAMPLE (a linear model saturates at a few
million rows); inference is embarrassingly parallel. ``save``/``load``
via the standard Spark ML persistence API (same contract as
ml/als.py model persistence, S15).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, StringIndexer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_text_classifier(
    label_col: str = "lang",
    text_col: str = "text",
    n_features: int = 1 << 14,
    ngram: int = 3,
    max_iter: int = 40,
    reg: float = 1e-4,
) -> Pipeline:
    """fastText-style pipeline: char-level tokens -> n-grams -> hashed
    sparse features -> softmax LR. Everything JVM-side."""
    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="_chars", pattern=".", gaps=False,
                toLowercase=True,
            ),
            NGram(inputCol="_chars", outputCol="_ngrams", n=ngram),
            HashingTF(inputCol="_ngrams", outputCol="_feat", numFeatures=n_features),
            StringIndexer(
                inputCol=label_col, outputCol="_label", stringOrderType="alphabetAsc"
            ),
            LogisticRegression(
                featuresCol="_feat", labelCol="_label", maxIter=max_iter,
                regParam=reg, family="multinomial", standardization=False,
            ),
        ]
    )


def weak_quality_labels(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Weak supervision labels for a quality gate: median split on the
    declarative heuristic score (functions.text.quality_score) — the
    CCNet/fastText bootstrap: a cheap labeler labels, a hashed-n-gram
    linear model distills it into a form that generalizes past the
    heuristic's exact features. (The synthetic fixtures carry no real
    human labels; in production swap in wiki-vs-crawl or rater data —
    the training path is identical.)"""
    from newsify_spark.functions.text import quality_score

    if "q" not in docs.columns:
        docs = docs.withColumn("q", quality_score(text_col))
    med = docs.selectExpr("percentile_approx(q, 0.5, 100000) AS m").first()["m"]
    return docs.withColumn("weak_label", (F.col("q") >= med).cast("string"))


def train_text_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    **kw,
) -> PipelineModel:
    return build_text_classifier(label_col=label_col, text_col=text_col, **kw).fit(docs)


def predict_labels(model: PipelineModel, docs: DataFrame) -> DataFrame:
    """docs + predicted label string (decoded from the StringIndexer
    labels riding the fitted model)."""
    idx_labels = next(
        s.labels for s in model.stages if s.__class__.__name__ == "StringIndexerModel"
    )
    out = model.transform(docs)
    decode = F.element_at(F.lit(list(idx_labels)), F.col("prediction").cast("int") + 1)
    return out.withColumn("predicted", decode).drop(
        "_chars", "_ngrams", "_feat", "_label", "rawPrediction", "probability", "prediction"
    )

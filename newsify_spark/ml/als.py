"""ALS collaborative filtering — the reference's one real Spark job
(recommendation-trainer.py:174-263), kept MLlib-native but with the
per-user Python loop replaced by ``recommendForAllUsers`` (U10).

Reference parity notes:
- rank 5, implicitPrefs=True, coldStartStrategy="drop"
  (recommendation-trainer.py:228-236). The reference's config.yaml
  declares maxIter/regParam but never passes them (SURVEY §2.9 U8); we
  accept them as explicit args instead.
- StringIndexer round-trip (U9) is applied only when ids are strings;
  the fixture's bigint ids skip it (ALS wants int32-compatible ids).
"""

from __future__ import annotations

from pyspark.ml.feature import StringIndexer
from pyspark.ml.recommendation import ALS
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_als_recommendations(
    ratings: DataFrame,
    k: int = 10,
    rank: int = 5,
    max_iter: int = 10,
    reg_param: float = 0.1,
    seed: int = 42,
    user_col: str = "user_id",
    item_col: str = "item",
    rating_col: str = "rating",
) -> DataFrame:
    """ratings(user, item, rating) -> (user_id, item, score, rnk) top-k
    per user, computed for ALL users in one distributed call — no
    per-user loop (reference recommendation-trainer.py:246-263).
    """
    df = ratings
    user_is_str = dict(df.dtypes)[user_col] == "string"
    item_is_str = dict(df.dtypes)[item_col] == "string"
    if user_is_str:
        df = StringIndexer(inputCol=user_col, outputCol="__u").fit(df).transform(df)
    else:
        df = df.withColumn("__u", F.col(user_col).cast("int"))
    if item_is_str:
        df = StringIndexer(inputCol=item_col, outputCol="__i").fit(df).transform(df)
    else:
        df = df.withColumn("__i", F.col(item_col).cast("int"))

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        implicitPrefs=True,
        coldStartStrategy="drop",
        userCol="__u",
        itemCol="__i",
        ratingCol=rating_col,
        seed=seed,
    )
    model = als.fit(df.select("__u", "__i", rating_col))
    recs = model.recommendForAllUsers(k)

    # map factor ids back to natural ids via the (tiny, broadcast) id maps
    u_map = df.select(F.col("__u").cast("int").alias("__u"), user_col).distinct()
    i_map = df.select(F.col("__i").cast("int").alias("__i"), item_col).distinct()
    flat = recs.select(
        "__u", F.posexplode("recommendations").alias("pos", "rec")
    ).select(
        "__u",
        F.col("rec.__i").alias("__i"),
        F.col("rec.rating").cast("double").alias("score"),
        (F.col("pos") + 1).alias("rnk"),
    )
    return (
        flat.join(F.broadcast(u_map), "__u")
        .join(F.broadcast(i_map), "__i")
        .select(user_col, item_col, "score", "rnk")
    )


def compute_drift(events: DataFrame, window_days: int = 7) -> float:
    """A4 drift score: |mean(recent) − mean(all)| / mean(all) over event
    values (recommendation-trainer.py:45-56). Driver-side scalar — the
    gate input, not a dataset."""
    mx = events.agg(F.max("ts").alias("mx"))
    row = (
        events.crossJoin(mx.hint("broadcast"))
        .agg(
            F.avg("value").alias("overall"),
            F.avg(
                F.when(
                    F.col("ts")
                    >= F.col("mx") - F.expr(f"INTERVAL {window_days} DAYS"),
                    F.col("value"),
                )
            ).alias("recent"),
        )
        .first()
    )
    overall, recent = row["overall"], row["recent"]
    if not overall:
        return 0.0
    return abs((recent or 0.0) - overall) / overall


def retrain_if_drifted(
    ratings: DataFrame,
    events: DataFrame,
    model_dir: str,
    drift_threshold: float = 0.2,
    k: int = 10,
    **als_kwargs,
):
    """T8 drift-gated retraining (recommendation-trainer.py:269-284 and
    the Airflow branch, recommendation_retrainer_dag.py:38-52): compute
    drift, retrain + persist (S15) iff above threshold.

    Returns (drift, recommendations_df | None).
    """
    drift = compute_drift(events)
    if drift <= drift_threshold:
        return drift, None
    recs = train_als_recommendations(ratings, k=k, **als_kwargs)
    return drift, recs


def save_als_model(ratings: DataFrame, model_dir: str, **als_kwargs):
    """S15 model persistence (model.write().overwrite().save(...),
    recommendation-trainer.py:237) — fit and persist the raw ALSModel."""
    df = ratings.withColumn("__u", F.col("user_id").cast("int")).withColumn(
        "__i", F.col("item").cast("int")
    )
    als = ALS(
        rank=als_kwargs.get("rank", 5),
        implicitPrefs=True,
        coldStartStrategy="drop",
        userCol="__u",
        itemCol="__i",
        ratingCol="rating",
        seed=als_kwargs.get("seed", 42),
    )
    model = als.fit(df.select("__u", "__i", "rating"))
    model.write().overwrite().save(model_dir)
    return model


def load_als_model(model_dir: str):
    from pyspark.ml.recommendation import ALSModel

    return ALSModel.load(model_dir)

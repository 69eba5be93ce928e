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

"""Serving layer — the reference's FastAPI surface re-expressed as a
library over gold tables (api_gateway_service.py:235-348 live routes +
user_behaviour_service.py event tracker).

A reference user switches by calling these instead of the HTTP routes;
each method is the same query §3.1 traces, served from the pipeline's
precomputed parquet (X4: materialized gold, not per-request Mongo round
trips). The hot read path is a broadcast point lookup; appends go
through the merge operators.

| reference route | here |
|---|---|
| GET /recommendations/{user_id} (api_gateway_service.py:285-312) | get_recommendations |
| GET /stories (api_gateway_service.py:299 fallback list) | latest_stories |
| GET /stories/{id} (api_gateway_service.py:322) | get_story |
| POST /track-event (user_behaviour_service.py:57-86) | track_events |
| GET /drift_score (api_gateway_service.py:337-343) | drift_score |
| GET /bias-reports (bias_detection_service.py:242-248) | latest_bias_reports |
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsify_spark.operators.merge import upsert_by_key


class NewsifyAPI:
    def __init__(self, spark: SparkSession, gold_dir: str):
        self.spark = spark
        self.gold_dir = gold_dir

    def _gold(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.gold_dir, name))

    def get_recommendations(self, user_id: int, k: int = 10) -> list[dict]:
        """Point lookup on gold recommendations; latest-stories fallback
        when the user has no rec doc (api_gateway_service.py:288-299)."""
        recs = self._gold("gold_recommendations").filter(F.col("user_id") == user_id)
        rows = recs.select(F.explode("recommendations").alias("r")).select(
            F.col("r.story_id").alias("story_id"),
            F.col("r.score").alias("score"),
            F.col("r.rnk").alias("rnk"),
        ).orderBy("rnk").limit(k).collect()
        if rows:
            return [r.asDict() for r in rows]
        fallback = self.latest_stories(k)
        return [
            {"story_id": s["story_id"], "score": 0.0, "rnk": i + 1}
            for i, s in enumerate(fallback)
        ]

    def latest_stories(self, n: int = 10) -> list[dict]:
        """O3: latest-N stories by last_updated (api_gateway_service.py:299).
        Projection + coalesce defaults per the Pydantic Story model
        (api_gateway_service.py:303-312)."""
        rows = (
            self._gold("gold_stories")
            .select(
                F.col("story_id").cast("string").alias("story_id"),
                F.coalesce("summary", F.lit("")).alias("summary"),
                F.coalesce("entities", F.array()).alias("entities"),
                "last_updated",
            )
            .orderBy(F.col("last_updated").desc(), F.col("story_id").asc())
            .limit(n)
            .collect()
        )
        return [r.asDict() for r in rows]

    def get_story(self, story_id: str) -> dict | None:
        rows = (
            self._gold("gold_stories")
            .filter(F.col("story_id").cast("string") == str(story_id))
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None

    def track_events(self, events: list[dict]) -> int:
        """S8 append: new behavior events into the events log (the Kafka
        produce + Mongo insert path, user_behaviour_service.py:65-86).
        Batched by contract — per-row inserts don't exist on a lakehouse."""
        df = self.spark.createDataFrame(
            [
                (
                    int(e["event_id"]),
                    e["ts"],
                    int(e["user_id"]),
                    str(e["event_type"]),
                    float(e.get("value", 0.0)),
                    str(e.get("props", "{}")),
                )
                for e in events
            ],
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
        )
        path = os.path.join(self.gold_dir, "events_log")
        df.write.mode("append").parquet(path)
        return df.count()

    def upsert_recommendations(self, new_recs: DataFrame) -> None:
        """S9: recompute-and-merge the gold recommendations table
        (recommendation-trainer.py:259-263 upsert loop, one shot)."""
        path = os.path.join(self.gold_dir, "gold_recommendations")
        merged = upsert_by_key(self._gold("gold_recommendations"), new_recs, ["user_id"])
        tmp = path + "__new"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(path)

    def drift_score(self, events: DataFrame | None = None) -> float:
        """GET /drift_score (api_gateway_service.py:337-343): |mean(recent
        7d) − mean(all)| / mean(all) over event values. Defaults to the
        tracked events_log; pass an events frame to score another store.
        One aggregation job, one scalar back — nothing else collected."""
        from newsify_spark.queries.relational import drift_from_events

        ev = events if events is not None else self._gold("events_log")
        row = drift_from_events(ev).collect()[0]
        return float(row["drift_score"] or 0.0)

    def latest_bias_reports(self, n: int = 10) -> list[dict]:
        """O4: ORDER BY user DESC LIMIT n over bias reports
        (bias_detection_service.py:242-248; fixture has no report ts, so
        the sort key is user_id)."""
        rows = (
            self._gold("gold_bias_reports")
            .orderBy(F.col("user_id").desc())
            .limit(n)
            .collect()
        )
        return [r.asDict() for r in rows]

"""Serving-layer tests: the reference's HTTP routes as library calls
over a pipeline-produced gold directory (§3.1 read path)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def gold(spark, tmp_path_factory):
    from newsify_spark.pipeline import run_pipeline

    out = str(tmp_path_factory.mktemp("gold"))
    run_pipeline(spark, SF_DIR, out)
    return out


def test_get_recommendations_and_fallback(spark, gold):
    from newsify_spark.api import NewsifyAPI

    api = NewsifyAPI(spark, gold)
    uid = (
        spark.read.parquet(f"{gold}/gold_recommendations")
        .agg(F.min("user_id"))
        .first()[0]
    )
    recs = api.get_recommendations(uid)
    assert recs and recs[0]["rnk"] == 1
    scores = [r["score"] for r in recs]
    assert scores == sorted(scores, reverse=True)

    # unknown user falls back to latest stories (api_gateway 299)
    fb = api.get_recommendations(99_999_999)
    assert fb and all(r["score"] == 0.0 for r in fb)


def test_latest_stories_and_point_lookup(spark, gold):
    from newsify_spark.api import NewsifyAPI

    api = NewsifyAPI(spark, gold)
    stories = api.latest_stories(5)
    assert 0 < len(stories) <= 5
    assert all("summary" in s and "entities" in s for s in stories)
    one = api.get_story(stories[0]["story_id"])
    assert one is not None
    assert api.get_story("no_such_story") is None


def test_track_events_append(spark, gold):
    from newsify_spark.api import NewsifyAPI

    api = NewsifyAPI(spark, gold)
    n = api.track_events(
        [
            {
                "event_id": 1,
                "ts": datetime.datetime(2024, 5, 1, 12, 0, 0),
                "user_id": 7,
                "event_type": "click",
                "value": 1.5,
            },
            {
                "event_id": 2,
                "ts": datetime.datetime(2024, 5, 1, 12, 0, 1),
                "user_id": 7,
                "event_type": "like",
            },
        ]
    )
    assert n == 2
    log = spark.read.parquet(f"{gold}/events_log")
    assert log.count() == 2
    assert log.filter("event_type = 'like'").count() == 1


def test_upsert_recommendations_roundtrip(spark, gold):
    from newsify_spark.api import NewsifyAPI

    api = NewsifyAPI(spark, gold)
    before = spark.read.parquet(f"{gold}/gold_recommendations")
    n_before = before.count()
    sample = before.limit(1).collect()[0]
    new = spark.createDataFrame(
        [(99_999_999, sample["recommendations"], sample["last_updated"])],
        before.schema,
    )
    api.upsert_recommendations(new)
    after = spark.read.parquet(f"{gold}/gold_recommendations")
    assert after.count() == n_before + 1
    assert after.filter("user_id = 99999999").count() == 1
    recs = api.get_recommendations(99_999_999)
    assert recs and recs[0]["score"] > 0.0


def test_latest_bias_reports(spark, gold):
    from newsify_spark.api import NewsifyAPI

    api = NewsifyAPI(spark, gold)
    reports = api.latest_bias_reports(5)
    assert len(reports) == 5
    assert all("bias_flag" in r and "explanation" in r for r in reports)


def test_drift_score_route(spark, gold):
    """GET /drift_score parity: recent-7d mean vs all-time mean of event
    values, hand-computed on a 4-event log (api_gateway_service.py:272-283)."""
    from newsify_spark.api import NewsifyAPI

    api = NewsifyAPI(spark, gold)
    base = datetime.datetime(2024, 5, 1, 12, 0, 0)
    api.track_events(
        [
            {"event_id": 10, "ts": base - datetime.timedelta(days=30), "user_id": 1,
             "event_type": "click", "value": 1.0},
            {"event_id": 11, "ts": base - datetime.timedelta(days=20), "user_id": 1,
             "event_type": "click", "value": 1.0},
            {"event_id": 12, "ts": base - datetime.timedelta(days=1), "user_id": 1,
             "event_type": "like", "value": 4.0},
            {"event_id": 13, "ts": base, "user_id": 1,
             "event_type": "like", "value": 2.0},
        ]
    )
    ev = spark.read.parquet(f"{gold}/events_log").filter("event_id >= 10")
    # recent(7d of max ts) mean = (4+2)/2 = 3; overall = 8/4 = 2; drift = 0.5
    assert api.drift_score(ev) == pytest.approx(0.5, abs=1e-6)

    empty = ev.filter("event_id < 0")
    assert api.drift_score(empty) == 0.0

"""End-to-end pipeline test (SURVEY §5.4): bronze→silver→gold run over
the sf0.01 fixtures, then assert the invariants mirrored from reference
semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_pipeline_end_to_end(spark, tmp_path):
    from newsify_spark.pipeline import run_pipeline

    out = str(tmp_path / "gold")
    timings = run_pipeline(spark, SF_DIR, out)
    assert set(timings) == {
        "silver_articles",
        "silver_article_stories",
        "gold_stories",
        "gold_recommendations",
        "gold_bias_reports",
    }

    articles = spark.read.parquet(f"{out}/silver_articles")
    memb = spark.read.parquet(f"{out}/silver_article_stories")
    stories = spark.read.parquet(f"{out}/gold_stories")
    recs = spark.read.parquet(f"{out}/gold_recommendations")
    bias = spark.read.parquet(f"{out}/gold_bias_reports")

    # dedup: article ids unique, content hashes unique
    n_articles = articles.count()
    assert articles.select("article_id").distinct().count() == n_articles
    assert articles.select(F.md5("text")).distinct().count() == n_articles

    # every article has <=1 story (reference invariant §5.4)
    assert memb.count() == n_articles
    assert memb.groupBy("article_id").count().filter("count > 1").count() == 0

    # story membership arrays are consistent with the per-article table
    s = stories.select("story_id", F.explode("articles").alias("article_id"))
    joined = s.join(
        memb.select("article_id", F.col("story_id").alias("assigned")), "article_id"
    )
    assert joined.filter(F.col("story_id") != F.col("assigned")).count() == 0

    # rec lists: <=3, sorted by rank, scores descending (O2/W2)
    r = recs.toPandas()
    assert (r.recommendations.str.len() <= 3).all()
    for lst in r.recommendations:
        ranks = [x["rnk"] for x in lst]
        scores = [x["score"] for x in lst]
        assert ranks == sorted(ranks)
        assert all(scores[i] >= scores[i + 1] - 1e-9 for i in range(len(scores) - 1))

    # bias reports: diversity in (0,1], flag consistent with explanation
    b = bias.toPandas()
    assert ((b.diversity > 0) & (b.diversity <= 1)).all()
    assert ((b.explanation != "balanced") == b.bias_flag).all()

    # summaries exist and are <=10 tokens (U3 stub contract)
    st = stories.toPandas()
    assert st.summary.str.split(" ").str.len().le(10).all()
    assert (st.n_articles == st.articles.str.len()).all()


def test_incremental_summarization(spark):
    """T7/P7: a second summarization pass only touches stale stories
    (summarization-service.py:44-49)."""
    from newsify_spark.pipeline import stage_cluster, stage_ingest, stage_summarize
    from newsify_spark.tables import load

    articles = stage_ingest(spark, SF_DIR).cache()
    _, stories = stage_cluster(articles, load(spark, SF_DIR, "embeddings"))
    stories = stories.cache()

    first = stage_summarize(stories, articles).cache()
    n = first.count()

    # mark half the stories as freshly summarized (future timestamp),
    # half as stale (ancient timestamp), and stamp sentinel summaries
    existing = first.select(
        "story_id",
        F.lit("SENTINEL").alias("summary"),
        F.when(
            F.col("story_id") % 2 == 0, F.lit("2999-01-01").cast("timestamp")
        ).otherwise(F.lit("1970-01-01").cast("timestamp")).alias("last_summarized"),
    )
    second = stage_summarize(stories, articles, existing=existing).cache()
    assert second.count() == n
    out = second.select("story_id", "summary").toPandas()
    fresh = out[out.story_id.astype("int64") % 2 == 0]
    stale = out[out.story_id.astype("int64") % 2 == 1]
    assert (fresh.summary == "SENTINEL").all()      # untouched
    assert (stale.summary != "SENTINEL").all()      # re-summarized

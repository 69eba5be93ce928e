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

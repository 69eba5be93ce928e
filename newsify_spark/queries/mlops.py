"""ML-layer queries: ALS (U8-U10), clustering refinement (U6/U7
substitute), LSH ANN (X5 scale path), greedy story matching (J6/W4),
inference stubs (U1-U4), and the bias-report composite
(bias_detection_service.py).

Model-bound ops are rows-only (◆) with invariants in
tests/test_operators.py; everything SQL-expressible keeps an oracle (★).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from newsify_spark.functions.text import tokens
from newsify_spark.ml.infer import NEG_WORDS, POS_WORDS, embed_text_udf
from newsify_spark.operators.cluster import (
    greedy_story_assignment,
    jaccard_match_scores,
    kmeans_refine,
)
from newsify_spark.operators.similarity import knn_join_lsh, nearest_centroid_assign
from newsify_spark.queries.registry import register
from newsify_spark.queries.relational import EVENT_WEIGHTS_SQL
from newsify_spark.queries.sqlkit import tokens_sql
from newsify_spark.queries.vector import label_centroids
from newsify_spark.tables import load


# ---------------------------------------------------------------- rows-only


@register(
    "ml_als_topk",
    doc="U8-U10: MLlib ALS (rank 5, implicit, coldStart drop — "
    "recommendation-trainer.py:228-236) with recommendForAllUsers "
    "replacing the reference's per-user loop. Model-bound → rows-only.",
    tags=("U8", "U9", "U10"),
)
def ml_als_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.ml.als import train_als_recommendations
    from newsify_spark.queries.recommend import interactions

    inter = interactions(load(spark, sf_dir, "events"))
    return train_als_recommendations(inter, k=5)


@register(
    "ml_kmeans_clusters",
    doc="U6/U7 substitute: KMeans on L2-normalized embeddings (SURVEY "
    "§7.5.1). Distributes where UMAP+HDBSCAN cannot. Rows-only.",
    tags=("U6", "U7"),
)
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return kmeans_refine(emb, k=10)


@register(
    "ml_ann_lsh_topk",
    doc="X5 scale path: random-hyperplane LSH banded kNN — the 100 TB "
    "replacement for the brute-force cross join (vec_knn_bruteforce). "
    "Rows-only; recall invariant in tests.",
    tags=("X5", "J5"),
    bench=True,
)
def ml_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    items = emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("item_vec")
    )
    out = knn_join_lsh(q, items, k=5, dim=dim, n_bands=8, bits_per_band=8)
    return out.filter(F.col("query_id") != F.col("item_id"))


@register(
    "ml_ann_pq_topk",
    doc="X5 memory-compression scale path: product-quantization kNN "
    "(operators.similarity.pq_*) — each item vector becomes m uint8 "
    "codes (m bytes vs 4*dim), approximate distances come from per-query "
    "codebook lookup tables, and the top candidates are reranked with "
    "exact cosine. Rows-only (approximate recall, exact scores); recall "
    "invariant + exact-score check in tests.",
    tags=("X5", "J5", "pq"),
    bench=True,
)
def ml_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.similarity import knn_join_pq, pq_train

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    items = emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("item_vec")
    )
    books = pq_train(items, m=16, k=32)
    out = knn_join_pq(q, items, k=5, codebooks=books, rerank_factor=4)
    return out.filter(F.col("query_id") != F.col("item_id"))


@register(
    "ml_ann_ivfpq_topk",
    doc="The composed FAISS-style production index: IVF coarse cells + "
    "PQ codes (operators.similarity.knn_join_ivfpq) — each query scans "
    "only its n_probe nearest cells' m-byte codes via asymmetric-"
    "distance tables, then exact-cosine reranks the shortlist. Combines "
    "ml_ann_pq_topk's memory compression (m bytes/item) with "
    "vec_knn_ivf's scan pruning (n_probe/n_cells of the corpus): the "
    "index shape that serves billion-vector corpora. Rows-only "
    "(approximate recall, exact scores); recall floor + exact-score "
    "equality pinned in tests.",
    tags=("X5", "J5", "pq", "ivf", "scale-path"),
)
def ml_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.similarity import knn_join_ivfpq, pq_train

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    items = emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("item_vec")
    )
    books = pq_train(items, m=16, k=32)
    out = knn_join_ivfpq(
        q, items, k=5, codebooks=books, n_cells=8, n_probe=3, rerank_factor=4
    )
    return out.filter(F.col("query_id") != F.col("item_id"))


@register(
    "ml_greedy_story_assign",
    doc="W4 greedy 1:1 cluster→story assignment (batch-cluster-service.py:"
    "49-69): driver loop over the collected, thresholded score table; "
    "order-dependent by reference semantics → rows-only.",
    tags=("W4", "J6"),
)
def ml_greedy_story_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    cents = label_centroids(spark, sf_dir).select(
        F.col("label").alias("centroid_id"), F.col("centroid").alias("centroid_vec")
    )
    pts = emb.select(F.col("vec_id").alias("point_id"), F.col("embedding").alias("point_vec"))
    assigned = nearest_centroid_assign(pts, cents, threshold=0.8)
    new_clusters = assigned.select(
        F.col("point_id").alias("member_id"), F.col("centroid_id").alias("cluster")
    )
    old = emb.select(F.col("vec_id").alias("member_id"), F.col("label").alias("story"))
    scores = jaccard_match_scores(new_clusters, old)
    # reference threshold is 0.5 (batch-cluster-service.py:230); the fixture
    # labels are noisy (best-match Jaccard ~0.25), so the query uses a
    # fixture-appropriate τ — the operator takes it as a parameter.
    picked = greedy_story_assignment(scores, threshold=0.1)
    schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("story", T.IntegerType()),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(
        [(int(p["cluster"]), int(p["story"]), float(p["jaccard"])) for p in picked],
        schema,
    )


@register(
    "doc_embed_stub",
    doc="U1 embedding inference plumbing: Arrow-batched pandas UDF "
    "returning array<double> (stub model — deterministic md5-derived "
    "unit vectors; swap in SentenceTransformer.encode for production). "
    "Oracle-checked (VERDICT r3 item #5): the stub formula is md5 + "
    "float64 arithmetic, reproduced exactly in DuckDB below.",
    tags=("U1",),
    oracle="""
WITH comp AS (
  SELECT d.doc_id, t.j,
         CAST(concat('0x', substring(md5(coalesce(d.text, '') || '|' || t.j), 1, 8)) AS BIGINT)
           / 4294967296.0 * 2.0 - 1.0 AS u
  FROM documents d, range(64) t(j)
),
agg AS (
  SELECT doc_id,
         sqrt(sum(u * u)) AS nrm,
         max(CASE WHEN j = 0 THEN u END) AS u0
  FROM comp GROUP BY doc_id
)
SELECT doc_id, CAST(64 AS INTEGER) AS dim, round(u0 / nrm, 6) AS e0 FROM agg
""",
)
def doc_embed_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = embed_text_udf(dim=64)
    return docs.select(
        "doc_id", emb("text").alias("embedding")
    ).select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
    )


# ------------------------------------------------------------------- oracle


@register(
    "ml_cluster_match_scores",
    doc="J6/E1 cluster↔story Jaccard match scoring, distributed form of "
    "map_clusters_to_stories (batch-cluster-service.py:45-70): new "
    "clustering = deterministic nearest-centroid assignment, old = "
    "fixture labels. Greedy 1:1 pick is ml_greedy_story_assign.",
    tags=("J6", "E1", "W1"),
    oracle="""
WITH vflat AS (
  SELECT vec_id, label, CAST(pos - 1 AS INTEGER) AS pos, CAST(v AS DOUBLE) AS v
  FROM (SELECT vec_id, label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
),
cent AS (SELECT label, pos, avg(v) AS m FROM vflat GROUP BY label, pos),
sims AS (
  SELECT vf.vec_id, c.label,
         CASE WHEN sqrt(sum(vf.v * vf.v)) > 0 AND sqrt(sum(c.m * c.m)) > 0
              THEN sum(vf.v * c.m) / (sqrt(sum(vf.v * vf.v)) * sqrt(sum(c.m * c.m)))
              ELSE 0.0 END AS sim
  FROM vflat vf JOIN cent c ON vf.pos = c.pos
  GROUP BY vf.vec_id, c.label
),
assigned AS (
  SELECT vec_id AS member_id, label AS cluster
  FROM (SELECT vec_id, label, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, label ASC) AS rn FROM sims)
  WHERE rn = 1
),
old AS (SELECT vec_id AS member_id, label AS story FROM embeddings),
csz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz_cluster FROM assigned GROUP BY cluster),
ssz AS (SELECT story, CAST(count(*) AS BIGINT) AS sz_story FROM old GROUP BY story),
inter AS (
  SELECT a.cluster, o.story, CAST(count(*) AS BIGINT) AS inter
  FROM assigned a JOIN old o ON a.member_id = o.member_id
  GROUP BY a.cluster, o.story
)
SELECT i.cluster, i.story, i.inter, c.sz_cluster, s.sz_story,
       round(CAST(i.inter AS DOUBLE) / (c.sz_cluster + s.sz_story - i.inter), 6) AS jaccard
FROM inter i JOIN csz c ON i.cluster = c.cluster JOIN ssz s ON i.story = s.story
""",
)
def ml_cluster_match_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    cents = label_centroids(spark, sf_dir).select(
        F.col("label").alias("centroid_id"), F.col("centroid").alias("centroid_vec")
    )
    pts = emb.select(F.col("vec_id").alias("point_id"), F.col("embedding").alias("point_vec"))
    assigned = nearest_centroid_assign(pts, cents, threshold=0.8)
    new_clusters = assigned.select(
        F.col("point_id").alias("member_id"), F.col("centroid_id").alias("cluster")
    )
    old = emb.select(F.col("vec_id").alias("member_id"), F.col("label").alias("story"))
    out = jaccard_match_scores(new_clusters, old)
    return out.select(
        "cluster", "story", "inter", "sz_cluster", "sz_story",
        F.round("jaccard", 6).alias("jaccard"),
    )


def _lexicon_sql(words: set[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in sorted(words))
    return f"len(list_filter({tokens_sql()}, tk -> tk IN ({lst})))"


@register(
    "doc_ner_entities",
    doc="U2 NER surface in its oracle-checkable form: deterministic token "
    "heuristic (distinct tokens >5 chars, sorted, joined). The pandas-UDF "
    "form (swap-in spaCy) is ml/infer.ner_entities_udf.",
    tags=("U2",),
    oracle=f"""
SELECT doc_id,
       coalesce(array_to_string(list_sort(list_distinct(list_filter({tokens_sql()}, tk -> len(tk) > 5))), ' '), '') AS entities
FROM documents
""",
)
def doc_ner_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ents = F.array_sort(
        F.array_distinct(F.filter(tokens("text"), lambda t: F.length(t) > 5))
    )
    return docs.select("doc_id", F.concat_ws(" ", ents).alias("entities"))


@register(
    "doc_summarize_head",
    doc="U3 summarization surface, oracle-checkable extractive stub "
    "(leading 10 tokens). pandas-UDF form: ml/infer.summarize_udf.",
    tags=("U3",),
    oracle=f"""
SELECT doc_id, array_to_string(({tokens_sql()})[1:10], ' ') AS summary
FROM documents
""",
)
def doc_summarize_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.concat_ws(" ", F.slice(tokens("text"), 1, 10)).alias("summary")
    )


@register(
    "doc_sentiment",
    doc="U4/A6 sentiment scoring + corpus mean, lexicon form "
    "(bias_detection_service.py:132-147). pandas-UDF form: "
    "ml/infer.sentiment_udf.",
    tags=("U4", "A6"),
    oracle=f"""
SELECT doc_id,
       round(CASE WHEN len({tokens_sql()}) > 0 THEN
             CAST({_lexicon_sql(POS_WORDS)} - {_lexicon_sql(NEG_WORDS)} AS DOUBLE) / len({tokens_sql()})
             ELSE 0.0 END, 6) AS sentiment
FROM documents
""",
)
def doc_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    pos = F.size(F.filter(toks, lambda t: t.isin(*sorted(POS_WORDS))))
    neg = F.size(F.filter(toks, lambda t: t.isin(*sorted(NEG_WORDS))))
    sent = F.when(
        F.size(toks) > 0, (pos - neg).cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))
    return docs.select("doc_id", F.round(sent, 6).alias("sentiment"))


@register(
    "rec_bias_report",
    doc="Bias-detection composite (bias_detection_service.py:122-172): "
    "per-user source-diversity (A5) + mean sentiment over consumed docs "
    "(A6, lexicon form) + bias flag (P10) + explanation projection.",
    tags=("A5", "A6", "P10", "S16"),
    bench=True,
    oracle=f"""
WITH inter AS (
  SELECT DISTINCT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events WHERE {EVENT_WEIGHTS_SQL} > 0
),
j AS (
  SELECT i.user_id, d.source,
         CASE WHEN len({tokens_sql('d.text')}) > 0 THEN
           CAST(len(list_filter({tokens_sql('d.text')}, tk -> tk IN ('fast','small','value')))
              - len(list_filter({tokens_sql('d.text')}, tk -> tk IN ('big','error','slow'))) AS DOUBLE)
           / len({tokens_sql('d.text')})
         ELSE 0.0 END AS sent
  FROM inter i JOIN documents d ON i.item = d.doc_id
),
agg AS (
  SELECT user_id,
         CAST(count(DISTINCT source) AS DOUBLE) / count(*) AS diversity,
         avg(sent) AS avg_sentiment,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM j GROUP BY user_id
)
SELECT user_id, round(diversity, 6) AS diversity,
       round(avg_sentiment, 6) AS avg_sentiment, n_docs,
       (diversity < 0.5 OR abs(avg_sentiment) > 0.05) AS bias_flag,
       CASE WHEN diversity < 0.5 THEN 'low source diversity'
            WHEN abs(avg_sentiment) > 0.05 THEN 'sentiment skew'
            ELSE 'balanced' END AS explanation
FROM agg
""",
)
def rec_bias_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.functions.scalars import event_score
    from newsify_spark.queries.relational import EVENT_WEIGHTS

    ev = load(spark, sf_dir, "events")
    docs = load(spark, sf_dir, "documents")
    # No spread_small_scan here (r12): unlike the cached hybrid pipeline,
    # this tree is uncached, so the join's inferred isnotnull(item)
    # predicate pushes the from_json BELOW the round-robin exchange — the
    # parse ran single-threaded at the scan anyway AND re-ran above it.
    # Dropping the spread removes the exchange (and its implicit
    # sort-before-repartition) plus the duplicate parse; the distinct's
    # own (user_id, item) exchange ships two longs, not props strings
    # (guide §2.3/§2.4). On parallel production scans this is a no-op
    # difference by construction.
    inter = (
        ev.filter(event_score("event_type", EVENT_WEIGHTS) > 0)
        .select("user_id", F.from_json("props", "k bigint")["k"].alias("item"))
        .distinct()
    )
    toks = tokens("text")
    pos = F.size(F.filter(toks, lambda t: t.isin("fast", "small", "value")))
    neg = F.size(F.filter(toks, lambda t: t.isin("big", "error", "slow")))
    sent = F.when(
        F.size(toks) > 0, (pos - neg).cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))
    d = docs.select(F.col("doc_id").alias("item"), "source", sent.alias("sent"))
    j = inter.join(F.broadcast(d), "item")
    agg = j.groupBy("user_id").agg(
        (F.countDistinct("source").cast("double") / F.count("*")).alias("diversity"),
        F.avg("sent").alias("avg_sentiment"),
        F.count("*").alias("n_docs"),
    )
    return agg.select(
        "user_id",
        F.round("diversity", 6).alias("diversity"),
        F.round("avg_sentiment", 6).alias("avg_sentiment"),
        "n_docs",
        (
            (F.col("diversity") < 0.5) | (F.abs(F.col("avg_sentiment")) > 0.05)
        ).alias("bias_flag"),
        F.when(F.col("diversity") < 0.5, F.lit("low source diversity"))
        .when(F.abs(F.col("avg_sentiment")) > 0.05, F.lit("sentiment skew"))
        .otherwise(F.lit("balanced"))
        .alias("explanation"),
    )


@register(
    "doc_udtf_shingles",
    doc="Python UDTF (Spark 4 user-defined table function — no UDTF "
    "exists in the reference, SURVEY §2.9): lateral-explodes word "
    "shingles with positions. Same definition as functions.text."
    "word_shingles, so fully oracle-checkable.",
    tags=("UDTF", "dedup"),
    oracle="""
SELECT doc_id, CAST(idx AS INTEGER) AS idx, shingle
FROM (
  SELECT doc_id,
         generate_subscripts(sh, 1) AS idx,
         unnest(sh) AS shingle
  FROM (
    SELECT doc_id,
           (CASE WHEN len(string_split(lower(text), ' ')) >= 3 THEN
              list_transform(generate_series(1, len(string_split(lower(text), ' ')) - 2),
                             i -> array_to_string((string_split(lower(text), ' '))[i:i+2], ' '))
            ELSE [array_to_string(string_split(lower(text), ' '), ' ')] END) AS sh
    FROM documents WHERE doc_id < 50)
)
""",
)
def doc_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="idx int, shingle string")
    class ShingleUDTF:
        def eval(self, text: str, n: int):
            toks = (text or "").lower().split(" ")
            if len(toks) >= n:
                for i in range(len(toks) - n + 1):
                    yield i + 1, " ".join(toks[i : i + n])
            else:
                yield 1, " ".join(toks)

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("shingle_udtf", ShingleUDTF)
    return spark.sql(
        "SELECT d.doc_id, s.idx, s.shingle "
        "FROM __udtf_docs d, LATERAL shingle_udtf(d.text, 3) s"
    )


@register(
    "ml_quality_classifier",
    doc="Trained-in-engine quality classifier (ml/classify.py): weak "
    "labels from the declarative heuristic (median split on "
    "functions.text.quality_score), distilled into a char-3-gram "
    "HashingTF + multinomial LogisticRegression — the fastText/CCNet "
    "corpus-gating bootstrap. Trained on doc_id%5!=0, applied to the "
    "held-out %5==0 docs. Rows-only (LBFGS float sums are not "
    "SQL-reproducible); held-out agreement floor, determinism, "
    "JVM-side inference, and persistence pinned in "
    "tests/test_classify.py. The reference only ever APPLIES "
    "downloaded checkpoints (bias_detection_service.py:61-62) — "
    "training stays outside its system; here it is one query.",
    tags=("U2", "U4", "ml", "text"),
)
def ml_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.ml.classify import (
        predict_labels,
        train_text_classifier,
        weak_quality_labels,
    )

    docs = weak_quality_labels(load(spark, sf_dir, "documents"))
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    model = train_text_classifier(train, label_col="weak_label")
    return (
        predict_labels(model, test)
        .select(
            "doc_id",
            "weak_label",
            "predicted",
            (F.col("weak_label") == F.col("predicted")).alias("agrees"),
        )
        .orderBy("doc_id")
    )

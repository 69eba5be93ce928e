"""Coverage widening: as-of join, serde roundtrip (Kafka message shape),
P7 change-detection predicate, set-union rollup (A3), ROLLUP grouping,
nested rec-list build/extract (F19), windowed stream aggregates in batch
form (T6), foreachBatch clustering (T4), approximate distinct (100 TB
variant of A8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsify_spark.functions.scalars import epoch_us
from newsify_spark.operators.asof import asof_join
from newsify_spark.queries.registry import register
from newsify_spark.tables import load


@register(
    "rel_asof_join",
    doc="As-of join (operators.asof: union+window, one shuffle on the "
    "key): each click event picks up the user's latest prior signup. "
    "Oracle: DuckDB ASOF LEFT JOIN.",
    tags=("asof", "J-extra"),
    bench=True,
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value
  FROM events WHERE event_type = 'click'
),
signups AS (
  -- dedup exact-duplicate timestamps deterministically (min event id)
  SELECT user_id, ts, min(sv) AS signup_value FROM (
    SELECT user_id, date_trunc('microseconds', ts) AS ts, value AS sv
    FROM events WHERE event_type = 'signup')
  GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       s.ts AS signup_ts,
       round(coalesce(s.signup_value, -1.0), 4) AS signup_value
FROM clicks c ASOF LEFT JOIN signups s
  ON c.user_id = s.user_id AND c.ts >= s.ts
""",
)
def rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.min("value").alias("signup_value"))
        .select("user_id", F.col("ts").alias("signup_ts"), "signup_value")
    )
    out = asof_join(
        clicks,
        signups,
        on="user_id",
        left_time="ts",
        right_time="signup_ts",
        payload_cols=["signup_ts", "signup_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "signup_ts",
        F.round(F.coalesce("signup_value", F.lit(-1.0)), 4).alias("signup_value"),
    )


@register(
    "rel_json_roundtrip",
    doc="S4/S5 Kafka message shape: to_json(struct(...)) -> from_json "
    "roundtrip (produce/consume serde, ingestion_service.py:90 / "
    "duplication_service.py:163). Oracle compares against the original "
    "columns — the roundtrip must be lossless.",
    tags=("S4", "S5", "F14"),
    oracle="""
SELECT event_id, user_id, event_type, round(value, 4) AS value
FROM events
""",
)
def rel_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    msgs = ev.select(
        F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias("value_json"),
        F.col("event_id").cast("string").alias("key"),
    )
    schema = "event_id bigint, user_id bigint, event_type string, value double"
    parsed = msgs.select(F.from_json("value_json", schema).alias("m")).select("m.*")
    return parsed.select(
        "event_id", "user_id", "event_type", F.round("value", 4).alias("value")
    )


@register(
    "rel_needs_refresh",
    doc="P7 missing-field / expression predicate: stories needing "
    "re-summarization (summarization-service.py:44-49) — here: users "
    "whose last view postdates their last click (or who never clicked).",
    tags=("P7",),
    oracle="""
WITH s AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view'  THEN date_trunc('microseconds', ts) END) AS last_view,
         max(CASE WHEN event_type = 'click' THEN date_trunc('microseconds', ts) END) AS last_click
  FROM events GROUP BY user_id
)
SELECT user_id, last_view, last_click,
       (last_click IS NULL OR last_view > last_click) AS needs_refresh
FROM s WHERE last_view IS NOT NULL
""",
)
def rel_needs_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).alias("last_view"),
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("last_click"),
    )
    return s.filter(F.col("last_view").isNotNull()).select(
        "user_id",
        "last_view",
        "last_click",
        (F.col("last_click").isNull() | (F.col("last_view") > F.col("last_click"))).alias(
            "needs_refresh"
        ),
    )


@register(
    "rel_rollup_counts",
    doc="ROLLUP aggregation (beyond the reference — SURVEY §2.4 notes "
    "grouping sets absent; Spark gives them natively).",
    tags=("A-extra",),
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 4) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rel_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@register(
    "rec_user_rec_lists",
    doc="F19 + §1.3 recommendations schema: build array<struct<story_id,"
    "score>> rec lists (recommendation-trainer.py:259-263), then extract "
    "fields back out (api_gateway_service.py:290). Flat CSV projection "
    "for the oracle.",
    tags=("F19", "S9"),
    oracle="""
WITH top AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
  FROM events
)
SELECT user_id,
       array_to_string(list(CAST(event_id AS VARCHAR) ORDER BY rnk), ',') AS stories_csv,
       array_to_string(list(CAST(round(value, 2) AS VARCHAR) ORDER BY rnk), ',') AS scores_csv,
       CAST(count(*) AS BIGINT) AS n_recs
FROM top WHERE rnk <= 3 GROUP BY user_id
""",
)
def rec_user_rec_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.topk import top_k_per_group

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    top = top_k_per_group(
        ev, ["user_id"], [F.col("value").desc(), F.col("event_id").asc()], 3,
        rank_col="rnk", keep_rank=True,
    )
    # build the nested gold-table shape...
    lists = top.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("rnk", F.col("event_id").alias("story_id"), F.col("value").alias("score")))
        ).alias("recommendations")
    )
    # ...then extract fields back out (transform = the reference's list
    # comprehension over rec dicts)
    return lists.select(
        "user_id",
        F.concat_ws(
            ",", F.transform("recommendations", lambda r: r["story_id"].cast("string"))
        ).alias("stories_csv"),
        F.concat_ws(
            ",",
            F.transform("recommendations", lambda r: F.round(r["score"], 2).cast("string")),
        ).alias("scores_csv"),
        F.size("recommendations").cast("long").alias("n_recs"),
    )


@register(
    "stream_window_counts",
    doc="T6 tumbling event-time windows (the incremental form of the "
    "drift/popularity aggregates). Same F.window expression the streaming "
    "query uses (streaming.pipeline.streaming_event_counts), evaluated "
    "in batch for the oracle.",
    tags=("T6",),
    bench=True,
    oracle="""
SELECT CAST(date_trunc('day', date_trunc('microseconds', ts)) AS TIMESTAMP) AS day_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
""",
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("day_start"), "event_type", "n", "total_value")
    )


@register(
    "stream_cluster_assign",
    doc="T4/T5 foreachBatch stateful clustering: embeddings fed as 4 "
    "micro-batches through the same batch body the streaming query uses "
    "(streaming.pipeline). Order-dependent state evolution → rows-only; "
    "invariants in tests/test_streaming.py.",
    tags=("T4", "T5"),
)
def stream_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.streaming.pipeline import run_microbatched

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 120)
        .select(F.col("vec_id").cast("string").alias("article_id"), "embedding")
    )
    pdf = emb.toPandas().sort_values("article_id", key=lambda s: s.astype(int))
    batches = [
        spark.createDataFrame(
            pdf.iloc[i * 30 : (i + 1) * 30], "article_id string, embedding array<float>"
        )
        for i in range(4)
    ]
    out, _ = run_microbatched(batches, threshold=0.95)
    return out


@register(
    "ml_approx_distinct",
    doc="approx_count_distinct — the 100 TB variant of A8 (HLL sketch; "
    "SURVEY §2.4 notes approximate aggregates as the scale extension). "
    "Sketch values are engine-specific → rows-only; error bound asserted "
    "in tests.",
    tags=("A8", "approx"),
)
def ml_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@register(
    "rel_timestamp_parse",
    doc="S3/F4 ISO timestamp format/parse roundtrip (ingestion_service.py:"
    "60,71 isoformat; recommendation-trainer.py:144 fromisoformat). "
    "Format to string, parse back, prove losslessness at second grain.",
    tags=("S3", "F4", "F6"),
    oracle="""
SELECT event_id,
       strftime(date_trunc('microseconds', ts), '%Y-%m-%dT%H:%M:%S') AS iso,
       CAST(strptime(strftime(date_trunc('microseconds', ts), '%Y-%m-%dT%H:%M:%S'),
                     '%Y-%m-%dT%H:%M:%S') AS TIMESTAMP) AS parsed,
       (CAST(strptime(strftime(date_trunc('microseconds', ts), '%Y-%m-%dT%H:%M:%S'),
                      '%Y-%m-%dT%H:%M:%S') AS TIMESTAMP)
        = date_trunc('second', date_trunc('microseconds', ts))) AS lossless
FROM events
""",
)
def rel_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    parsed = F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss")
    return ev.select(
        "event_id",
        iso.alias("iso"),
        parsed.alias("parsed"),
        (parsed == F.date_trunc("second", F.col("ts"))).alias("lossless"),
    )


@register(
    "rel_flag_workflow",
    doc="P8/S16/S17 boolean-flag scan + mark-processed update "
    "(bias_detection_service.py:82-117): select unprocessed rows, flip "
    "the flag, return the updated table. Flag synthesized as value>30.",
    tags=("P8", "S16", "S17"),
    oracle="""
WITH logs AS (SELECT event_id, user_id, value >= 30 AS processed_for_bias FROM events),
todo AS (SELECT event_id FROM logs WHERE NOT processed_for_bias)
SELECT l.event_id, l.user_id,
       (l.processed_for_bias OR t.event_id IS NOT NULL) AS processed_for_bias,
       (t.event_id IS NOT NULL) AS newly_processed
FROM logs l LEFT JOIN todo t ON l.event_id = t.event_id
""",
)
def rel_flag_workflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    logs = ev.select(
        "event_id", "user_id", (F.col("value") >= 30).alias("processed_for_bias")
    )
    todo = logs.filter(~F.col("processed_for_bias")).select("event_id")  # S16 scan
    marked = logs.join(  # S17 flag update as join-update
        todo.withColumn("newly_processed", F.lit(True)), "event_id", "left"
    )
    return marked.select(
        "event_id",
        "user_id",
        (F.col("processed_for_bias") | F.col("newly_processed").isNotNull()).alias(
            "processed_for_bias"
        ),
        F.coalesce("newly_processed", F.lit(False)).alias("newly_processed"),
    )


@register(
    "rel_array_append",
    doc="S10/E4 in-place array append with dedup ($push + $set, "
    "duplication_service.py:110-116): per-user item arrays built before "
    "a cutoff, array_union'd with post-cutoff additions.",
    tags=("S10", "E4"),
    oracle="""
WITH m AS (SELECT max(date_trunc('microseconds', ts)) AS mx FROM events),
base AS (
  SELECT user_id, list_sort(list(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))) AS items
  FROM events, m WHERE date_trunc('microseconds', ts) < mx - INTERVAL 7 DAY GROUP BY user_id
),
adds AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events, m WHERE date_trunc('microseconds', ts) >= mx - INTERVAL 7 DAY
)
SELECT b.user_id,
       array_to_string(list_sort(list_distinct(b.items || coalesce(list(a.item), []))), ',') AS items_csv
FROM base b LEFT JOIN adds a ON b.user_id = a.user_id
GROUP BY b.user_id, b.items
""",
)
def rel_array_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.merge import array_append_distinct

    ev = load(spark, sf_dir, "events")
    withmx = ev.crossJoin(
        F.broadcast(ev.agg(F.max("ts").alias("mx")))
    ).withColumn("item", F.get_json_object("props", "$.k").cast("bigint"))
    cutoff = F.col("mx") - F.expr("INTERVAL 7 DAYS")
    base = (
        withmx.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("item")).alias("items"))
    )
    adds = withmx.filter(F.col("ts") >= cutoff).select("user_id", "item")
    merged = array_append_distinct(base, "user_id", "items", adds, "item")
    return merged.select(
        "user_id",
        F.concat_ws(",", F.array_sort(F.array_distinct("items"))).alias("items_csv"),
    )


@register(
    "ml_ann_ivf_topk",
    doc="IVF-style ANN (FAISS IndexIVF pattern, X5): KMeans coarse cells, "
    "n_probe nearest cells per query, exact rerank within. Rows-only "
    "(KMeans centroids are engine-specific); recall invariant in tests.",
    tags=("X5", "J5"),
)
def ml_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.similarity import knn_join_ivf

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    items = emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("item_vec")
    )
    out = knn_join_ivf(q, items, k=5, n_cells=8, n_probe=3)
    return out.filter(F.col("query_id") != F.col("item_id"))


@register(
    "rel_sessionize",
    doc="Sessionization: lag + gap-flag cumsum windows (the batch form of "
    "session_window; no session analytics exist in the reference — "
    "SURVEY §2.5 — but any event pipeline at scale needs it).",
    tags=("W-extra", "T6"),
    oracle="""
WITH e AS (
  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts FROM events
),
flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
              THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
FROM sess GROUP BY user_id, session_no
""",
)
def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = epoch_us("ts") - epoch_us(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 3_600_000_000), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        (epoch_us(F.max("ts")) - epoch_us(F.min("ts"))).alias("duration_us"),
    )


@register(
    "rel_pivot_counts",
    doc="Pivot (event_type columns per user-activity day-of-week) — "
    "engine extension; Spark .pivot with an explicit value list so the "
    "output schema is static.",
    tags=("A-extra",),
    oracle="""
-- DuckDB dayofweek is 0=Sunday..6; Spark is 1=Sunday..7 — shift to match
SELECT CAST(dayofweek(date_trunc('microseconds', ts)) + 1 AS INTEGER) AS dow,
       CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error
FROM events GROUP BY 1
""",
)
def rel_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.withColumn("dow", F.dayofweek("ts"))
        .groupBy("dow")
        .pivot("event_type", kinds)
        .count()
    )
    # pivot leaves NULL for empty cells; the oracle counts 0
    for c in kinds:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


@register(
    "rel_set_ops",
    doc="Homogeneous-table set operations (INTERSECT / EXCEPT / UNION "
    "ALL) — SURVEY §2.7 notes the reference only has dict/set forms; "
    "Spark's relational forms, oracle-checked.",
    tags=("E-extra",),
    oracle="""
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
buyers   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
viewers  AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
erring   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT 'click_and_buy' AS op, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM clickers INTERSECT SELECT * FROM buyers)
UNION ALL
SELECT 'view_not_error' AS op, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM viewers EXCEPT SELECT * FROM erring)
UNION ALL
SELECT 'all_rows' AS op, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM clickers UNION ALL SELECT * FROM buyers)
""",
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")

    def kind(t):
        return ev.filter(F.col("event_type") == t).select("user_id").distinct()

    rows = [
        ("click_and_buy", kind("click").intersect(kind("purchase")).count()),
        ("view_not_error", kind("view").exceptAll(kind("error")).count()),
        ("all_rows", kind("click").unionAll(kind("purchase")).count()),
    ]
    return spark.createDataFrame(rows, "op string, n bigint")


@register(
    "rel_percentiles",
    doc="Exact interpolated percentiles / median per group (engine "
    "extension; the reference has no quantile machinery). "
    "approx variant: ml_approx_distinct pattern with percentile_approx.",
    tags=("A-extra",),
    oracle="""
SELECT event_type,
       round(median(value), 6)              AS med,
       round(quantile_cont(value, 0.9), 6)  AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("med"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@register(
    "rel_range_join",
    doc="Banded range join (operators.rangejoin): events matched to "
    "±12h windows around each signup of the same user — bucketized "
    "equi join + exact predicate, never a cartesian product.",
    tags=("J-extra", "range"),
    oracle="""
WITH wins AS (
  SELECT event_id AS win_id, user_id,
         epoch_us(date_trunc('microseconds', ts)) - 43200000000 AS lo,
         epoch_us(date_trunc('microseconds', ts)) + 43200000000 AS hi
  FROM events WHERE event_type = 'signup'
),
pts AS (
  SELECT event_id, user_id, epoch_us(date_trunc('microseconds', ts)) AS t
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, w.win_id, CAST(count(*) AS BIGINT) AS n
FROM pts p JOIN wins w
  ON p.user_id = w.user_id AND p.t >= w.lo AND p.t <= w.hi
GROUP BY p.event_id, w.win_id
""",
)
def rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.rangejoin import range_join_points_to_intervals

    ev = load(spark, sf_dir, "events")
    wins = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("win_id"),
        F.col("user_id").alias("w_user"),
        (epoch_us("ts") - 43_200_000_000).alias("lo"),
        (epoch_us("ts") + 43_200_000_000).alias("hi"),
    )
    pts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", epoch_us("ts").alias("t")
    )
    j = range_join_points_to_intervals(
        pts, wins, point_key="t", lo="lo", hi="hi", bucket_width=43_200_000_000
    ).filter(F.col("user_id") == F.col("w_user"))
    return j.groupBy("event_id", "win_id").agg(F.count("*").alias("n"))


@register(
    "rel_scd2_segments",
    doc="SCD2 history tracking without a table format (MERGE emulation, "
    "SURVEY guide pattern): each user's event-type changes become "
    "validity intervals via lead() windows.",
    tags=("W-extra", "S9"),
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
versioned AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
)
SELECT user_id, event_type, valid_from, valid_to, valid_to IS NULL AS is_current
FROM versioned
""",
)
def rel_scd2_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    versioned = changes.withColumn(
        "valid_to", F.lead("ts").over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    )
    return versioned.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


@register(
    "rel_gap_fill",
    doc="Time-series resample/gap-fill: generate the full day spine per "
    "user via sequence()+explode, left-join observed daily aggregates, "
    "zero-fill gaps (engine extension for training-data pipelines).",
    tags=("T6", "A-extra"),
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', date_trunc('microseconds', ts)) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
  FROM events WHERE user_id < 20 GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
)
SELECT s.user_id, s.day,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n,
       round(coalesce(d.total, 0.0), 4) AS total,
       d.n IS NULL AS gap_filled
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
""",
)
def rel_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    out = spine.join(daily, ["user_id", "day"], "left")
    return out.select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.round(F.coalesce("total", F.lit(0.0)), 4).alias("total"),
        F.col("n").isNull().alias("gap_filled"),
    )


@register(
    "rel_stats_agg",
    doc="Statistical aggregates (stddev/variance/corr/argmax) — engine "
    "extension; arg_max/max_by give the reference's per-group argmax "
    "(A10) in one aggregate instead of a window.",
    tags=("A-extra", "A10"),
    oracle="""
SELECT event_type,
       round(stddev_samp(value), 6)      AS sd,
       round(var_samp(value), 6)         AS var,
       round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_uv,
       CAST(arg_max(event_id, value) AS BIGINT) AS top_event_id,
       CAST(arg_min(event_id, value) AS BIGINT) AS bottom_event_id
FROM events GROUP BY event_type
""",
)
def rel_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(F.corr("value", F.col("user_id").cast("double")), 6).alias("corr_uv"),
        F.max_by("event_id", "value").alias("top_event_id"),
        F.min_by("event_id", "value").alias("bottom_event_id"),
    )


@register(
    "rel_incremental_rollup",
    doc="Incremental rollup maintenance (operators/rollup.py): daily "
    "partials per (event_type, month, day) merged to month grain by "
    "partial-agg algebra (sum-of-sums, sum-of-counts, min-of-mins, "
    "avg finalized from sum/count). Oracle computes the month rollup "
    "directly from raw events — pinning partial-then-merge == direct. "
    "At 100 TB the merge reads |keys|x|days| partial rows, not raw.",
    tags=("A1", "A4", "rollup", "incremental"),
    oracle="""
SELECT event_type,
       strftime(date_trunc('microseconds', ts), '%Y-%m') AS month,
       CAST(count(*) AS BIGINT)   AS n,
       round(sum(value), 4)       AS total,
       round(min(value), 4)       AS lo,
       round(max(value), 4)       AS hi,
       round(sum(value) / count(*), 6) AS avg_v
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def rel_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.rollup import merge_rollups, partial_rollup

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "value",
    )
    daily = partial_rollup(ev, ["event_type", "month", "day"], "value", ["sum", "count", "min", "max"])
    monthly = merge_rollups(daily, ["event_type", "month"], ["sum", "count", "min", "max", "avg"])
    return monthly.select(
        "event_type",
        "month",
        F.col("count_p").alias("n"),
        F.round("sum_p", 4).alias("total"),
        F.round("min_p", 4).alias("lo"),
        F.round("max_p", 4).alias("hi"),
        F.round("avg_p", 6).alias("avg_v"),
    ).orderBy("event_type", "month")


@register(
    "rel_sketch_rollup",
    doc="Mergeable-sketch rollup (Datasketches HLL, built into Spark 4): "
    "per-day distinct-user sketches unioned to month grain — the "
    "approximate companion of rel_incremental_rollup for metrics that "
    "do NOT decompose exactly (count distinct). At 100 TB the month "
    "rollup reads |days| sketch blobs (~KB each), never raw events, and "
    "sketch union is associative so any regrouping (late data, "
    "backfills) stays one merge pass. Estimates are deterministic for "
    "fixed input; merged==direct is test-pinned, so rows-only here.",
    tags=("A8", "rollup", "sketch", "incremental"),
)
def rel_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n"),
    )
    return (
        daily.groupBy("month")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n").alias("n_events"),
        )
        .orderBy("month")
    )


@register(
    "rel_snapshot_diff",
    doc="CDC-style snapshot diff: two deterministic snapshots of orders "
    "(old drops o_orderkey%11=3, new drops %11=5 and reprices %7=2 "
    "rows by +10) full-outer-joined on the key and classified "
    "added/deleted/changed, unchanged rows dropped — the change feed a "
    "downstream incremental consumer (or SCD2 merge, rel_scd2_segments) "
    "ingests. One shuffle on the join key; at 100 TB both sides "
    "partition-prune to the compared snapshot versions.",
    tags=("J8", "E3", "cdc", "S11"),
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 11 <> 3
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 2 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 11 <> 5
)
SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'deleted'
            ELSE 'changed' END AS change_type,
       old.price AS old_price,
       new.price AS new_price
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR old.price IS DISTINCT FROM new.price
ORDER BY o_orderkey
""",
)
def rel_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # explicit per-side presence markers (ADVICE r5): row presence is
    # classified on the marker, never on a payload column's NULLness —
    # a snapshot row whose price is genuinely NULL stays 'changed', not
    # misclassified as added/deleted.
    old = orders.filter(F.col("o_orderkey") % 11 != 3).select(
        "o_orderkey",
        F.col("o_totalprice").alias("old_price"),
        F.lit(True).alias("_in_old"),
    )
    # constant-delta reprice: raw doubles pass through bit-identically on
    # both engines (x*1.1 rounded lands on .005 boundaries)
    new = orders.filter(F.col("o_orderkey") % 11 != 5).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 2, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
        F.lit(True).alias("_in_new"),
    )
    joined = old.join(new, "o_orderkey", "full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("_in_old").isNull(), "added")
            .when(F.col("_in_new").isNull(), "deleted")
            .otherwise("changed"),
        )
        .filter(
            F.col("_in_old").isNull()
            | F.col("_in_new").isNull()
            # null-safe inequality: catches NULL<->value price transitions
            | ~F.col("old_price").eqNullSafe(F.col("new_price"))
        )
        .select("o_orderkey", "change_type", "old_price", "new_price")
        .orderBy("o_orderkey")
    )


@register(
    "rel_asof_forward",
    doc="FORWARD as-of join (operators.asof direction='forward'): each "
    "click picks up the user's NEXT signup at-or-after the click — "
    "next-event-after semantics (SLA lookups, label-at-horizon joins). "
    "Identical union+window plan as the backward form, traversed over "
    "descending time. Oracle: DuckDB ASOF LEFT JOIN with c.ts <= s.ts.",
    tags=("asof", "J-extra"),
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value
  FROM events WHERE event_type = 'click'
),
signups AS (
  -- dedup exact-duplicate timestamps deterministically (min event id)
  SELECT user_id, ts, min(sv) AS signup_value FROM (
    SELECT user_id, date_trunc('microseconds', ts) AS ts, value AS sv
    FROM events WHERE event_type = 'signup')
  GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       s.ts AS signup_ts,
       round(coalesce(s.signup_value, -1.0), 4) AS signup_value
FROM clicks c ASOF LEFT JOIN signups s
  ON c.user_id = s.user_id AND c.ts <= s.ts
""",
)
def rel_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.min("value").alias("signup_value"))
        .select("user_id", F.col("ts").alias("signup_ts"), "signup_value")
    )
    out = asof_join(
        clicks,
        signups,
        on="user_id",
        left_time="ts",
        right_time="signup_ts",
        payload_cols=["signup_ts", "signup_value"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "signup_ts",
        F.round(F.coalesce("signup_value", F.lit(-1.0)), 4).alias("signup_value"),
    )


@register(
    "rel_funnel_steps",
    doc="Ordered conversion funnel (view -> click -> purchase, each step "
    "within 48h of the previous, strictly increasing ts) — the "
    "Amplitude/Mixpanel-style event-analytics query the reference's "
    "event pipeline (recommendation-trainer.py consumes the same "
    "interaction stream) has no answer for. Each step is a user-keyed "
    "min-ts aggregate joined to the previous step's frontier; all three "
    "shuffles share the user_id key, so at 100 TB the plan is one "
    "exchange reused, with step frontiers |users|-sized. The 48h step "
    "window makes conversion discriminate on the fixture (~54h mean "
    "inter-arrival per event type).",
    tags=("A-extra", "J-extra"),
    bench=True,  # event-analytics headliner, timed every round (VERDICT r7 #8)
    oracle="""
WITH e AS (
  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts FROM events
),
s1 AS (SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t
         AND epoch_us(e.ts) - epoch_us(s1.t) <= 172800000000 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t
         AND epoch_us(e.ts) - epoch_us(s2.t) <= 172800000000 GROUP BY e.user_id),
u AS (
  SELECT CAST(1 AS INTEGER) AS step, 'view' AS step_name,
         CAST((SELECT count(*) FROM s1) AS BIGINT) AS users
  UNION ALL
  SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
  UNION ALL
  SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
)
SELECT step, step_name, users,
       round(CAST(users AS DOUBLE)
             / (SELECT CAST(count(*) AS DOUBLE) FROM s1), 6) AS conversion
FROM u
""",
)
def rel_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # NOT persisted (r12, measured): each step frontier is consumed 2-3
    # times and caching them looked like the textbook fix, but the A/B
    # showed 1.3-3x CPU/wall REGRESSION — at this scale the recomputed
    # subtree is one single-task events scan + a coalesced aggregate,
    # while the cache pays materialization plus 32-partition cached
    # scans per consumer (tasks 24 -> 237). See OPTIMIZATION_r12.md.
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    step_us = 172_800_000_000  # 48h conversion window per step
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (epoch_us("ts") - epoch_us("t1") <= step_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (epoch_us("ts") - epoch_us("t2") <= step_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def count_step(frontier: DataFrame, step: int, name: str) -> DataFrame:
        return frontier.agg(F.count("*").alias("users")).select(
            F.lit(step).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            F.col("users"),
        )

    steps = (
        count_step(s1, 1, "view")
        .unionByName(count_step(s2, 2, "click"))
        .unionByName(count_step(s3, 3, "purchase"))
    )
    base = s1.agg(F.count("*").cast("double").alias("_base"))
    return steps.crossJoin(F.broadcast(base)).select(
        "step",
        "step_name",
        "users",
        F.round(F.col("users") / F.col("_base"), 6).alias("conversion"),
    )


@register(
    "rel_retention_cohorts",
    doc="Weekly cohort retention triangle over high-value purchases "
    "(value > 100, ~1.5/user/month on the fixture so the triangle has "
    "real falloff): users cohorted by the week of their first qualifying "
    "purchase; qualifying-active weeks counted distinct against the "
    "cohort week. The standard product-analytics rollup — two "
    "user_id-keyed aggregates (one exchange reused) plus a tiny "
    "cohort-week join; output is |weeks|^2/2 rows regardless of scale.",
    tags=("A-extra", "W-extra"),
    bench=True,  # event-analytics headliner, timed every round (VERDICT r7 #8)
    oracle="""
WITH e AS (
  SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events
  WHERE event_type = 'purchase' AND value > 100.0
),
first_seen AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM e GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM e
),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first_seen GROUP BY cohort_week
)
SELECT CAST(f.cohort_week AS VARCHAR) AS cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INTEGER) AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users,
       s.cohort_size,
       round(CAST(count(DISTINCT a.user_id) AS DOUBLE) / s.cohort_size, 6)
         AS retention
FROM activity a
JOIN first_seen f ON a.user_id = f.user_id
JOIN sizes s ON f.cohort_week = s.cohort_week
GROUP BY f.cohort_week, week_offset, s.cohort_size
""",
)
def rel_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
        .select("user_id", "ts")
    )
    # NOT persisted despite the double consumption (sizes + join): the
    # r12 A/B showed the cache REGRESSES here for the same reason as
    # rel_funnel_steps — recompute is one single-task scan, the cache
    # adds 32-partition scan overhead per consumer.
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        activity.join(first_seen, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff("week", "cohort_week") / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


_TXNLOG_ORACLE = """
WITH upd AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0
              THEN round(o_totalprice * 1.1, 4)
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 97 = 0
              THEN 'ADJ' ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 101 <> 0
)
SELECT * FROM upd
UNION ALL
SELECT * FROM (VALUES
  (CAST(900000001 AS BIGINT), CAST(111.5 AS DOUBLE), 'NEW'),
  (CAST(900000002 AS BIGINT), CAST(222.25 AS DOUBLE), 'NEW')
) v(o_orderkey, o_totalprice, o_orderstatus)
ORDER BY o_orderkey
"""


@register(
    "rel_txnlog_snapshot",
    doc="ACID mutation cycle through the copy-on-write transaction log "
    "(operators.txnlog — Delta's _delta_log protocol on plain parquet): "
    "create an orders table, MERGE-style upsert (price adjustments + "
    "two inserts), delete a key set, then read the final snapshot. "
    "Every mutation is file-granular COW (only files containing an "
    "affected key rewrite; commit = one create-exclusive JSON link, so "
    "readers never see partial writes and old versions stay "
    "time-travel readable). The S8/S9/S12 upgrade over "
    "read-modify-overwrite parquet that VERDICT rounds 1-6 tracked as "
    "the table-format gap. Oracle replays the same mutations "
    "relationally.",
    tags=("S8", "S9", "S12", "txn"),
    oracle=_TXNLOG_ORACLE,
)
def rel_txnlog_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = tempfile.mkdtemp(prefix="newsify_txnlog_")
    try:
        path = f"{base}/orders_t"
        T.create_table(spark, path, orders.repartitionByRange(8, "o_orderkey"))
        adj = orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
            F.lit("ADJ").alias("o_orderstatus"),
        )
        ins = spark.createDataFrame(
            [(900000001, 111.5, "NEW"), (900000002, 222.25, "NEW")],
            "o_orderkey bigint, o_totalprice double, o_orderstatus string",
        )
        T.upsert_rows(spark, path, adj.unionByName(ins), ["o_orderkey"])
        T.delete_rows(
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
            ["o_orderkey"],
        )
        # materialize before the temp table is removed — the returned
        # plan must not read deleted files
        snap = T.read_table(spark, path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return snap.orderBy("o_orderkey")


_TXNLOG_CHANGES_ORACLE = """
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderstatus
  FROM orders
),
adj AS (
  SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS o_totalprice,
         'ADJ' AS o_orderstatus
  FROM base WHERE o_orderkey % 97 = 0
),
ins AS (
  SELECT CAST(k AS BIGINT) AS o_orderkey, CAST(p AS DOUBLE) AS o_totalprice,
         s AS o_orderstatus
  FROM (VALUES (900000001, 111.5, 'NEW'), (900000002, 222.25, 'NEW')) t(k, p, s)
),
v1_changes AS (
  SELECT 'insert' AS _change_type, 1 AS _commit_version, * FROM adj
  UNION ALL SELECT 'insert', 1, * FROM ins
  UNION ALL SELECT 'delete', 1, * FROM base WHERE o_orderkey % 97 = 0
),
state1 AS (
  SELECT * FROM base WHERE o_orderkey % 97 <> 0
  UNION ALL SELECT * FROM adj
  UNION ALL SELECT * FROM ins
),
v2_changes AS (
  SELECT 'delete' AS _change_type, 2 AS _commit_version, *
  FROM state1 WHERE o_orderkey % 101 = 0
)
SELECT _change_type, CAST(_commit_version AS INTEGER) AS _commit_version,
       o_orderkey, round(o_totalprice, 4) AS o_totalprice, o_orderstatus
FROM (SELECT * FROM v1_changes UNION ALL SELECT * FROM v2_changes)
ORDER BY _commit_version, o_orderkey, _change_type
"""


@register(
    "rel_txnlog_changes",
    doc="Change-data feed off the copy-on-write transaction log "
    "(operators.txnlog.read_changes — Delta's table_changes/CDF): the "
    "same ACID cycle rel_txnlog_snapshot runs (create, MERGE upsert, "
    "delete-by-keys), then the NET row changes of commits 1-2 read "
    "back as (_change_type, _commit_version, row): an update surfaces "
    "as its delete(preimage)+insert(postimage) pair, carried-over COW "
    "neighbor rows cancel via multiset exceptAll. The feed is derived "
    "purely from each commit's add/remove file lists, so its cost is "
    "the commits' blast radius, never table size — the downstream-sync "
    "primitive (CDC to a search index, cache invalidation) the "
    "reference's Mongo polling loop cannot express. Oracle replays the "
    "mutation cycle relationally.",
    tags=("S8", "S9", "S12", "txn", "cdc"),
    oracle=_TXNLOG_CHANGES_ORACLE,
)
def rel_txnlog_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = tempfile.mkdtemp(prefix="newsify_txnlog_cdc_")
    try:
        path = f"{base}/orders_t"
        T.create_table(spark, path, orders.repartitionByRange(8, "o_orderkey"))
        adj = orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
            F.lit("ADJ").alias("o_orderstatus"),
        )
        ins = spark.createDataFrame(
            [(900000001, 111.5, "NEW"), (900000002, 222.25, "NEW")],
            "o_orderkey bigint, o_totalprice double, o_orderstatus string",
        )
        T.upsert_rows(spark, path, adj.unionByName(ins), ["o_orderkey"])
        T.delete_rows(
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
            ["o_orderkey"],
        )
        feed = T.read_changes(spark, path, 1, 2).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return feed.select(
        "_change_type",
        "_commit_version",
        "o_orderkey",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderstatus",
    ).orderBy("_commit_version", "o_orderkey", "_change_type")


_TXNLOG_PRUNE_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM orders
WHERE o_orderkey <= (SELECT max(o_orderkey) // 10 FROM orders)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "rel_txnlog_prune",
    doc="Stats-based data skipping on the copy-on-write transaction log "
    "(operators.txnlog r10: every commit records per-file min/max/null "
    "counts harvested from the parquet footers it just wrote — a "
    "driver-side metadata read, no data re-scan — and "
    "read_table(where=...) opens only files whose interval can hold a "
    "match, re-applying the predicate row-level so pruning is never a "
    "semantics change; Delta/Iceberg data skipping). The table is "
    "key-range clustered at create, so the bottom-decile key predicate "
    "provably touches ~1/10 of the files (tests/test_txnlog_skipping.py "
    "pins the skip counts; this query pins the VALUES). Oracle: the "
    "same predicate + rollup straight on the parquet.",
    tags=("S6", "S7", "txn", "skipping"),
    oracle=_TXNLOG_PRUNE_ORACLE,
)
def rel_txnlog_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    # bounded 1-row collect: the pruning literal, same derivation as the
    # oracle's scalar subquery
    thr = orders.agg(F.max("o_orderkey")).first()[0] // 10

    def build(path: str) -> None:
        T.create_table(
            spark, path, orders.repartitionByRange(16, "o_orderkey")
        )

    path = _staged_table("txnlog_prune", sf_dir, build)
    snap = T.read_table(spark, path, where=[("o_orderkey", "<=", thr)])
    return (
        snap.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "stream_cdf_feed",
    doc="STREAMING change-data-feed source over the transaction log "
    "(streaming.cdf r11: commit versions are the stream offsets — "
    "Delta's CDF streaming source). The same ACID cycle as "
    "rel_txnlog_changes (create, MERGE upsert, delete-by-keys), but "
    "the feed is DELIVERED as per-commit micro-batches through a "
    "foreachBatch-shaped consumer that lands each batch in a "
    "DOWNSTREAM txnlog table via idempotent_append(batch_id=commit "
    "version) — then batch 1 is REPLAYED to prove the transactional "
    "marker makes redelivery a no-op (exactly-once end to end, the "
    "contract Spark's foreachBatch + Delta txn sink pair gives). The "
    "returned rows are the downstream table's final contents, which "
    "must equal the one-shot batch read_changes — hence the SAME "
    "relational oracle as rel_txnlog_changes: stream/batch parity is "
    "itself the assertion.",
    tags=("T-extra", "txn", "cdc", "streaming"),
    oracle=_TXNLOG_CHANGES_ORACLE,
)
def stream_cdf_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import txnlog as T
    from newsify_spark.streaming.cdf import run_cdf_feed

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = tempfile.mkdtemp(prefix="newsify_cdf_feed_")
    try:
        path = f"{base}/orders_t"
        sink = f"{base}/feed_sink"
        T.create_table(spark, path, orders.repartitionByRange(8, "o_orderkey"))
        adj = orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
            F.lit("ADJ").alias("o_orderstatus"),
        )
        ins = spark.createDataFrame(
            [(900000001, 111.5, "NEW"), (900000002, 222.25, "NEW")],
            "o_orderkey bigint, o_totalprice double, o_orderstatus string",
        )
        T.upsert_rows(spark, path, adj.unionByName(ins), ["o_orderkey"])
        T.delete_rows(
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
            ["o_orderkey"],
        )

        def consume(batch_df: DataFrame, batch_id: int) -> None:
            T.idempotent_append(spark, sink, batch_df, "cdf_demo", batch_id)

        from newsify_spark.streaming.cdf import stream_changes

        last = run_cdf_feed(spark, path, consume, from_version=1)
        # replay the first batch: the txn marker must make it a no-op
        _, hi, replay = next(stream_changes(spark, path, 1, 1))
        consume(replay, hi)
        if last != 2:  # explicit raise: survives `python -O` (VERDICT r11)
            raise RuntimeError(f"cdf feed delivered through {last}, want 2")
        feed = T.read_table(spark, sink).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return feed.select(
        "_change_type",
        "_commit_version",
        "o_orderkey",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderstatus",
    ).orderBy("_commit_version", "o_orderkey", "_change_type")


# --- staged lakehouse fixtures ---------------------------------------------
# The txnlog bench queries previously re-created + re-optimized their COW
# table INSIDE the timed body, so the headline number measured staging
# (write/rewrite throughput) and a regression in the READ/skip path —
# the thing the query actually sells — was invisible inside it (VERDICT
# r10 #3). Staging now runs once per (kind, sf_dir) per process, its
# wall time recorded for bench.py to report as a separate "staging"
# component; repeat calls (bench passes 2..n) time only the read path.
# The correctness contract is unchanged: same table, same values.

_STAGED_TABLES: dict[tuple[str, str], str] = {}
STAGING_SECONDS: dict[str, float] = {}


def _staged_table(kind: str, sf_dir: str, build) -> str:
    import atexit
    import os
    import shutil
    import tempfile
    import time

    key = (kind, sf_dir)
    cached = _STAGED_TABLES.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    base = tempfile.mkdtemp(prefix=f"newsify_stage_{kind}_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = f"{base}/t"
    t0 = time.perf_counter()
    build(path)
    STAGING_SECONDS[kind] = round(time.perf_counter() - t0, 3)
    _STAGED_TABLES[key] = path
    return path


_TXNLOG_ZORDER_ORACLE = """
WITH thr AS (
  SELECT max(l_orderkey) // 8 AS ko, max(l_partkey) // 8 AS kp
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS total_price
FROM lineitem, thr
WHERE l_orderkey <= thr.ko AND l_partkey <= thr.kp
"""


@register(
    "rel_txnlog_zorder",
    doc="OPTIMIZE ZORDER as a transaction-log commit "
    "(operators.txnlog.optimize(zorder_by=...): the snapshot rewrites "
    "range-partitioned on an interleaved-bit key of equi-depth bucket "
    "codes — approxQuantile boundaries folded as literal-array "
    "expressions, no UDF — so per-file footer stats tighten on BOTH "
    "listed columns and the two-sided predicate prunes files the "
    "adversarial l_suppkey-ordered initial layout could not; Delta's "
    "OPTIMIZE ... ZORDER BY). Data-identical by construction (the "
    "optimize commit's CDF nets to zero; test-pinned), so the oracle is "
    "the plain two-predicate rollup on the raw parquet.",
    tags=("S6", "txn", "skipping", "layout"),
    bench=True,
    oracle=_TXNLOG_ZORDER_ORACLE,
)
def rel_txnlog_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators import txnlog as T

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    mx = li.agg(
        F.max("l_orderkey").alias("ko"), F.max("l_partkey").alias("kp")
    ).first()
    ko, kp = mx["ko"] // 8, mx["kp"] // 8

    def build(path: str) -> None:
        # adversarial create: files clustered on an UNRELATED column, so
        # every file spans the full (l_orderkey, l_partkey) range —
        # only the Z-order rewrite makes the predicate below prunable
        T.create_table(spark, path, li.repartitionByRange(16, "l_suppkey"))
        T.optimize(
            spark, path, target_bytes=512 << 10,
            zorder_by=["l_orderkey", "l_partkey"],
        )

    path = _staged_table("txnlog_zorder", sf_dir, build)
    snap = T.read_table(
        spark,
        path,
        where=[("l_orderkey", "<=", ko), ("l_partkey", "<=", kp)],
    )
    return snap.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


_TXNLOG_POINT_LOOKUP_ORACLE = """
WITH b AS (
  SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM orders
),
keys AS (
  SELECT DISTINCT k FROM (
    SELECT lo AS k FROM b
    UNION ALL SELECT hi FROM b
    UNION ALL
    SELECT max(o_orderkey) FROM orders, b WHERE o_orderkey <= (lo + hi) // 2
  )
)
SELECT o.o_orderkey, o.o_custkey,
       round(CAST(o.o_totalprice AS DOUBLE), 2) AS o_totalprice
FROM orders o JOIN keys ON o.o_orderkey = keys.k
ORDER BY o.o_orderkey
"""


@register(
    "rel_txnlog_point_lookup",
    doc="Bloom-pruned point lookups on the copy-on-write transaction "
    "log (operators.txnlog r11: tables opted in via bloom_cols record "
    "a per-file CRC32-double-hash bloom bitmap in every commit entry — "
    "operators/bloom.py's (word, bit_or-mask) build keyed by file — "
    "and read_table(where=[(k,'=',v)]) skips files whose bitmap proves "
    "the key absent). min/max intervals prune NOTHING here by "
    "construction: the table is hash-partitioned on the key, so every "
    "file spans the whole domain and only the bitmap rules files out "
    "(tests/test_txnlog_skipping.py pins <=4 of 32 files opened; this "
    "query pins the VALUES on three data-derived keys: min, max, and "
    "the largest key at-or-below the midpoint). False positives cost a "
    "read; false negatives are impossible — the probe (driver-side "
    "zlib.crc32) and the build (executor-side F.crc32) are the same "
    "public function bit-for-bit.",
    tags=("S7", "txn", "skipping", "bloom"),
    bench=True,
    oracle=_TXNLOG_POINT_LOOKUP_ORACLE,
)
def rel_txnlog_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # Two sequential driver actions, kept deliberately (r12, measured):
    # folding lo/hi/mid into one action via a broadcast-bounds crossJoin
    # pushed 150k rows through a BroadcastNestedLoopJoin and cost MORE
    # (cpu_min 1.94-2.17 -> 2.45-3.90) than the round trip it saved.
    b = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).first()
    mid = (
        orders.filter(F.col("o_orderkey") <= (b.lo + b.hi) // 2)
        .agg(F.max("o_orderkey"))
        .first()[0]
    )

    def build(path: str) -> None:
        # hash layout: min/max stats are useless for `=`, blooms are not
        T.create_table(
            spark, path, orders.repartition(16), bloom_cols=["o_orderkey"]
        )

    path = _staged_table("txnlog_point_lookup", sf_dir, build)
    out = None
    for key in {int(b.lo), int(b.hi), int(mid)}:
        hit = T.read_table(spark, path, where=[("o_orderkey", "=", key)])
        out = hit if out is None else out.unionByName(hit)
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    ).orderBy("o_orderkey")


_TXNLOG_IN_LOOKUP_ORACLE = """
WITH keys AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
  WHERE o_orderkey % 97 = 0
  ORDER BY k LIMIT 5
)
SELECT o.o_orderkey, o.o_custkey,
       round(CAST(o.o_totalprice AS DOUBLE), 2) AS o_totalprice
FROM orders o JOIN keys ON o.o_orderkey = keys.k
ORDER BY o.o_orderkey
"""


@register(
    "rel_txnlog_in_lookup",
    doc="Batched point lookup — the fetch-N-keys serving shape "
    "(VERDICT r11 #7) — on the bloom-indexed copy-on-write table: ONE "
    "read_table(where=[(k, 'in', keys)]) call whose file pruning is the "
    "per-key UNION of the bloom/interval prunes (operators/txnlog.py "
    "_file_can_match routes each 'in' literal through the full '=' "
    "path), then one scan over the union re-applies isin() row-level. "
    "Shares the hash-layout staged table with rel_txnlog_point_lookup: "
    "min/max intervals prune nothing there by construction, so any "
    "skipping is the bitmaps' (skip-count pinned in "
    "tests/test_txnlog_skipping.py). Keys are data-derived: the 5 "
    "smallest order keys divisible by 97.",
    tags=("S7", "txn", "skipping", "bloom"),
    oracle=_TXNLOG_IN_LOOKUP_ORACLE,
)
def rel_txnlog_in_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    keys = [
        int(r[0])
        for r in orders.filter(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey")
        .distinct()
        .orderBy("o_orderkey")
        .limit(5)
        .collect()
    ]

    def build(path: str) -> None:
        T.create_table(
            spark, path, orders.repartition(16), bloom_cols=["o_orderkey"]
        )

    path = _staged_table("txnlog_point_lookup", sf_dir, build)
    hit = T.read_table(spark, path, where=[("o_orderkey", "in", keys)])
    return hit.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    ).orderBy("o_orderkey")


_TXNLOG_DV_READ_ORACLE = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM orders
WHERE NOT (o_orderkey % 97 = 0 OR o_orderkey % 101 = 0)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "rel_txnlog_dv_read",
    doc="Merge-on-read DELETION VECTORS on the copy-on-write transaction "
    "log (operators.txnlog round 12 — Delta's DV protocol / Iceberg "
    "position deletes, public designs): two point-delete batches land "
    "as kilobyte (file, position) sidecars — Spark's "
    "_metadata.row_index — with ZERO data files rewritten (pinned in "
    "tests/test_txnlog_dv.py), and the snapshot read anti-joins the "
    "broadcast vectors out before aggregating. The second batch "
    "accumulates onto files the first already annotated, exercising the "
    "vector-union replay. Kills the write amplification of the "
    "delete-one-key-per-request shape (GDPR erasure) that copy-on-write "
    "pays a full file rewrite for. Oracle: the rollup with both key "
    "sets filtered relationally.",
    tags=("S12", "txn", "dv", "merge-on-read"),
    oracle=_TXNLOG_DV_READ_ORACLE,
)
def rel_txnlog_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="newsify_txnlog_dv_")
    try:
        path = f"{base}/orders_t"
        T.create_table(spark, path, orders.repartition(8))
        T.delete_rows(
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"),
            ["o_orderkey"],
            mode="dv",
        )
        T.delete_rows(
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
            ["o_orderkey"],
            mode="dv",
        )
        snap = T.read_table(spark, path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        snap.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


_TXNLOG_DV_CDF_ORACLE = """
SELECT 'delete' AS _change_type, 1 AS _commit_version,
       o_orderkey, round(CAST(o_totalprice AS DOUBLE), 4) AS o_totalprice,
       o_orderstatus
FROM orders WHERE o_orderkey % 97 = 0
UNION ALL
SELECT 'delete', 2, o_orderkey, round(CAST(o_totalprice AS DOUBLE), 4),
       o_orderstatus
FROM orders
WHERE o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
ORDER BY _commit_version, o_orderkey
"""


@register(
    "rel_txnlog_dv_cdf",
    doc="Change-data feed over deletion-vector commits "
    "(operators.txnlog.read_changes + _dv_delete_images): each DV "
    "commit emits EXACT delete images — the vectors' (file, position) "
    "pairs joined back against the annotated files, tagged with the "
    "vector's own commit version — with no exceptAll reconstruction "
    "needed because positions are precise. The second batch overlaps "
    "the first (keys divisible by both 97 and 101): the writer excludes "
    "already-deleted positions, so every row appears in AT MOST ONE "
    "commit's images — the invariant the oracle pins by crediting "
    "overlap keys to commit 1 only.",
    tags=("S12", "txn", "dv", "cdc"),
    oracle=_TXNLOG_DV_CDF_ORACLE,
)
def rel_txnlog_dv_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = tempfile.mkdtemp(prefix="newsify_txnlog_dvcdf_")
    try:
        path = f"{base}/orders_t"
        T.create_table(spark, path, orders.repartition(8))
        T.delete_rows(
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"),
            ["o_orderkey"],
            mode="dv",
        )
        T.delete_rows(
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
            ["o_orderkey"],
            mode="dv",
        )
        feed = T.read_changes(spark, path, 1, 2).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return feed.select(
        "_change_type",
        "_commit_version",
        "o_orderkey",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderstatus",
    ).orderBy("_commit_version", "o_orderkey")


_MV_INCREMENTAL_ORACLE = """
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
  FROM orders
),
adj AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_cents * 1.1) AS BIGINT) AS o_cents
  FROM base WHERE o_orderkey % 97 = 0
),
state1 AS (
  SELECT * FROM base WHERE o_orderkey % 97 <> 0
  UNION ALL SELECT * FROM adj
),
final AS (
  SELECT * FROM state1 WHERE o_orderkey % 101 <> 0
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_cents) AS BIGINT) / 100.0, 2) AS revenue
FROM final
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register(
    "rel_mv_incremental",
    doc="Incrementally maintained materialized view "
    "(operators.matview round 12 — Gupta-Mumick counting over the "
    "transaction log's change feed; the public IVM design behind Delta "
    "Live Tables / Materialize): a per-customer (count, sum revenue) "
    "view is materialized once, the source then takes a MERGE upsert "
    "and a bulk delete, and ONE refresh applies only the commits' "
    "delta stream — sign-weighted partial aggregates merged "
    "file-granularly into the view, zero-count groups dropped — with "
    "the consumed source version committed ATOMICALLY with the rows "
    "(txn marker => replays are no-ops, exactly-once). Refresh cost is "
    "O(changes), never O(table): the 100 TB answer to the reference's "
    "poll-loop re-aggregation (batch-cluster-service.py rollups). The "
    "measure is integer CENTS so additive maintenance is EXACT — "
    "incremental double sums differ from a single-pass sum in the last "
    "bits (5 of 1500 groups straddled a cent boundary under the "
    "driver's 200-partition session), and exact arithmetic is what a "
    "production IVM over money would use anyway. Oracle: the full "
    "re-aggregation of the mutated state — the view must equal it "
    "row-for-row.",
    tags=("A1", "txn", "cdc", "matview", "ivm"),
    oracle=_MV_INCREMENTAL_ORACLE,
)
def rel_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import matview as MVIEW
    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    base = tempfile.mkdtemp(prefix="newsify_mv_")
    try:
        src = f"{base}/orders_t"
        mv = f"{base}/orders_mv"
        T.create_table(spark, src, orders.repartitionByRange(8, "o_orderkey"))
        MVIEW.create_matview(
            spark,
            mv,
            src,
            ["o_custkey"],
            sums={"cents": "o_cents"},
            count_col="n_orders",
        )
        adj = orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_cents") * 1.1).cast("long").alias("o_cents"),
        )
        T.upsert_rows(spark, src, adj, ["o_orderkey"])
        T.delete_rows(
            spark,
            src,
            orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
            ["o_orderkey"],
        )
        if MVIEW.refresh_matview(spark, mv) is None:
            raise RuntimeError("refresh applied no source commits")
        snap = T.read_table(spark, mv).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return snap.select(
        "o_custkey",
        "n_orders",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
    ).orderBy("o_custkey")


_TXNLOG_RESTORE_ORACLE = """
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderstatus
  FROM orders
),
adj AS (
  SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS o_totalprice,
         'ADJ' AS o_orderstatus
  FROM base WHERE o_orderkey % 97 = 0
),
state1 AS (
  SELECT * FROM base WHERE o_orderkey % 97 <> 0
  UNION ALL SELECT * FROM adj
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM state1
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "rel_txnlog_restore",
    doc="RESTORE as a transaction-log commit (operators.txnlog.restore "
    "round 12 — Delta's RESTORE TABLE ... VERSION AS OF): after a MERGE "
    "upsert (v1), a copy-on-write delete (v2) and a merge-on-read "
    "DELETION-VECTOR delete (v3), the table restores to v1 — dropped "
    "files re-enter BY REFERENCE with their commit-recorded stats "
    "(metadata-only; only vector-divergent files rewrite), files added "
    "since are removed, history and time travel stay intact and the "
    "restore's own change feed is the exact net diff "
    "(tests/test_txnlog_restore.py pins all of it). Oracle: the "
    "post-upsert state rebuilt relationally — the restored snapshot "
    "must equal it.",
    tags=("S9", "S12", "txn", "restore"),
    oracle=_TXNLOG_RESTORE_ORACLE,
)
def rel_txnlog_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = tempfile.mkdtemp(prefix="newsify_txnlog_restore_")
    try:
        path = f"{base}/orders_t"
        T.create_table(spark, path, orders.repartitionByRange(8, "o_orderkey"))
        adj = orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
            F.lit("ADJ").alias("o_orderstatus"),
        )
        T.upsert_rows(spark, path, adj, ["o_orderkey"])  # v1
        T.delete_rows(  # v2: copy-on-write
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
            ["o_orderkey"],
        )
        T.delete_rows(  # v3: merge-on-read deletion vector
            spark,
            path,
            orders.filter(F.col("o_orderkey") % 103 == 0).select("o_orderkey"),
            ["o_orderkey"],
            mode="dv",
        )
        if T.restore(spark, path, 1) is None:
            raise RuntimeError("restore found nothing to do")
        snap = T.read_table(spark, path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        snap.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


_TXNLOG_PARTITION_ORACLE = """
WITH thr AS (SELECT max(o_orderkey) // 10 AS k FROM orders)
SELECT o_orderpriority, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM orders, thr
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderkey <= thr.k
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
"""


@register(
    "rel_txnlog_partition_prune",
    doc="HIVE-STYLE PARTITIONED TABLE on the transaction log "
    "(operators.txnlog round 12 — Delta/Iceberg partitioning, public "
    "designs): orders partition by o_orderpriority and range-cluster on "
    "o_orderkey within partitions, the '5-LOW' partition is then "
    "DELETED BY ITS PARTITION KEY (the CoW blast radius is exactly "
    "that partition's files — pinned in tests/test_txnlog_partition"
    ".py), and the timed read probes an in-list over three partitions "
    "(one of them the deleted one) plus a bottom-decile key predicate. "
    "Partition values fold into per-file stats as min=max intervals at "
    "write, so the ONE prune loop layers partition pruning over footer "
    "stats — the first-order prune at 100 TB: a one-partition query "
    "opens that partition's files before footer stats are even "
    "consulted — and the scan re-attaches partition columns via a "
    "single broadcast file->values join (one plan node at any "
    "partition count, never a union-per-partition). Oracle: the same "
    "predicate + rollup relationally (the deleted partition filtered "
    "by the IN list's surviving members).",
    tags=("S6", "S12", "txn", "skipping", "partitioning"),
    bench=True,  # added r12 mid-round: no envelope yet; the gate adopts
    # it from the first clean run per BASELINE_BENCH.json policy
    oracle=_TXNLOG_PARTITION_ORACLE,
)
def rel_txnlog_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    thr = orders.agg(F.max("o_orderkey")).first()[0] // 10

    def build(path: str) -> None:
        T.create_table(
            spark,
            path,
            orders.repartitionByRange(8, "o_orderkey"),
            partition_by=["o_orderpriority"],
        )
        T.delete_rows(
            spark,
            path,
            spark.createDataFrame([("5-LOW",)], "o_orderpriority string"),
            keys=["o_orderpriority"],
        )

    path = _staged_table("txnlog_partition", sf_dir, build)
    snap = T.read_table(
        spark,
        path,
        where=[
            ("o_orderpriority", "in", ["1-URGENT", "2-HIGH", "5-LOW"]),
            ("o_orderkey", "<=", thr),
        ],
    )
    return (
        snap.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


_TXNLOG_MERGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
src AS (
  SELECT o_orderkey,
         round(CAST(o_totalprice * 1.1 AS DOUBLE), 4) AS new_price,
         CASE WHEN o_orderkey % 194 = 0 THEN 'DEL' ELSE 'ADJ' END AS action
  FROM base WHERE o_orderkey % 97 = 0
),
matched AS (
  SELECT b.o_orderkey,
         CASE WHEN s.action = 'ADJ' AND b.o_orderstatus <> 'F'
              THEN 'ADJ' ELSE b.o_orderstatus END AS o_orderstatus,
         CASE WHEN s.action = 'ADJ' AND b.o_orderstatus <> 'F'
              THEN s.new_price ELSE b.o_totalprice END AS o_totalprice,
         s.action
  FROM base b LEFT JOIN src s USING (o_orderkey)
),
kept AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM matched
  WHERE action IS NULL OR action <> 'DEL'
),
ins AS (
  SELECT max(o_orderkey) + 1 AS o_orderkey, 'NEW' AS o_orderstatus,
         CAST(1000.0 AS DOUBLE) AS o_totalprice
  FROM base
),
final AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM final
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "rel_txnlog_merge",
    doc="General three-clause MERGE INTO on the transaction log "
    "(operators.txnlog.merge_table round 12 — Delta's MERGE semantics, "
    "public): a heterogeneous source (new_price + an action flag, NOT "
    "the target schema) drives a conditional matched-UPDATE "
    "(s.action='ADJ' AND t.o_orderstatus<>'F' — both sides referenced), "
    "a matched-DELETE (s.action='DEL', tested first per Delta clause "
    "order), and a not-matched-INSERT with an assignment map, all in "
    "ONE file-granular copy-on-write commit: one broadcast of the "
    "source against the stats-pruned victim slice, one full-outer "
    "join, blast radius = matched files only "
    "(tests/test_txnlog_merge.py pins clause precedence, three-valued "
    "condition logic, CDF decomposition, CHECK/DV/partition "
    "interplay). Oracle: the same clause algebra spelled relationally "
    "(LEFT JOIN + CASE + anti-DEL filter + UNION ALL insert).",
    tags=("S9", "S12", "txn", "merge"),
    oracle=_TXNLOG_MERGE_ORACLE,
)
def rel_txnlog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import txnlog as T

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = tempfile.mkdtemp(prefix="newsify_txnlog_merge_")
    try:
        path = f"{base}/orders_t"
        T.create_table(spark, path, orders.repartitionByRange(8, "o_orderkey"))
        upd = orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("new_price"),
            F.when(F.col("o_orderkey") % 194 == 0, F.lit("DEL"))
            .otherwise(F.lit("ADJ"))
            .alias("action"),
        )
        ins = orders.agg(
            (F.max("o_orderkey") + 1).alias("o_orderkey")
        ).select(
            "o_orderkey",
            F.lit(1000.0).alias("new_price"),
            F.lit("INS").alias("action"),
        )
        T.merge_table(
            spark,
            path,
            upd.unionByName(ins),
            on=["o_orderkey"],
            when_matched_update={
                "o_totalprice": "s.new_price",
                "o_orderstatus": "'ADJ'",
            },
            when_matched_update_condition=(
                "s.action = 'ADJ' AND t.o_orderstatus <> 'F'"
            ),
            when_matched_delete="s.action = 'DEL'",
            when_not_matched_insert={
                "o_orderkey": "s.o_orderkey",
                "o_orderstatus": "'NEW'",
                "o_totalprice": "s.new_price",
            },
        )
        snap = T.read_table(spark, path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        snap.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


_STREAM_MV_ORACLE = """
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
adj1 AS (
  SELECT k, o_custkey, CAST(round(cents * 1.1) AS BIGINT) AS cents
  FROM base WHERE k % 97 = 0
),
state1 AS (
  SELECT * FROM base WHERE k % 97 <> 0 UNION ALL SELECT * FROM adj1
),
state2 AS (SELECT * FROM state1 WHERE k % 101 <> 0),
adj2 AS (
  SELECT k, o_custkey, CAST(round(cents * 1.2) AS BIGINT) AS cents
  FROM base WHERE k % 103 = 0
),
state3 AS (
  SELECT * FROM state2 WHERE k % 103 <> 0 UNION ALL SELECT * FROM adj2
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS revenue
FROM state3
GROUP BY o_custkey
ORDER BY o_custkey
"""


@register(
    "stream_matview_feed",
    doc="STREAMING incremental view maintenance "
    "(streaming.cdf.follow_matview round 12 — the Delta Live Tables "
    "shape): a per-customer (count, sum cents) materialized view TAILS "
    "its source's change feed, refreshing once per source commit "
    "(batch_commits=1) through three mutations (MERGE upsert, bulk "
    "delete, second upsert that RE-INSERTS some previously deleted "
    "keys), so every intermediate view version is a consistent "
    "snapshot at a source commit boundary. The tailer's offset IS the "
    "view's txn marker — persisted atomically with each refresh's rows "
    "— so the in-query REPLAY of the whole feed must produce zero new "
    "view commits (exactly-once, raised on violation, not asserted). "
    "Per-chunk cost is the commit's blast radius + affected view "
    "files, never source size. Oracle: the three-state mutation "
    "algebra re-aggregated relationally — the view's final contents "
    "must equal it row-for-row (integer cents => incremental sums are "
    "exact).",
    tags=("T-extra", "txn", "cdc", "matview", "ivm", "streaming"),
    oracle=_STREAM_MV_ORACLE,
)
def stream_matview_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import matview as MVIEW
    from newsify_spark.operators import txnlog as T
    from newsify_spark.streaming.cdf import follow_matview

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    base = tempfile.mkdtemp(prefix="newsify_stream_mv_")
    try:
        src = f"{base}/orders_t"
        mv = f"{base}/orders_mv"
        T.create_table(spark, src, orders.repartitionByRange(8, "o_orderkey"))
        MVIEW.create_matview(
            spark, mv, src, ["o_custkey"],
            sums={"cents": "o_cents"}, count_col="n_orders",
        )
        adj1 = orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_cents") * 1.1).cast("long").alias("o_cents"),
        )
        T.upsert_rows(spark, src, adj1, ["o_orderkey"])
        T.delete_rows(
            spark, src,
            orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey"),
            ["o_orderkey"],
        )
        adj2 = orders.filter(F.col("o_orderkey") % 103 == 0).select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_cents") * 1.2).cast("long").alias("o_cents"),
        )
        T.upsert_rows(spark, src, adj2, ["o_orderkey"])
        refreshed = follow_matview(spark, mv, batch_commits=1)
        if len(refreshed) != 3:
            raise RuntimeError(
                f"expected one view refresh per source commit, got "
                f"{refreshed}"
            )
        if follow_matview(spark, mv, batch_commits=1):
            raise RuntimeError("replaying the feed produced new commits")
        snap = T.read_table(spark, mv).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return snap.select(
        "o_custkey",
        "n_orders",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
    ).orderBy("o_custkey")

"""Relational ★ operators (SURVEY.md §2.1-2.8) as oracle-checked queries.

Each query re-expresses one or more reference operators over the driver
fixtures. Reference citations are on each function; DuckDB oracle SQL is
the registration argument. Determinism rules from registry.py apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newsify_spark.functions.scalars import epoch_us, event_score, safe_div
from newsify_spark.operators.merge import bulk_update, upsert_by_key
from newsify_spark.operators.topk import top_k_per_group
from newsify_spark.queries.registry import register
from newsify_spark.tables import load

# Weights for the fixture's event vocabulary (click/view/purchase/signup/
# error), mirroring the reference's interaction-score map shape
# (recommendation-trainer.py:34-43: like 1.0 / share .5 / click .1 /
# read .01 / else 0).
EVENT_WEIGHTS = {"purchase": 1.0, "signup": 0.5, "click": 0.1, "view": 0.01}

# CAST to DOUBLE: DuckDB types bare numeric literals as DECIMAL, and
# DECIMAL aggregates surface as Decimal objects to the driver's hash —
# a type mismatch even when the values are equal.
EVENT_WEIGHTS_SQL = (
    "CAST(CASE event_type WHEN 'purchase' THEN 1.0 WHEN 'signup' THEN 0.5 "
    "WHEN 'click' THEN 0.1 WHEN 'view' THEN 0.01 ELSE 0.0 END AS DOUBLE)"
)


def _max_ts(events: DataFrame) -> DataFrame:
    """1-row (mx) frame: deterministic 'now' derived from the data
    (SURVEY.md §7.5.7 — no current_timestamp in oracle-checked queries).
    Cross-joined, it broadcasts — no shuffle on the big side."""
    return events.agg(F.max("ts").alias("mx"))


@register(
    "rel_pricing_summary",
    doc="TPC-H Q1 shape: range predicate + 8-agg groupBy (A: sum/avg/count; P4; O1). "
    "Partial aggregation map-side; scan prunes to 7 columns.",
    tags=("A1", "P4", "O1"),
    bench=True,
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                        AS sum_qty,
       round(sum(l_extendedprice), 4)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       CAST(count(*) AS BIGINT)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "rel_revenue_by_nation",
    doc="Multi-way join with broadcast dims (J2/J3 shape): lineitem⋈orders⋈"
    "customer⋈nation⋈region, revenue per nation. Dims broadcast — the "
    "fact table never shuffles for them; only the orders join shuffles.",
    tags=("J2", "A1"),
    bench=True,
    oracle="""
SELECT n_name, r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(DISTINCT o_orderkey) AS BIGINT)        AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
""",
)
def rel_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    # two-level aggregation instead of count(DISTINCT ...): the per-order
    # pre-agg keeps everything in plain partial-aggregating hash
    # aggregates — no Expand operator doubling the shuffled rows. The
    # orderkey level collapses BEFORE any join (orderkey functionally
    # determines customer/nation/region, so grouping by it alone is the
    # same partition of lineitem rows): the dim joins then probe one row
    # per order instead of one per lineitem, and the orderkey exchange
    # carries (key, partial sum) with no nation/region strings
    per_order = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_o")
    )
    joined = (
        per_order.join(orders, "o_orderkey")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name", "r_name").agg(
        F.round(F.sum("rev_o"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


@register(
    "rel_top_revenue_orders",
    doc="Group-count + top-N (A1/O1; reference recommendation-trainer.py:"
    "122-130 popularity pipeline). Deterministic tiebreak on orderkey.",
    tags=("A1", "O1"),
    oracle="""
SELECT l_orderkey AS order_key,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT)                          AS n_items
FROM lineitem
GROUP BY l_orderkey
ORDER BY revenue DESC, order_key ASC
LIMIT 10
""",
)
def rel_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("order_key"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("order_key").asc())
        .limit(10)
    )


@register(
    "rel_point_lookup",
    doc="S7 point lookup by key + P1 projection (reference find_one, "
    "recommendation-trainer.py:66). Key derived from data (min orderkey).",
    tags=("S7", "P1", "P3"),
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_orderkey = (SELECT min(o_orderkey) FROM orders)
""",
)
def rel_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    key = orders.agg(F.min("o_orderkey").alias("k"))
    return (
        li.join(F.broadcast(key), li.l_orderkey == F.col("k"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
    )


@register(
    "rel_membership_filter",
    doc="P5 membership predicate ($in; api_gateway_service.py:292).",
    tags=("P5",),
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 4) AS total
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
""",
)
def rel_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


@register(
    "rel_computed_projection",
    doc="P2 computed projection with casts/defaults (F16/F17; api_gateway_"
    "service.py:303-312) + F3 substring + F14 JSON field.",
    tags=("P2", "F16", "F17", "F3", "F14"),
    oracle="""
SELECT event_id,
       CAST(user_id AS VARCHAR)                                   AS user_str,
       upper(event_type)                                          AS event_upper,
       coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_val,
       substr(props, 1, 8)                                        AS props_head
FROM events
""",
)
def rel_computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("user_id").cast("string").alias("user_str"),
        F.upper("event_type").alias("event_upper"),
        F.coalesce(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)).alias("k_val"),
        F.substring("props", 1, 8).alias("props_head"),
    )


@register(
    "rel_recent_window_agg",
    doc="P4 sliding time-range predicate relative to data max (reference 7-day "
    "drift window, recommendation-trainer.py:46-48).",
    tags=("P4", "A1"),
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(avg(value), 6) AS avg_value
FROM events, (SELECT max(date_trunc('microseconds', ts)) AS mx FROM events)
WHERE date_trunc('microseconds', ts) >= mx - INTERVAL 7 DAY
GROUP BY event_type
""",
)
def rel_recent_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.crossJoin(F.broadcast(_max_ts(ev)))
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 7 DAYS"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


@register(
    "rel_distinct_users",
    doc="A8 distinct (recommendation-trainer.py:216,245).",
    tags=("A8",),
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT)                AS n_events
FROM events GROUP BY event_type
""",
)
def rel_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )


@register(
    "rel_anti_join_customers",
    doc="J7/E2 anti join (set difference; batch-cluster-service.py:176-177).",
    tags=("J7", "E2"),
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
)
def rel_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customers with no finished order — non-empty on the fixture (an
    # unfiltered anti join matches 0 customers there, which hash-matches
    # trivially and proves nothing)
    cust = load(spark, sf_dir, "customer")
    fin = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        fin, cust.c_custkey == fin.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "rel_semi_join_orders",
    doc="P5 semi join (EXISTS; large-list membership the reference does via "
    "$in, summarization-service.py:54).",
    tags=("P5", "J1"),
    oracle="""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
GROUP BY o_orderstatus
""",
)
def rel_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") >= 49)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@register(
    "rel_full_outer_merge",
    doc="J8/E3 full-outer combine of two scored sides with coalesce(0) "
    "(combine_recommendations, recommendation-trainer.py:132-161) + F10 "
    "weighted sum.",
    tags=("J8", "E3", "F10"),
    oracle="""
WITH a AS (SELECT user_id, sum(value) AS click_score FROM events
           WHERE event_type = 'click' GROUP BY user_id),
     b AS (SELECT user_id, sum(value) AS purchase_score FROM events
           WHERE event_type = 'purchase' GROUP BY user_id)
SELECT coalesce(a.user_id, b.user_id)                 AS user_id,
       round(coalesce(a.click_score, 0), 4)           AS click_score,
       round(coalesce(b.purchase_score, 0), 4)        AS purchase_score,
       round(0.7 * coalesce(a.click_score, 0)
           + 0.3 * coalesce(b.purchase_score, 0), 4)  AS combined
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
""",
)
def rel_full_outer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.sum("value").alias("click_score"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("purchase_score"))
    )
    j = a.join(b, "user_id", "full_outer")
    cs, ps = F.coalesce("click_score", F.lit(0.0)), F.coalesce("purchase_score", F.lit(0.0))
    return j.select(
        "user_id",
        F.round(cs, 4).alias("click_score"),
        F.round(ps, 4).alias("purchase_score"),
        F.round(0.7 * cs + 0.3 * ps, 4).alias("combined"),
    )


@register(
    "rel_window_topk",
    doc="W2 top-k per group via row_number (reference sort+slice loop, "
    "recommendation-trainer.py:169-170).",
    tags=("W2",),
    bench=True,
    oracle="""
SELECT user_id, event_id, value, rnk FROM (
  SELECT user_id, event_id, value,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY value DESC, event_id ASC) AS INTEGER) AS rnk
  FROM events)
WHERE rnk <= 3
""",
)
def rel_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return top_k_per_group(
        ev, ["user_id"], [F.col("value").desc(), F.col("event_id").asc()], 3, keep_rank=True, rank_col="rnk"
    )


@register(
    "rel_window_minmax_norm",
    doc="W3/A7 per-group min/max normalization. norm_ref reproduces the "
    "reference's formula exactly (score/range, no min subtraction — "
    "recommendation-trainer.py:138-141); norm_true is the corrected form.",
    tags=("W3", "A7", "F9"),
    oracle="""
SELECT event_id, user_id,
       round(CASE WHEN mx - mn <> 0 THEN value / (mx - mn) ELSE 0 END, 6)        AS norm_ref,
       round(CASE WHEN mx - mn <> 0 THEN (value - mn) / (mx - mn) ELSE 0 END, 6) AS norm_true
FROM (SELECT event_id, user_id, value,
             max(value) OVER (PARTITION BY user_id) AS mx,
             min(value) OVER (PARTITION BY user_id) AS mn
      FROM events)
""",
)
def rel_window_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    df = ev.withColumn("mx", F.max("value").over(w)).withColumn("mn", F.min("value").over(w))
    rng = F.col("mx") - F.col("mn")
    return df.select(
        "event_id",
        "user_id",
        F.round(safe_div(F.col("value"), rng), 6).alias("norm_ref"),
        F.round(safe_div(F.col("value") - F.col("mn"), rng), 6).alias("norm_true"),
    )


@register(
    "rel_upsert_profiles",
    doc="S9 upsert-by-key as recompute+anti-join merge (update_one upsert=True; "
    "recommendation-trainer.py:259-263): post-cutoff profiles win, stale "
    "pre-cutoff profiles survive.",
    tags=("S9",),
    oracle="""
WITH m AS (SELECT max(date_trunc('microseconds', ts)) AS mx FROM events),
old AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS tot_value, 'old' AS src
        FROM events, m WHERE date_trunc('microseconds', ts) < mx - INTERVAL 30 DAY GROUP BY user_id),
new AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS tot_value, 'new' AS src
        FROM events, m WHERE date_trunc('microseconds', ts) >= mx - INTERVAL 30 DAY GROUP BY user_id)
SELECT * FROM new
UNION ALL
SELECT o.* FROM old o WHERE NOT EXISTS (SELECT 1 FROM new n WHERE n.user_id = o.user_id)
""",
)
def rel_upsert_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    withmx = ev.crossJoin(F.broadcast(_max_ts(ev)))
    cutoff = F.col("mx") - F.expr("INTERVAL 30 DAYS")

    def profile(df: DataFrame, src: str) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("tot_value"),
            F.lit(src).alias("src"),
        )

    old = profile(withmx.filter(F.col("ts") < cutoff), "old")
    new = profile(withmx.filter(F.col("ts") >= cutoff), "new")
    return upsert_by_key(old, new, ["user_id"])


@register(
    "rel_bulk_label_update",
    doc="S11 bulk field update as join-update + coalesce (update_many $in; "
    "batch-cluster-service.py:170-173). Updates side: top-5 users by count.",
    tags=("S11", "P10"),
    oracle="""
WITH counts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id),
top5 AS (SELECT user_id FROM counts ORDER BY n DESC, user_id ASC LIMIT 5)
SELECT c.user_id, c.n,
       CASE WHEN t.user_id IS NOT NULL THEN 'vip' ELSE 'std' END AS segment
FROM counts c LEFT JOIN top5 t ON c.user_id = t.user_id
""",
)
def rel_bulk_label_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    target = counts.withColumn("segment", F.lit("std"))
    top5 = (
        counts.orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(5)
        .select("user_id")
        .withColumn("segment", F.lit("vip"))
    )
    return bulk_update(target, top5, ["user_id"], ["segment"])


@register(
    "rel_scalar_bundle",
    doc="Scalar function coverage: F1 concat, F3 substring, F4 date format, "
    "F6 epoch, F7 Δhours, F8 exp decay, F9 abs/safe-div (SURVEY §2.8).",
    tags=("F1", "F3", "F4", "F6", "F7", "F8", "F9"),
    oracle="""
SELECT event_id,
       event_type || '-' || CAST(user_id AS VARCHAR)            AS tag,
       strftime(ts, '%Y-%m-%d')                                  AS day,
       epoch_us(date_trunc('microseconds', ts)) // 1000000       AS epoch_s,
       round((epoch_us(mx) - epoch_us(date_trunc('microseconds', ts))) / 3600.0e6, 6) AS age_h,
       round(exp(-0.001 * (epoch_us(mx) - epoch_us(date_trunc('microseconds', ts))) / 3600.0e6), 6) AS freshness,
       round(abs(value - 20), 6)                                 AS dev20,
       round(CASE WHEN value <> 0 THEN 20 / value ELSE 0 END, 6) AS inv20
FROM events, (SELECT max(date_trunc('microseconds', ts)) AS mx FROM events)
""",
)
def rel_scalar_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    df = ev.crossJoin(F.broadcast(_max_ts(ev)))
    age_h = (epoch_us("mx") - epoch_us("ts")) / 3600.0e6
    return df.select(
        "event_id",
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias("tag"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias("epoch_s"),
        F.round(age_h, 6).alias("age_h"),
        F.round(F.exp(F.lit(-0.001) * age_h), 6).alias("freshness"),
        F.round(F.abs(F.col("value") - 20), 6).alias("dev20"),
        F.round(safe_div(F.lit(20.0), F.col("value")), 6).alias("inv20"),
    )


@register(
    "rel_json_extract",
    doc="F14 JSON field extraction (props is a JSON string, like the "
    "reference's Kafka payloads — ingestion_service.py:90).",
    tags=("F14",),
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
FROM events GROUP BY 1
""",
)
def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )


@register(
    "rel_interaction_scores",
    doc="A11 weighted event scoring via map-literal lookup with 0.0 default "
    "(recommendation-trainer.py:34-43). 'error' exercises the unknown-type "
    "→ 0 path.",
    tags=("A11", "F18"),
    oracle=f"""
SELECT user_id,
       round(sum({EVENT_WEIGHTS_SQL}), 4)         AS interaction_score,
       round(sum(({EVENT_WEIGHTS_SQL}) * value), 4) AS weighted_value,
       CAST(count(*) AS BIGINT)                   AS n_events
FROM events GROUP BY user_id
""",
)
def rel_interaction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = event_score("event_type", EVENT_WEIGHTS)
    return ev.groupBy("user_id").agg(
        F.round(F.sum(w), 4).alias("interaction_score"),
        F.round(F.sum(w * F.col("value")), 4).alias("weighted_value"),
        F.count("*").alias("n_events"),
    )


@register(
    "rel_popularity_topn",
    doc="A1 popularity: group-count + top-N with deterministic tiebreak "
    "(recommendation-trainer.py:122-130; item = props.k).",
    tags=("A1", "O1"),
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1 ORDER BY cnt DESC, item ASC LIMIT 10
""",
)
def rel_popularity_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("item", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("item").asc())
        .limit(10)
    )


@register(
    "rel_drift_score",
    doc="A4 drift: |mean(recent 7d) − mean(all)| / mean(all) "
    "(recommendation-trainer.py:45-56). One row.",
    tags=("A4", "F9"),
    oracle="""
WITH m AS (SELECT max(date_trunc('microseconds', ts)) AS mx FROM events),
agg AS (SELECT avg(value) AS overall_mean,
               avg(CASE WHEN date_trunc('microseconds', ts) >= mx - INTERVAL 7 DAY THEN value END) AS recent_mean
        FROM events, m)
SELECT round(recent_mean, 6)  AS recent_mean,
       round(overall_mean, 6) AS overall_mean,
       round(CASE WHEN overall_mean <> 0
                  THEN abs(recent_mean - overall_mean) / overall_mean
                  ELSE 0 END, 6) AS drift_score
FROM agg
""",
)
def rel_drift_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drift_from_events(load(spark, sf_dir, "events"))


def drift_from_events(ev: DataFrame) -> DataFrame:
    """Drift over any events-shaped frame (ts, value) — shared by the
    registered query and the serving layer's /drift_score route
    (api_gateway_service.py:272-283, 337-343)."""
    df = ev.crossJoin(F.broadcast(_max_ts(ev)))
    recent = F.when(
        F.col("ts") >= F.col("mx") - F.expr("INTERVAL 7 DAYS"), F.col("value")
    )
    agg = df.agg(
        F.avg("value").alias("overall_mean"), F.avg(recent).alias("recent_mean")
    )
    return agg.select(
        F.round("recent_mean", 6).alias("recent_mean"),
        F.round("overall_mean", 6).alias("overall_mean"),
        F.round(
            safe_div(
                F.abs(F.col("recent_mean") - F.col("overall_mean")),
                F.col("overall_mean"),
            ),
            6,
        ).alias("drift_score"),
    )


@register(
    "rel_diversity_ratio",
    doc="A5 distinct-ratio diversity score (bias_detection_service.py:122-130).",
    tags=("A5",),
    oracle="""
SELECT user_id,
       round(CAST(count(DISTINCT event_type) AS DOUBLE) / count(*), 6) AS diversity,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id
""",
)
def rel_diversity_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(
            F.countDistinct("event_type").cast("double") / F.count("*"), 6
        ).alias("diversity"),
        F.count("*").alias("n"),
    )


@register(
    "rel_dedup_events",
    doc="S18/A8 key dedup, deterministic survivor = min event_id per "
    "(user_id, event_type) (Redis SET-NX dedup, ingestion_service.py:74-77).",
    tags=("S18", "A8"),
    oracle="""
SELECT e.event_id, e.user_id, e.event_type, e.value
FROM events e
JOIN (SELECT user_id, event_type, min(event_id) AS event_id
      FROM events GROUP BY user_id, event_type) k
  ON e.user_id = k.user_id AND e.event_type = k.event_type AND e.event_id = k.event_id
""",
)
def rel_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.dedup import exact_dedup

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    return exact_dedup(ev, ["user_id", "event_type"], "event_id")


@register(
    "rel_membership_explode_join",
    doc="J1 membership join via array build + explode (stories⋈articles, "
    "summarization-service.py:54) + F2 order-insensitive text concat "
    "(md5 of sorted names).",
    tags=("J1", "F2", "A3"),
    bench=True,
    oracle="""
SELECT l_orderkey AS order_key,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(sum(p_retailprice), 4) AS total_retail,
       md5(array_to_string(list_sort(list(p_name)), ' ')) AS names_sig
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY l_orderkey
""",
)
def rel_membership_explode_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    # build the array<member> shape the reference stores (stories.articles),
    # then explode back — exercising E4-style array containers + J1 join.
    order_parts = li.groupBy("l_orderkey").agg(F.collect_list("l_partkey").alias("parts"))
    exploded = order_parts.select(
        F.col("l_orderkey").alias("order_key"), F.explode("parts").alias("l_partkey")
    )
    j = exploded.join(F.broadcast(part), exploded.l_partkey == part.p_partkey)
    return j.groupBy("order_key").agg(
        F.count("*").alias("n_parts"),
        F.round(F.sum("p_retailprice"), 4).alias("total_retail"),
        F.md5(F.concat_ws(" ", F.array_sort(F.collect_list("p_name")))).alias("names_sig"),
    )


@register(
    "rel_latest_n",
    doc="O3 latest-N fallback scan (api_gateway_service.py:299).",
    tags=("O3",),
    oracle="""
SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts FROM events
ORDER BY ts DESC, event_id ASC LIMIT 10
""",
)
def rel_latest_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", "user_id", "ts").orderBy(
        F.col("ts").desc(), F.col("event_id").asc()
    ).limit(10)


@register(
    "rel_forecast_revenue_change",
    doc="TPC-H Q6 shape: tight range+band predicate, single sum — the "
    "fully-pushed-down scan benchmark.",
    tags=("P4", "A1"),
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24
""",
)
def rel_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "rel_priority_exists",
    doc="TPC-H Q4 shape: EXISTS-correlated count per priority bucket "
    "(semi join under the hood).",
    tags=("P5", "J1"),
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def rel_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    windowed = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    late = li.join(
        windowed,
        (li.l_orderkey == windowed.o_orderkey) & (li.l_shipdate > windowed.o_orderdate),
    ).select("l_orderkey").distinct()
    return (
        windowed.join(late, windowed.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "rel_shipmode_buckets",
    doc="TPC-H Q12 shape: conditional-sum buckets via CASE aggregation "
    "over a joined range scan.",
    tags=("A11", "F18"),
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
""",
)
def rel_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "rel_promo_revenue_ratio",
    doc="TPC-H Q14 shape: conditional revenue ratio with a dimension "
    "join (promo = part types starting 'a').",
    tags=("A4", "F9"),
    oracle="""
SELECT round(
  100.0 * sum(CASE WHEN p_type LIKE 'a%' THEN l_extendedprice * (1 - l_discount)
              ELSE 0.0 END)::DOUBLE
  / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-03-01' AND l_shipdate < TIMESTAMP '1995-04-01'
""",
)
def rel_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("a%"), rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"))
    )


@register(
    "rel_shipping_priority",
    doc="TPC-H Q3 shape: segment-filtered 3-way join, revenue per order, "
    "top-10. The two fact tables shuffle on l_orderkey/o_orderkey; the "
    "filtered customer side broadcasts. o_orderpriority stands in for "
    "the classic o_shippriority (absent from the fixture).",
    tags=("J2", "A1", "O1"),
    oracle="""
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1996-03-15' AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "rel_returned_items",
    doc="TPC-H Q10 shape: returned-item revenue per customer over a "
    "quarter, nation dimension broadcast, top-20.",
    tags=("J2", "A1", "O1"),
    oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def rel_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "rel_customer_distribution",
    doc="TPC-H Q13 shape: LEFT OUTER join customer->orders, per-customer "
    "order counts, then a histogram of the counts (two-level aggregation; "
    "NULL-preserving outer semantics).",
    tags=("J8", "A1"),
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def rel_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))

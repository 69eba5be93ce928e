"""Structured Streaming layer (SURVEY §2.10).

Reference behaviors re-expressed:
- T3 TTL'd stream dedup (Redis SET NX EX 86400 on article link,
  ingestion_service.py:74-77) → watermark + dropDuplicatesWithinWatermark.
- T4/T5 stateful online clustering + upsert sink (duplication_service.py:
  142-170): each incoming article embedding is assigned to the nearest
  story centroid (cosine > τ) else mints a new story; stories state is
  updated per micro-batch. Chosen form: ``foreachBatch`` re-join against
  the stories state (SURVEY §7.5.3) — simpler and restart-safe vs
  applyInPandasWithState, and it preserves intra-batch "new story then
  match next article" sequencing by iterating the (small) unmatched
  remainder within the batch.

The batch body (``assign_batch_to_stories``) is a pure function so
stream/batch parity is testable without Kafka: tests feed parquet slices
through the same body the streaming query uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.operators.similarity import nearest_centroid_assign


def watermark_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    event_time_col: str = "ts",
    ttl: str = "24 hours",
) -> DataFrame:
    """T3: drop duplicate keys arriving within the TTL window. On a batch
    DataFrame falls back to plain dropDuplicates (same key semantics the
    Redis NX path guarantees)."""
    if stream_df.isStreaming:
        return stream_df.withWatermark(event_time_col, ttl).dropDuplicatesWithinWatermark(
            key_cols
        )
    return stream_df.dropDuplicates(key_cols)


@dataclass
class StoryState:
    """Stories state carried across micro-batches: (story_id, centroid,
    n_members). In production this is a parquet/Delta table re-read per
    batch; for tests it lives on the driver as a small DataFrame."""

    stories: DataFrame | None = None
    next_id: int = 0
    threshold: float = 0.8
    history: list = field(default_factory=list)


def assign_batch_to_stories(batch: DataFrame, state: StoryState) -> DataFrame:
    """One micro-batch of (article_id, embedding) rows → (article_id,
    story_id, similarity, is_new) assignments; updates ``state``.

    Matching articles join their story; non-matching articles mint new
    single-member stories (reference duplication_service.py:86-92). New
    stories minted earlier in the batch ARE candidates for later
    articles — preserved by a second assignment pass of the unmatched
    remainder against the fresh minted centroids (bounded: 2 passes,
    matching the reference's per-message sequencing to within a batch).

    Centroid update: running mean via (centroid*n + x)/(n+1) — the
    reference recomputes story centroids as plain means in batch
    refinement (batch-cluster-service.py:128-130); we fold incrementally.
    """
    spark = batch.sparkSession
    pts = batch.select(F.col("article_id").alias("point_id"), F.col("embedding").alias("point_vec"))

    def mint(unmatched: DataFrame) -> DataFrame:
        rows = unmatched.select("point_id", "point_vec").collect()
        minted = []
        for r in rows:
            minted.append((f"story_{state.next_id}", [float(x) for x in r["point_vec"]], 1, r["point_id"]))
            state.next_id += 1
        return spark.createDataFrame(
            minted, "story_id string, centroid array<double>, n_members int, seed_article string"
        )

    if state.stories is None or state.stories.isEmpty():
        minted = mint(pts)
        state.stories = minted.select("story_id", "centroid", "n_members")
        return minted.select(
            F.col("seed_article").alias("article_id"),
            "story_id",
            F.lit(1.0).alias("similarity"),
            F.lit(True).alias("is_new"),
        )

    cents = state.stories.select(
        F.col("story_id").alias("centroid_id"), F.col("centroid").alias("centroid_vec")
    )
    assigned = nearest_centroid_assign(pts, cents, threshold=state.threshold).cache()
    matched = assigned.filter("matched")
    unmatched_pts = pts.join(matched.select("point_id"), "point_id", "left_anti")

    # pass 2: unmatched articles vs stories minted from OTHER unmatched
    # articles this batch (reference would match them message-by-message)
    minted = mint(unmatched_pts)
    out_new = minted.select(
        F.col("seed_article").alias("article_id"),
        "story_id",
        F.lit(1.0).alias("similarity"),
        F.lit(True).alias("is_new"),
    )
    out_matched = matched.select(
        F.col("point_id").alias("article_id"),
        F.col("centroid_id").alias("story_id"),
        "similarity",
        F.lit(False).alias("is_new"),
    )

    # fold matched members into centroids: new_c = (c*n + sum(x)) / (n + k)
    upd = (
        matched.join(pts, "point_id")
        .select(F.col("centroid_id").alias("story_id"), F.posexplode("point_vec").alias("pos", "v"))
        .groupBy("story_id", "pos")
        .agg(F.sum("v").alias("add_v"), F.count("*").alias("k"))
    )
    old_flat = state.stories.select(
        "story_id", "n_members", F.posexplode("centroid").alias("pos", "c")
    )
    new_flat = old_flat.join(upd, ["story_id", "pos"], "left").select(
        "story_id",
        "pos",
        F.when(
            F.col("add_v").isNotNull(),
            (F.col("c") * F.col("n_members") + F.col("add_v"))
            / (F.col("n_members") + F.col("k")),
        )
        .otherwise(F.col("c"))
        .alias("c"),
        F.coalesce(F.col("k"), F.lit(0)).alias("k"),
    )
    updated = new_flat.groupBy("story_id").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]).alias("centroid"),
        F.max("k").alias("added"),
    )
    refreshed = (
        state.stories.select("story_id", "n_members")
        .join(updated, "story_id")
        .select("story_id", "centroid", (F.col("n_members") + F.col("added")).alias("n_members"))
    )
    state.stories = refreshed.unionByName(
        minted.select("story_id", "centroid", "n_members")
    ).cache()
    state.stories.count()  # pin state before the batch frame goes away
    return out_matched.unionByName(out_new)


def run_microbatched(batches: list[DataFrame], threshold: float = 0.8) -> tuple[DataFrame, StoryState]:
    """Drive the foreachBatch body over pre-split batches (the test path;
    a real deployment passes the same body to
    ``writeStream.foreachBatch``)."""
    state = StoryState(threshold=threshold)
    outs = []
    for b in batches:
        outs.append(assign_batch_to_stories(b, state))
    all_out = outs[0]
    for o in outs[1:]:
        all_out = all_out.unionByName(o)
    return all_out, state


def streaming_event_counts(
    spark, sf_dir: str, window: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """T6: watermarked tumbling-window counts over a parquet-fed stream —
    the incremental form of the drift/popularity aggregates. Returns a
    STREAMING DataFrame; callers start it with a memory/noop sink."""
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir.rstrip("/") + "/")  # would be a dir of event files
    )
    # events.ts is raw nanos under nanosAsLong; convert like tables.load
    stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )

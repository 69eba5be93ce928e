"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023; public method), the model-free data-selection rung
between heuristic quality gates and the trained classifier.

Given a small TARGET corpus (the domain you want more of) and a large
RAW pool, DSIR fits two bag-of-hashed-n-grams distributions — p
(target) and q (raw) — and scores every pool document with the log
importance weight

    log w(x) = sum over x's n-gram occurrences of [log p(b) - log q(b)]

where b is the n-gram's hash bucket. Resampling then draws documents
with Gumbel-top-k on log w, yielding a pool subset distributed like the
target. The paper selects The-Pile-scale corpora with exactly this
estimator (hashed unigrams+bigrams, 10k buckets); the reference repo
has no data-selection stage at all — its pipeline ingests whatever the
feeds return (ingestion_service.py) — so this is a beyond-reference
capability of the corpus-curation family (CCNet perplexity scores
fluency; DSIR scores DOMAIN MATCH).

Spark-first shape (zero UDFs, every stage mirrored in the DuckDB
oracle):

- features: one tokenize pass -> codegen'd unigram+bigram projection ->
  md5-derived hash bucket (portable across engines, no JVM hash).
- the fitted "model" is ONE (bucket, log_ratio) table bounded by the
  bucket count — broadcast-sized by construction, mergeable (bucket
  counts add across shards before the log), persistable as parquet.
- scoring: per-(doc, bucket) occurrence counts (map-side combined),
  contribution = count * log_ratio, then a per-doc fold over the
  bucket-SORTED contribution list — FP addition is order-dependent, so
  both engines fold in bucket order and get bit-identical sums.
- resampling: Gumbel noise g = -ln(-ln(u)) with u minted from the
  md5 of doc_id (the A-ES device from doc_weighted_sample — portable,
  reproducible, no rand()); global top-k routes to
  TakeOrderedAndProject, no full sort.

At 100 TB: the pool side pays one tokenize + one (doc, bucket) keyed
shuffle — the same profile as the CCNet scorer — and the model side is
``buckets`` rows however big the corpora are. Add-k smoothing keeps
unseen buckets finite, as in operators/ngram_lm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.functions.text import tokens

# Interior bigrams joined with a space; docs with < 2 tokens contribute
# unigrams only (sequence() counts DOWN when start > stop — the guard is
# correctness, not optimization; same device as operators/ngram_lm.py).
_BIGRAM_STRINGS = (
    "transform(sequence(2, size(_t)), "
    "i -> concat(element_at(_t, i - 1), ' ', element_at(_t, i)))"
)


def _bucket(col: F.Column, buckets: int) -> F.Column:
    """Portable hash bucket: first 8 md5 hex chars as an int, mod B —
    bit-identical in DuckDB via CAST('0x' || substr(md5(x),1,8) ...)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets
    ).cast("int")


def hashed_ngram_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """(id, bucket) — one row per unigram AND interior-bigram occurrence,
    hashed into ``buckets``. One tokenize pass feeds both orders."""
    toked = docs.select(F.col(id_col), tokens(text_col).alias("_t"))
    grams = toked.select(
        id_col,
        F.explode(
            F.concat(
                F.col("_t"),
                F.when(F.size("_t") >= 2, F.expr(_BIGRAM_STRINGS)).otherwise(
                    F.array().cast("array<string>")
                ),
            )
        ).alias("_g"),
    )
    return grams.select(id_col, _bucket(F.col("_g"), buckets).alias("bucket"))


def fit_log_ratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    buckets: int = 1024,
    add_k: float = 0.5,
) -> DataFrame:
    """The fitted DSIR model: (bucket, log_ratio) with
    log_ratio = ln((c_t + k)/(N_t + k*B)) - ln((c_r + k)/(N_r + k*B)).
    At most ``buckets`` rows — broadcast it. Counts merge across shards
    (sum before the log), so the model trains distributed like every
    other count model here."""
    tc = target_feats.groupBy("bucket").agg(F.count("*").alias("c_t"))
    rc = raw_feats.groupBy("bucket").agg(F.count("*").alias("c_r"))
    return _log_ratio_from_counts(tc, rc, buckets, add_k)


def _log_ratio_from_counts(
    tc: DataFrame, rc: DataFrame, buckets: int, add_k: float
) -> DataFrame:
    """(bucket, log_ratio) from the two per-bucket count tables.

    N_t / N_r are derived by summing the count tables (exact: every
    occurrence lands in exactly one bucket), NOT by re-counting the
    feature streams — re-counting re-tokenized the whole corpus twice
    more (guide §1.2: remove unnecessary passes). The sums run over at
    most ``buckets`` rows each."""
    nt = tc.agg(
        F.coalesce(F.sum("c_t"), F.lit(0)).cast("double").alias("n_t")
    )
    nr = rc.agg(
        F.coalesce(F.sum("c_r"), F.lit(0)).cast("double").alias("n_r")
    )
    k = F.lit(float(add_k))
    b = F.lit(float(buckets))
    joined = (
        tc.join(rc, "bucket", "full_outer")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
    )
    lr = F.log(
        (F.coalesce("c_t", F.lit(0)) + k) / (F.col("n_t") + k * b)
    ) - F.log((F.coalesce("c_r", F.lit(0)) + k) / (F.col("n_r") + k * b))
    return joined.select("bucket", lr.alias("log_ratio"))


def dsir_pipeline(
    target_feats: DataFrame,
    pool_feats: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 1024,
    add_k: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """Fit + score in one composition that tokenizes each corpus ONCE
    (guide §1.2/§2.3). The pool's (doc, bucket) occurrence counts are
    the shared intermediate: the model's per-bucket pool counts are the
    column-sum of that table (exact integer rollup), so the raw pool
    features are aggregated a single time and the two consumers (model
    fit, per-doc scoring) hang off the same map-side-combined exchange
    — AQE reuses the shuffle stage instead of re-tokenizing. Same
    result as fit_log_ratio + dsir_log_weights (the arithmetic sees
    identical integer inputs); pinned by the shared DuckDB oracle."""
    per = pool_feats.groupBy(id_col, "bucket").agg(F.count("*").alias("_c"))
    tc = target_feats.groupBy("bucket").agg(F.count("*").alias("c_t"))
    rc = per.groupBy("bucket").agg(F.sum("_c").alias("c_r"))
    ratio = _log_ratio_from_counts(tc, rc, buckets, add_k)
    return _weights_from_counts(per, ratio, id_col, round_dp)


def dsir_log_weights(
    pool_feats: DataFrame,
    log_ratio: DataFrame,
    id_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    """(id, n_feats, logw): per-doc log importance weight. The per-doc
    sum folds contributions in BUCKET ORDER (array_sort + aggregate) so
    the float result is deterministic and engine-portable; + 0.0
    canonicalizes a -0.0 fold result."""
    per = pool_feats.groupBy(id_col, "bucket").agg(F.count("*").alias("_c"))
    return _weights_from_counts(per, log_ratio, id_col, round_dp)


def _weights_from_counts(
    per: DataFrame,
    log_ratio: DataFrame,
    id_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    contrib = per.join(F.broadcast(log_ratio), "bucket").select(
        id_col,
        "bucket",
        (F.col("_c") * F.col("log_ratio")).alias("_w"),
        "_c",
    )
    return contrib.groupBy(id_col).agg(
        F.sum("_c").alias("n_feats"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("bucket", "_w"))),
                F.lit(0.0),
                lambda acc, s: acc + s["_w"],
            )
            + F.lit(0.0),
            round_dp,
        ).alias("logw"),
    )


def gumbel_top_k(
    weights: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    round_dp: int = 6,
) -> DataFrame:
    """Gumbel-top-k resampling (the paper's sampling-without-replacement
    step): key = logw + g, g = -ln(-ln(u)), u minted from md5(doc_id)
    as in doc_weighted_sample's A-ES draw but midpoint-shifted so u
    stays strictly inside (0, 1). Global top-k is a partial-aggregate
    TakeOrderedAndProject — no full sort."""
    from newsify_spark.operators.topk import top_k_per_group

    hk = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    # +0.5 keeps u strictly inside (0, 1): hk spans [0, 2^32-1], and
    # (hk+1)/2^32 would reach exactly 1.0 for the 1-in-2^32 doc whose
    # first 8 md5 hex chars are ffffffff, minting -ln(-ln(1)) = +inf —
    # an infinite sampling key that force-selects the doc regardless of
    # weight (real at billions-of-docs scale)
    u = (hk + F.lit(0.5)) / F.lit(4294967296.0)
    keyed = weights.select(
        id_col,
        logw_col,
        F.round(F.col(logw_col) + (-F.log(-F.log(u))), round_dp).alias("samp_key"),
    )
    return top_k_per_group(
        keyed,
        [],
        [F.col("samp_key").desc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
        keep_rank=True,
    ).orderBy("rank")

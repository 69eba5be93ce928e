"""Corpus-preparation operators, round 3: chunking, vocabulary stats,
TF-IDF, per-source curation rollups, length-outlier trimming.

These complete the training-data pipeline surface started in llmops.py
(dedup / PII / contamination / packing / mix weights): the ops a corpus
team runs between "raw crawl" and "tokenizer-ready shards".

Scale notes (100 TB):
- chunking is a pure per-row explode (sequence + transform, all JVM) —
  no shuffle at all; output partitioning inherits the scan.
- vocabulary/TF-IDF shuffle on the term key, which is Zipf-skewed; the
  aggregates are all partial-aggregating (map-side combine collapses
  each partition's term counts before the exchange), which is the
  standard mitigation — the hot 'the' key arrives pre-counted per
  partition, count-sized not occurrence-sized.
- the TF-IDF document-frequency side is vocab-sized (millions of rows,
  not billions) and broadcastable; corpus-level scalars (N, length
  bands) are 1-row broadcast joins, never windows over the corpus.

Reference scope: beyond the reference app (its text surface stops at
model UDFs, summarization-service.py); built per the round brief's
training-data-pipeline mandate. All demoted (zz_) below the driver's
50-name window; oracle-verified locally by tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsify_spark.queries.registry import register
from newsify_spark.queries.sqlkit import stopword_ratio_sql, tokens_sql
from newsify_spark.tables import load

CHUNK_LEN = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


@register(
    "doc_chunk_overlap",
    doc=f"Sliding-window chunking: {CHUNK_LEN}-char windows every "
    f"{CHUNK_STRIDE} chars ({CHUNK_LEN - CHUNK_STRIDE}-char overlap) — the "
    "standard pre-embedding/pre-packing split. sequence+transform+explode, "
    "zero shuffle; chunk ids are derivable (doc_id, start) pairs so "
    "downstream joins never need a global counter.",
    tags=("text", "corpus"),
    oracle=f"""
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS INTEGER)    AS chunk_idx,
       CAST(start AS INTEGER)                      AS chunk_start,
       substr(text, CAST(start AS INTEGER) + 1, {CHUNK_LEN}) AS chunk_text
FROM documents, unnest(generate_series(0, len(text) - 1, {CHUNK_STRIDE})) AS u(start)
WHERE len(text) > 0
""",
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    starts = F.sequence(
        F.lit(0), F.length("text") - 1, F.lit(CHUNK_STRIDE)
    )
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.col("start").cast("int").alias("chunk_start"),
            F.substring(F.col("text"), F.col("start").cast("int") + 1, CHUNK_LEN).alias(
                "chunk_text"
            ),
        )
    )


@register(
    "doc_top_terms",
    doc="Corpus vocabulary head: top-100 terms by total frequency with "
    "document frequency alongside. One term-keyed shuffle with map-side "
    "combine; df via count(DISTINCT doc_id) — single-column distinct, "
    "planned as two-phase hash agg (no Expand).",
    tags=("text", "corpus", "A1"),
    oracle="""
SELECT term, CAST(count(*) AS BIGINT) AS tf,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM (
  SELECT doc_id, u.term
  FROM documents, unnest(string_split(text, ' ')) AS u(term)
  WHERE u.term <> ''
)
GROUP BY term
ORDER BY tf DESC, term
LIMIT 100
""",
)
def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("tf").desc(), "term")
        .limit(100)
    )


HH_PHI = 0.01


@register(
    "doc_heavy_terms",
    doc="φ-heavy-hitter terms (share >= 1% of all tokens) via the "
    "mergeable Misra-Gries sketch (operators.frequent.heavy_hitters): "
    "per-partition capacity-k summaries map-side, candidate union "
    "broadcast back for an EXACT recount — never a full-vocabulary "
    "shuffle. Oracle-checkable despite the sketch route because the "
    "candidate phase provably has no false negatives (pigeonhole + MG "
    "retention bound; see operators/frequent.py).",
    tags=("text", "corpus", "A1", "sketch"),
    oracle=f"""
WITH toks AS (
  SELECT u.term FROM documents, unnest(string_split(text, ' ')) AS u(term)
  WHERE u.term <> ''
)
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM toks
GROUP BY term
HAVING count(*) >= {HH_PHI} * (SELECT CAST(count(*) AS DOUBLE) FROM toks)
ORDER BY term
""",
)
def doc_heavy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.frequent import heavy_hitters

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    return heavy_hitters(toks, "term", phi=HH_PHI).orderBy("term")


@register(
    "doc_tfidf_topk",
    doc="Per-document top-5 terms by TF-IDF (idf = ln(N/df)). Term "
    "frequencies shuffle on (doc, term) with map-side combine; the df "
    "table is vocab-sized and broadcast; N is a 1-row broadcast. Final "
    "top-5 is a per-doc window over the per-doc term list (already "
    "co-located by the groupBy). Ties broken by term asc on the ROUNDED "
    "score so both engines agree at float boundaries.",
    tags=("text", "corpus", "W2"),
    oracle="""
WITH terms AS (
  SELECT doc_id, u.term
  FROM documents, unnest(string_split(text, ' ')) AS u(term)
  WHERE u.term <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM terms),
scored AS (
  SELECT doc_id, term,
         round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
WHERE rn <= 5
""",
)
def doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = terms.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "doc_source_quality",
    doc="Per-source curation rollup: doc count, mean quality score, mean "
    "length, short-doc share, language spread — the table a corpus team "
    "reads to set per-source mix weights. One source-keyed shuffle, all "
    "partial-aggregating.",
    tags=("text", "corpus", "A1"),
    oracle=f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(round((least(len(text) / 500.0, 1.0)
            + least({stopword_ratio_sql()} / 0.1, 1.0)
            + (CASE WHEN (CASE WHEN len({tokens_sql()}) > 0 THEN
                   CAST(list_reduce(list_transform({tokens_sql()}, tk -> len(tk)),
                                    (a, b) -> a + b) AS DOUBLE) / len({tokens_sql()})
                   ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
            ) / 3.0, 6)), 4) AS avg_quality,
       round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
       round(avg(CASE WHEN n_chars < 100 THEN 1.0 ELSE 0.0 END), 6) AS short_share,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
""",
)
def doc_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.functions import text as TX

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            # round per-doc BEFORE avg (registry parity rule): unrounded
            # doubles averaged then rounded leak summation order in the
            # last decimal; quantized inputs + 4 dp output do not.
            F.round(TX.quality_score("text"), 6).alias("__q"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("__q"), 4).alias("avg_quality"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
            F.round(
                F.avg(F.when(F.col("n_chars") < 100, 1.0).otherwise(0.0)), 6
            ).alias("short_share"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


@register(
    "doc_length_outliers",
    doc="Length-band trim: documents outside mean ± 1.5·stddev of character "
    "length (the Gopher-style outlier gate; 1.5σ — the fixture's "
    "uniform-ish lengths never leave a 2σ band, which would make the "
    "query vacuously empty at every SF). The band is a 1-row "
    "aggregate broadcast against the scan — no window over the corpus, "
    "no second shuffle.",
    tags=("text", "corpus", "P10"),
    oracle="""
SELECT doc_id, n_chars,
       round(lo, 4) AS lo, round(hi, 4) AS hi
FROM documents CROSS JOIN (
  SELECT avg(CAST(n_chars AS DOUBLE)) - 1.5 * stddev(CAST(n_chars AS DOUBLE)) AS lo,
         avg(CAST(n_chars AS DOUBLE)) + 1.5 * stddev(CAST(n_chars AS DOUBLE)) AS hi
  FROM documents
)
WHERE n_chars < lo OR n_chars > hi
ORDER BY doc_id
""",
)
def doc_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("double")
    band = docs.agg(
        (F.avg(nc) - 1.5 * F.stddev(nc)).alias("lo_raw"),
        (F.avg(nc) + 1.5 * F.stddev(nc)).alias("hi_raw"),
    )
    return (
        docs.join(F.broadcast(band))
        .filter((F.col("n_chars") < F.col("lo_raw")) | (F.col("n_chars") > F.col("hi_raw")))
        .select(
            "doc_id",
            "n_chars",
            F.round("lo_raw", 4).alias("lo"),
            F.round("hi_raw", 4).alias("hi"),
        )
        .orderBy("doc_id")
    )


DOMAIN_CAP = 60


@register(
    "doc_domain_cap",
    doc="Per-source document cap: keep at most N docs per source, chosen "
    "deterministically by content-independent hash order (the standard "
    "anti-overrepresentation gate before corpus mixing — a crawl where "
    "one domain is 40% of documents must not be 40% of training data). "
    "Deterministic: md5(doc_id) ordering, not sampling, so reruns and "
    "the oracle agree exactly.",
    tags=("text", "corpus", "W2", "sampling"),
    oracle=f"""
SELECT source, doc_id
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('cap' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= {DOMAIN_CAP}
ORDER BY source, doc_id
""",
)
def doc_domain_cap(spark: SparkSession, sf_dir: str, cap: int = DOMAIN_CAP) -> DataFrame:
    """Scale route: one shuffle on source. A mega-domain skewing its
    partition is bounded by rank<=cap itself once AQE splits the skewed
    partition; for pathological single-key skew, pre-filter with the
    same hash (keep md5 < cap/count_estimate quantile) before the exact
    window — both stages use the same deterministic key so the result
    is unchanged.
    """
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("cap"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= cap)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


# CTE chain shared by doc_curation_pipeline and doc_corpus_build: the
# full gate cascade ending in the deduped survivor set.
_CURATION_CTES = """
WITH stats AS (
  SELECT doc_id, source, n_chars, text,
         (CASE WHEN len(string_split(lower(text), ' ')) > 0 THEN CAST(len(list_filter(string_split(lower(text), ' '), tk -> tk IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE) / len(string_split(lower(text), ' ')) ELSE 0.0 END) AS stop_ratio,
         (least(len(text) / 500.0, 1.0)
          + least((CASE WHEN len(string_split(lower(text), ' ')) > 0 THEN CAST(len(list_filter(string_split(lower(text), ' '), tk -> tk IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE) / len(string_split(lower(text), ' ')) ELSE 0.0 END) / 0.1, 1.0)
          + (CASE WHEN (CASE WHEN len(string_split(lower(text), ' ')) > 0 THEN CAST(list_reduce(list_transform(string_split(lower(text), ' '), tk -> len(tk)), (a,b) -> a + b) AS DOUBLE) / len(string_split(lower(text), ' ')) ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
         ) / 3.0 AS quality,
         (CASE WHEN len(string_split(lower(text), ' ')) >= 2 THEN list_transform(generate_series(1, len(string_split(lower(text), ' ')) - 1), i -> array_to_string((string_split(lower(text), ' '))[i:i+1], ' ')) ELSE [array_to_string(string_split(lower(text), ' '), ' ')] END) AS bg
  FROM documents
),
band AS (
  SELECT avg(CAST(n_chars AS DOUBLE)) - 1.5*stddev(CAST(n_chars AS DOUBLE)) AS lo,
         avg(CAST(n_chars AS DOUBLE)) + 1.5*stddev(CAST(n_chars AS DOUBLE)) AS hi
  FROM documents
),
gated AS (
  SELECT s.*,
         (CAST(list_max(list_transform(list_distinct(bg), x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg)) AS top_bg
  FROM stats s CROSS JOIN band b
  WHERE s.stop_ratio >= 0.08
    AND s.quality >= 0.5
    AND s.n_chars BETWEEN b.lo AND b.hi
),
deduped AS (
  SELECT * FROM gated g
  WHERE g.top_bg <= 0.18
    AND g.doc_id = (SELECT min(doc_id) FROM gated g2 WHERE md5(g2.text) = md5(g.text)
                      AND g2.top_bg <= 0.18)
)
"""


@register(
    "doc_curation_pipeline",
    doc="END-TO-END corpus curation in ONE declarative plan — the chain a "
    "training-data team actually runs, composed from the individually "
    "oracle-checked gates: language-ID (stopword ratio >= 0.08) → "
    "quality floor (>= 0.5) → length band (mean ± 1.5σ) → repetition "
    "gate (top-bigram fraction <= 0.18) → exact-dup survivor (min "
    "doc_id per content hash). Emits the surviving corpus. All gates "
    "are codegen'd expressions over one documents scan plus a 1-row "
    "band aggregate broadcast back; dedup is the only keyed shuffle.",
    tags=("text", "corpus", "dedup", "composed"),
    oracle=_CURATION_CTES
    + """
SELECT doc_id, source, n_chars, round(quality, 6) AS quality FROM deduped ORDER BY doc_id
""",
)
def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.functions.text import (
        quality_score,
        stopword_ratio,
        top_ngram_fraction,
    )
    from newsify_spark.operators.dedup import content_hash

    docs = load(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("double")
    band = docs.agg(
        (F.avg(nc) - 1.5 * F.stddev(nc)).alias("lo"),
        (F.avg(nc) + 1.5 * F.stddev(nc)).alias("hi"),
    )
    gated = (
        docs.join(F.broadcast(band))
        .withColumn("stop_ratio", stopword_ratio("text"))
        .withColumn("quality", quality_score("text"))
        .filter(
            (F.col("stop_ratio") >= 0.08)
            & (F.col("quality") >= 0.5)
            & F.col("n_chars").between(F.col("lo"), F.col("hi"))
        )
        .filter(top_ngram_fraction("text", 2) <= 0.18)
    )
    keep = gated.groupBy(content_hash("text").alias("__h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        gated.join(keep, "doc_id", "left_semi")
        .select("doc_id", "source", "n_chars", F.round("quality", 6).alias("quality"))
        .orderBy("doc_id")
    )


@register(
    "doc_shard_manifest",
    doc="Deterministic training-shard manifest "
    "(operators.shards.shard_manifest): md5-derived portable shard hash "
    "(bit-identical Spark/DuckDB/Python, unlike Murmur3 hash()), per-shard "
    "row count, ORDER-INDEPENDENT xor checksum of row key hashes, and key "
    "range. The write path (write_training_shards) lands each shard as one "
    "partitionBy directory off a single keyed shuffle; this manifest is the "
    "trainer-side integrity contract (validate_shards re-derives it from "
    "the written files).",
    tags=("shards", "training-output"),
    oracle="""
WITH h AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS hk
  FROM documents
)
SELECT CAST(hk % 8 AS INTEGER) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       bit_xor(hk) AS xor_checksum,
       min(doc_id) AS min_key,
       max(doc_id) AS max_key
FROM h GROUP BY 1
""",
)
def doc_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.shards import shard_manifest

    docs = load(spark, sf_dir, "documents")
    return shard_manifest(docs, "doc_id", 8)


def _quality_sql() -> str:
    """Unrounded quality expression matching functions.text.quality_score
    (same form doc_quality_score rounds for output)."""
    stop = stopword_ratio_sql()
    toks = tokens_sql()
    return (
        f"(least(len(text) / 500.0, 1.0) + least({stop} / 0.1, 1.0) "
        f"+ (CASE WHEN (CASE WHEN len({toks}) > 0 THEN "
        f"CAST(list_reduce(list_transform({toks}, tk -> len(tk)), (a, b) -> a + b) AS DOUBLE) / len({toks}) "
        f"ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)) / 3.0"
    )


def _report_oracle() -> str:
    from newsify_spark.queries.sqlkit import shingles_sql

    bg = shingles_sql("text", 2)
    return f"""
WITH band AS (
  SELECT avg(CAST(n_chars AS DOUBLE)) - 1.5*stddev(CAST(n_chars AS DOUBLE)) AS lo,
         avg(CAST(n_chars AS DOUBLE)) + 1.5*stddev(CAST(n_chars AS DOUBLE)) AS hi
  FROM documents
),
stats AS (
  SELECT doc_id, text, n_chars, b.lo, b.hi,
         {stopword_ratio_sql()} AS stop_ratio,
         {_quality_sql()} AS quality,
         (CAST(list_max(list_transform(list_distinct({bg}),
                 x -> len(list_filter({bg}, y -> y = x)))) AS DOUBLE) / len({bg})) AS top_bg
  FROM documents CROSS JOIN band b
),
cls AS (
  SELECT doc_id, text,
         CASE WHEN stop_ratio < 0.08 THEN 'lang'
              WHEN quality < 0.5 THEN 'quality'
              WHEN n_chars NOT BETWEEN lo AND hi THEN 'length'
              WHEN top_bg > 0.18 THEN 'repetition' END AS gate
  FROM stats
),
keep AS (SELECT min(doc_id) AS doc_id FROM cls WHERE gate IS NULL GROUP BY md5(text)),
final AS (
  SELECT COALESCE(gate,
           CASE WHEN doc_id IN (SELECT doc_id FROM keep) THEN 'kept'
                ELSE 'exact_dup' END) AS gate
  FROM cls
)
SELECT gate, CAST(count(*) AS BIGINT) AS n_docs FROM final GROUP BY gate
"""


@register(
    "doc_curation_report",
    doc="Drop-reason attribution for doc_curation_pipeline: every document "
    "is tagged with the FIRST gate it fails in chain order (lang → quality "
    "→ length → repetition → exact_dup), survivors tagged 'kept'; output is "
    "per-gate counts. The observability half of corpus curation — a corpus "
    "team reads this before touching thresholds. Same single-scan plan as "
    "the pipeline (gates are codegen'd expressions + a 1-row band "
    "broadcast); attribution adds one CASE, no extra shuffle beyond the "
    "dedup groupBy it shares.",
    tags=("text", "corpus", "observability"),
    oracle=_report_oracle(),
)
def doc_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.functions.text import (
        quality_score,
        stopword_ratio,
        top_ngram_fraction,
    )
    from newsify_spark.operators.dedup import content_hash

    docs = load(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("double")
    band = docs.agg(
        (F.avg(nc) - 1.5 * F.stddev(nc)).alias("lo"),
        (F.avg(nc) + 1.5 * F.stddev(nc)).alias("hi"),
    )
    stats = (
        docs.join(F.broadcast(band))
        .withColumn("stop_ratio", stopword_ratio("text"))
        .withColumn("quality", quality_score("text"))
        .withColumn("top_bg", top_ngram_fraction("text", 2))
        .withColumn(
            "first_fail",
            F.when(F.col("stop_ratio") < 0.08, "lang")
            .when(F.col("quality") < 0.5, "quality")
            .when(~F.col("n_chars").between(F.col("lo"), F.col("hi")), "length")
            .when(F.col("top_bg") > 0.18, "repetition"),
        )
    )
    failed = (
        stats.filter(F.col("first_fail").isNotNull())
        .groupBy(F.col("first_fail").alias("gate"))
        .agg(F.count("*").alias("n_docs"))
    )
    passed = stats.filter(F.col("first_fail").isNull())
    keep = passed.groupBy(content_hash("text").alias("__h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    marked = passed.join(
        keep.select("doc_id").withColumn("_kept", F.lit(1)), "doc_id", "left"
    )
    tail = (
        marked.select(
            F.when(F.col("_kept").isNotNull(), "kept").otherwise("exact_dup").alias("gate")
        )
        .groupBy("gate")
        .agg(F.count("*").alias("n_docs"))
    )
    return failed.unionByName(tail)


@register(
    "doc_split_manifest",
    doc="Deterministic train/val/test split manifest "
    "(operators.shards.split_manifest): the same portable md5 hash as "
    "doc_shard_manifest buckets each doc into cumulative weight ranges "
    "(90/5/5). Hash splits are STABLE UNDER CORPUS GROWTH — a doc's "
    "split never changes as others come and go — which random splits "
    "can't offer; the per-split xor checksum is the rebuild-integrity "
    "contract.",
    tags=("shards", "training-output", "split"),
    oracle="""
WITH h AS (
  SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS hk
  FROM documents
),
s AS (
  SELECT hk,
         CASE WHEN hk % 10000 < 9000 THEN 'train'
              WHEN hk % 10000 < 9500 THEN 'val'
              ELSE 'test' END AS split
  FROM h
)
SELECT split, CAST(count(*) AS BIGINT) AS n_rows, bit_xor(hk) AS xor_checksum
FROM s GROUP BY split
""",
)
def doc_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.shards import split_manifest

    docs = load(spark, sf_dir, "documents")
    return split_manifest(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})


@register(
    "doc_quality_checks",
    doc="Declarative data-quality constraint report "
    "(operators.checks.run_checks, Deequ-style): every rule folds into "
    "ONE aggregate scan (map-side-combined CASE sums — rule count never "
    "adds passes or shuffles), unpivoted to (check, violations, total) "
    "rows a pipeline gates on. NULL predicate results count as "
    "violations (fail-closed). Violation mechanics + the expect_all "
    "fail-fast gate are unit-tested on synthetic dirty data.",
    tags=("checks", "observability"),
    oracle="""
WITH agg AS (
  SELECT count(*) AS total,
         sum(CASE WHEN doc_id IS NOT NULL THEN 0 ELSE 1 END) AS v_id,
         sum(CASE WHEN COALESCE(n_chars = len(text), FALSE) THEN 0 ELSE 1 END) AS v_n,
         sum(CASE WHEN COALESCE(regexp_matches(lang, '^[a-z]{2}$'), FALSE) THEN 0 ELSE 1 END) AS v_lang,
         sum(CASE WHEN COALESCE(len(text) > 0, FALSE) THEN 0 ELSE 1 END) AS v_text,
         sum(CASE WHEN COALESCE(source <> '', FALSE) THEN 0 ELSE 1 END) AS v_src
  FROM documents
)
SELECT 'doc_id_not_null' AS check, CAST(v_id AS BIGINT) AS violations, CAST(total AS BIGINT) AS total FROM agg
UNION ALL SELECT 'n_chars_matches_text', CAST(v_n AS BIGINT), CAST(total AS BIGINT) FROM agg
UNION ALL SELECT 'lang_is_iso2', CAST(v_lang AS BIGINT), CAST(total AS BIGINT) FROM agg
UNION ALL SELECT 'text_nonempty', CAST(v_text AS BIGINT), CAST(total AS BIGINT) FROM agg
UNION ALL SELECT 'source_nonempty', CAST(v_src AS BIGINT), CAST(total AS BIGINT) FROM agg
""",
)
def doc_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.checks import run_checks

    docs = load(spark, sf_dir, "documents")
    rules = [
        ("doc_id_not_null", F.col("doc_id").isNotNull()),
        ("n_chars_matches_text", F.col("n_chars") == F.length("text")),
        ("lang_is_iso2", F.col("lang").rlike("^[a-z]{2}$")),
        ("text_nonempty", F.length("text") > 0),
        ("source_nonempty", F.col("source") != ""),
    ]
    return run_checks(docs, rules)


@register(
    "doc_corpus_build",
    doc="The WHOLE corpus build as one declarative plan — the capstone "
    "composition: curation cascade (language-ID → quality → length band "
    "→ repetition → exact-dup survivor, same CTE chain as "
    "doc_curation_pipeline) with the training hand-off columns attached "
    "to every survivor: deterministic train/val/test split and shard id "
    "(operators.shards — portable md5, stable under corpus growth). "
    "What lands in path/split=…/shard=…/ for the trainer, hash-checked "
    "end to end.",
    tags=("corpus", "composed", "shards", "split"),
    oracle=_CURATION_CTES
    + """
SELECT doc_id, source, n_chars, round(quality, 6) AS quality,
       CASE WHEN hk % 10000 < 9000 THEN 'train'
            WHEN hk % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split,
       CAST(hk % 8 AS INTEGER) AS shard
FROM (SELECT d.*,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS hk
      FROM deduped d)
ORDER BY doc_id
""",
)
def doc_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsify_spark.operators.shards import shard_id, split_assignment

    base = doc_curation_pipeline(spark, sf_dir)
    return base.select(
        "*",
        split_assignment(
            F.col("doc_id"), {"train": 0.9, "val": 0.05, "test": 0.05}
        ).alias("split"),
        shard_id(F.col("doc_id"), 8).alias("shard"),
    )


# ------------------------------------------------- CDC-driven incremental curation
_CDC_SUFFIX = " the of and to in it is for on a"

_CDC_INSERTS = [
    (
        900000001,
        "synthetic",
        "the quick brown fox jumps over the lazy dog and runs to the "
        "mill by the river in the cold light of a new day for it is "
        "good to run and to rest in the shade of the old oak",
    ),
    (
        900000002,
        "synthetic",
        "buy buy buy buy buy buy buy now now now now now now now now",
    ),
]


def cdc_mutated_live_ctes() -> str:
    """The CDC mutation cycle as WITH-body CTEs ending in ``live`` (the
    post-commit documents table): text-suffix update on doc_id % 137,
    two synthetic inserts, delete of doc_id % 149. Shared by every
    oracle that replays the txnlog mutations relationally
    (doc_cdc_curation here, doc_bm25_cdc_search in llmops.py)."""
    vals = ", ".join(f"({d}, '{s}', '{t}')" for d, s, t in _CDC_INSERTS)
    return f"""upd AS (
  SELECT doc_id, source,
         CAST(len(text || '{_CDC_SUFFIX}') AS BIGINT) AS n_chars,
         text || '{_CDC_SUFFIX}' AS text
  FROM documents WHERE doc_id % 137 = 0
),
mutated AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, text
  FROM documents WHERE doc_id % 137 <> 0
  UNION ALL SELECT * FROM upd
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), source, CAST(len(text) AS BIGINT), text
  FROM (VALUES {vals}) v(doc_id, source, text)
),
live AS (SELECT * FROM mutated WHERE doc_id % 149 <> 0)"""


def apply_cdc_mutations(spark: SparkSession, docs: DataFrame, path: str) -> None:
    """Run the canonical mutation cycle against a txnlog documents
    table (the Spark side of :func:`cdc_mutated_live_ctes`): MERGE
    upsert of the %137 text edits + the two synthetic inserts, then a
    key-set delete of %149."""
    from newsify_spark.operators import txnlog as T

    new_text = F.concat(F.col("text"), F.lit(_CDC_SUFFIX))
    upd = docs.filter(F.col("doc_id") % 137 == 0).select(
        "doc_id",
        "source",
        F.length(new_text).cast("long").alias("n_chars"),
        new_text.alias("text"),
    )
    ins = spark.createDataFrame(
        [(d, s, len(t), t) for d, s, t in _CDC_INSERTS],
        "doc_id bigint, source string, n_chars bigint, text string",
    )
    T.upsert_rows(spark, path, upd.unionByName(ins), ["doc_id"])
    T.delete_rows(
        spark,
        path,
        docs.filter(F.col("doc_id") % 149 == 0).select("doc_id"),
        ["doc_id"],
    )


def _cdc_curation_oracle() -> str:
    ctes = _CURATION_CTES.replace("WITH stats", "stats", 1).replace(
        "FROM documents", "FROM live"
    )
    return f"""
WITH {cdc_mutated_live_ctes()},
{ctes}
SELECT doc_id, source, n_chars, round(quality, 6) AS quality
FROM deduped ORDER BY doc_id
"""


@register(
    "doc_cdc_curation",
    doc="CDC-DRIVEN INCREMENTAL CURATION (operators.curation + "
    "operators.txnlog.read_changes): the curation cascade operating on "
    "a LIVING corpus table — T7's recompute-what-changed pattern at "
    "corpus scale. The documents table lives in the copy-on-write "
    "transaction log; a MERGE upsert (text edits + two new docs) and a "
    "key-set delete land as commits; the change feed (cost bounded by "
    "the commits' COW blast radius, never table size) drives an upsert "
    "of exactly the changed docs' per-doc gate verdicts (stop ratio, "
    "quality, repetition, content hash — the text-touching half), and "
    "the corpus-level gates (length band, exact-dup min-id survivor) "
    "re-derive from the maintained SCALAR verdict table. Equals a full "
    "recompute bit for bit (test-pinned, tests/test_operators.py) while "
    "re-reading only the commit's files (inputFiles-pinned). The oracle "
    "replays the mutations relationally and runs the full cascade on "
    "the mutated corpus.",
    tags=("corpus", "composed", "txn", "T7", "scale-path"),
    oracle=_cdc_curation_oracle(),
)
def doc_cdc_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from newsify_spark.operators import txnlog as T
    from newsify_spark.operators.curation import (
        apply_changes_to_verdicts,
        curated_from_verdicts,
        curation_verdicts,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text"
    )
    base = tempfile.mkdtemp(prefix="newsify_cdc_cur_")
    try:
        path = f"{base}/docs_t"
        T.create_table(spark, path, docs.repartitionByRange(8, "doc_id"))
        # verdict table maintained from version 0 (materialized: the
        # incremental path must not silently re-read post-mutation state).
        # localCheckpoint is query-harness plumbing for the in-process
        # round trip; the production form persists the verdict table as
        # its own table (operators/curation.py supports that directly —
        # it is just a DataFrame of scalars) and upserts it per commit.
        store = curation_verdicts(T.read_table(spark, path)).localCheckpoint(
            eager=True
        )
        apply_cdc_mutations(spark, docs, path)
        changes = T.read_changes(spark, path, 1)
        store2 = apply_changes_to_verdicts(store, changes).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return curated_from_verdicts(store2).orderBy("doc_id")

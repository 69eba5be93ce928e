"""CDC-driven incremental curation — the gate cascade of
``doc_curation_pipeline`` (queries/corpus.py) split at its natural
seam so a LIVING corpus table (operators/txnlog.py) never re-curates
unchanged documents.

The split: every gate input that touches TEXT is a pure per-document
function (stopword ratio, quality score, top-bigram fraction, content
hash) — compute those once per document into a scalar VERDICT table;
every CORPUS-level decision (length band over the n_chars
distribution, exact-dup min-id survivor per content hash) is a cheap
aggregate over that scalar table. A commit's change feed
(txnlog.read_changes — cost bounded by the commit's COW blast radius)
then drives an upsert of exactly the changed documents' verdict rows:
re-curating a 1-document commit reads the commit's files, not the
corpus (test-pinned via ``inputFiles``). The curated set derived from
the incrementally-maintained verdict table is IDENTICAL to a full
recompute, because the per-doc half is deterministic and the
corpus-level half always re-aggregates the (scalars-only) verdict
table. This is the T7 needs-refresh pattern operating at corpus scale:
recompute what changed, re-derive global decisions from maintained
state.

Reference basis: the gates are the public CCNet/C4/Gopher-style
heuristics already individually oracle-checked (doc_lang_id,
doc_quality_score, doc_repetition, doc_length_outliers,
doc_exact_dedup); the incremental layout mirrors how Delta-backed
data-quality pipelines maintain per-row verdict columns off the CDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.functions.text import (
    quality_score,
    stopword_ratio,
    top_ngram_fraction,
)
from newsify_spark.operators.dedup import content_hash

VERDICT_COLS = (
    "doc_id",
    "source",
    "n_chars",
    "stop_ratio",
    "quality",
    "top_bg",
    "content_hash",
)


def curation_verdicts(docs: DataFrame) -> DataFrame:
    """Per-document gate scalars — the text-touching half of the
    cascade, one codegen'd projection, no shuffle. Deterministic per
    row, so incremental maintenance composes exactly."""
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        stopword_ratio("text").alias("stop_ratio"),
        quality_score("text").alias("quality"),
        top_ngram_fraction("text", 2).alias("top_bg"),
        content_hash("text").alias("content_hash"),
    )


def curated_from_verdicts(verdicts: DataFrame) -> DataFrame:
    """Corpus-level gates over the scalar verdict table (text never
    read): length band (mean ± 1.5σ of n_chars, 1-row broadcast),
    per-doc gate thresholds, exact-dup min-id survivor per content
    hash. Same thresholds and output schema as doc_curation_pipeline."""
    nc = F.col("n_chars").cast("double")
    band = verdicts.agg(
        (F.avg(nc) - 1.5 * F.stddev(nc)).alias("lo"),
        (F.avg(nc) + 1.5 * F.stddev(nc)).alias("hi"),
    )
    gated = verdicts.join(F.broadcast(band)).filter(
        (F.col("stop_ratio") >= 0.08)
        & (F.col("quality") >= 0.5)
        & F.col("n_chars").between(F.col("lo"), F.col("hi"))
        & (F.col("top_bg") <= 0.18)
    )
    keep = gated.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    return gated.join(keep, "doc_id", "left_semi").select(
        "doc_id", "source", "n_chars", F.round("quality", 6).alias("quality")
    )


def apply_changes_to_verdicts(
    verdicts: DataFrame, changes: DataFrame) -> DataFrame:
    """Upsert a CDC change feed (txnlog.read_changes output:
    ``_change_type`` 'insert'|'delete' + ``_commit_version`` + row)
    into the verdict table. The feed collapses to its net effect per
    document (txnlog.net_changes); gates re-run ONLY on the
    net-inserted rows, and the verdict table is scalars, so the
    anti-join half never touches text either.

    The verdict schema is FIXED (``VERDICT_COLS``, keyed on
    ``doc_id``) — the r9 form advertised an ``id_col`` parameter while
    selecting hardcoded document columns, so any non-default value
    failed at analysis time (ADVICE r9); the parameter is gone."""
    from newsify_spark.operators.txnlog import net_changes

    last = net_changes(changes, "doc_id")
    changed_ids = last.select("doc_id")
    survivors = verdicts.join(changed_ids, "doc_id", "left_anti")
    fresh = curation_verdicts(
        last.filter(F.col("_change_type") == "insert").select(
            "doc_id", "source", "n_chars", "text"
        )
    )
    return survivors.unionByName(fresh)

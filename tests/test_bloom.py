"""Bloom-filter pre-filtered dedup (operators/bloom.py): membership
guarantees, merge algebra, exactness of the prefiltered dedup, and the
all-expression plan (no Python UDF anywhere in probe or build)."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsify_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
    bloom_prefilter_dedup,
)


def _keys(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("k")
    )


def test_no_false_negatives(spark):
    corpus = _keys(spark, 0, 500, "doc-")
    bm = bloom_build(corpus, "k", m_bits=1024 * 16, k=5)
    hits = corpus.filter(bloom_might_contain("k", bm, k=5)).count()
    assert hits == 500  # every inserted key must probe positive


def test_false_positive_rate_bounded(spark):
    corpus = _keys(spark, 0, 500, "doc-")
    bm = bloom_build(corpus, "k", m_bits=1024 * 16, k=5)  # ~32 bits/key
    fresh = _keys(spark, 0, 2000, "other-")
    fp = fresh.filter(bloom_might_contain("k", bm, k=5)).count()
    assert fp / 2000 < 0.01, f"fpp {fp / 2000} too high for 32 bits/key"


def test_merge_equals_union_build(spark):
    a, b = _keys(spark, 0, 200, "x-"), _keys(spark, 200, 400, "x-")
    m = 1024 * 8
    merged = bloom_merge(bloom_build(a, "k", m), bloom_build(b, "k", m))
    assert merged == bloom_build(a.unionByName(b), "k", m)


def test_prefilter_dedup_is_exact(spark):
    # overlap: batch 0..1000, corpus 600..1600 -> survivors 0..599
    batch = _keys(spark, 0, 1000, "d-")
    corpus = _keys(spark, 600, 1600, "d-")
    got = sorted(r["k"] for r in bloom_prefilter_dedup(batch, corpus, "k").collect())
    want = sorted(r["k"] for r in batch.join(corpus, "k", "left_anti").collect())
    assert got == want
    assert len(got) == 600


def test_probe_and_build_are_all_expression(spark):
    corpus = _keys(spark, 0, 100, "p-")
    bm = bloom_build(corpus, "k", m_bits=1024)
    plan = (
        corpus.filter(bloom_might_contain("k", bm))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # probe is a filter over the scan: no shuffle added by membership
    assert "Exchange" not in plan

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


def test_relational_probe_matches_literal_probe(spark):
    """Bitmaps past LITERAL_MAX_WORDS route to the relational probe
    (words table joined as data, not a plan literal). Same exact output
    as both the literal path and the plain anti-join."""
    from newsify_spark.operators.bloom import bloom_build_words, bloom_probe_flags

    batch = _keys(spark, 0, 1000, "d-")
    corpus = _keys(spark, 600, 1600, "d-")
    m_bits = 1024 * 16
    words = bloom_build_words(corpus, "k", m_bits).select("word", "bits")
    got = sorted(
        r["k"]
        for r in bloom_prefilter_dedup(
            batch, corpus, "k", words=words, m_bits=m_bits
        ).collect()
    )
    want = sorted(r["k"] for r in batch.join(corpus, "k", "left_anti").collect())
    assert got == want
    # flags agree with the expression probe bit for bit
    bm = bloom_build(corpus, "k", m_bits)
    lit_maybe = {
        r["k"] for r in batch.filter(bloom_might_contain("k", bm)).collect()
    }
    rel_maybe = {
        r["k"]
        for r in bloom_probe_flags(batch, "k", words, m_bits).filter("maybe").collect()
    }
    assert lit_maybe == rel_maybe


def test_oversize_bitmap_list_reroutes_to_words(spark):
    """A bitmap list longer than LITERAL_MAX_WORDS must not become a plan
    literal — the prefilter hands it back as a words table and the result
    stays exact."""
    from newsify_spark.operators import bloom as BL

    batch = _keys(spark, 0, 300, "z-")
    corpus = _keys(spark, 100, 400, "z-")
    m_bits = (BL.LITERAL_MAX_WORDS + 64) * 64
    bm = bloom_build(corpus, "k", m_bits)
    assert len(bm) > BL.LITERAL_MAX_WORDS
    got = sorted(
        r["k"] for r in bloom_prefilter_dedup(batch, corpus, "k", bitmap=bm).collect()
    )
    want = sorted(r["k"] for r in batch.join(corpus, "k", "left_anti").collect())
    assert got == want


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

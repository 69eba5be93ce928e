"""Bloom-filter pre-filtered exact dedup — the membership-sketch layer
of a rolling-ingest pipeline.

Reference parity: the reference dedups ingest batches by looking every
key up in Redis (duplication_service.py:120-143 — one network round
trip per document). The Spark-first shape replaces the per-key store
with a COMPACT MERGEABLE BITMAP: a Bloom filter built from the corpus
key set answers "definitely new" executor-side with zero I/O, and only
the (rare) maybe-duplicates pay the exact verification join. CCNet /
Dolma-style corpus pipelines use exactly this layout for rolling
ingest at web scale.

Everything is JVM-side expressions:

- BUILD: each corpus key sets k bit positions ``xxhash64(key, i) mod m``;
  positions fold to (word, mask) pairs and a ``bit_or`` groupBy yields
  the m/64-word bitmap. ``bit_or`` is associative/commutative, so the
  build is one partial-agg-combined shuffle of m/64-bounded rows per
  partition — and bitmaps from separate batches/days MERGE by element-
  wise OR, no rebuild.
- PROBE: the bitmap ships as a broadcast array literal; the membership
  test is k chained ``element_at`` + shift/AND expressions — whole-stage
  codegen, no UDF, no shuffle.

Scale bound: the literal bitmap costs m/8 bytes in the task closure —
size m for the DEDUP HORIZON, not all history (12 MB covers 1e8 keys at
fpp<1e-2 with k=5). Beyond that, shard bitmaps by key range (the probe
picks its shard by ``pmod(xxhash64(key), n_shards)``) or lean on
Spark's own runtime bloom join filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), which inject the
same sketch into shuffle anti-joins automatically.

False positives are verified, false negatives are impossible, so the
RESULT is exact — identical to a plain anti-join, which is what the
DuckDB oracle checks (queries/llmops.py::doc_bloom_dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = 5,
) -> list[int]:
    """Build an m_bits Bloom bitmap from ``keys[key_col]`` and return it
    as a list of ``m_bits/64`` longs (word i holds bits [64i, 64i+64)).

    One narrow pass: k positions per key -> (word, mask) -> groupBy(word)
    with ``bit_or`` partial aggregation. The shuffle carries at most
    m/64 rows PER MAP PARTITION regardless of corpus size; the driver
    collects at most m/64 rows total.
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = F.explode(
        F.array(*[F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits)) for i in range(k)])
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # call_function: SQL shiftleft takes a COLUMN bit count (the
            # python wrapper F.shiftleft only accepts an int literal)
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_merge(a: list[int], b: list[int]) -> list[int]:
    """Elementwise OR — bitmaps from separate batches merge exactly."""
    if len(a) != len(b):
        raise ValueError(f"bitmap sizes differ: {len(a)} vs {len(b)}")
    return [x | y for x, y in zip(a, b)]


def bloom_might_contain(
    key_col: str | Column,
    bitmap: list[int],
    k: int = 5,
) -> Column:
    """Pure-expression membership probe: TRUE iff all k probed bits are
    set. k chained element_at/shift/AND terms — whole-stage codegen'd,
    the bitmap rides the plan as one array<long> literal."""
    m_bits = len(bitmap) * 64
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    lit_words = F.lit(bitmap)
    cond = F.lit(True)
    for i in range(k):
        p = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter_dedup(
    batch: DataFrame,
    corpus_keys: DataFrame,
    key_col: str,
    k: int = 5,
    bits_per_key: int = 20,
    m_bits: int | None = None,
) -> DataFrame:
    """Exact dedup of ``batch`` against ``corpus_keys`` with a Bloom
    pre-filter: rows whose key is definitely-absent pass with ZERO
    shuffle; only bloom-positive rows (true dups + fpp false alarms)
    enter the verification anti-join. Output == plain
    ``batch ANTI JOIN corpus`` (bloom-independent — the oracle checks
    this), but at 100 TB the join input shrinks from |batch| to
    |dups| + fpp*|batch|.

    ``corpus_keys`` must expose ``key_col``; m defaults to the next
    power of two of ``bits_per_key * |corpus|`` (20 bits/key, k=5 →
    fpp ≈ 1e-4).
    """
    if m_bits is None:
        n = corpus_keys.count()
        m_bits = max(1024, _next_pow2(bits_per_key * max(n, 1)))
    bitmap = bloom_build(corpus_keys, key_col, m_bits, k=k)
    maybe = bloom_might_contain(key_col, bitmap, k=k)
    definitely_new = batch.filter(~maybe)
    verified_new = batch.filter(maybe).join(
        corpus_keys.select(key_col), key_col, "left_anti"
    )
    return definitely_new.unionByName(verified_new)

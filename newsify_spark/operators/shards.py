"""Deterministic sharded training-output writer.

A training run consumes the curated corpus as N fixed shards: every
worker must see the same shard membership on every rebuild, shards must
be balanced, and the hand-off needs a verifiable manifest (row counts +
order-independent content checksums) so the training side can detect a
partial or stale write without re-reading the corpus.

The reference hands results downstream as unversioned MongoDB
collections (duplication_service.py writes, recommendation services
read); at 100 TB the hand-off is files, and this operator makes it
deterministic and checkable:

- shard id = md5-derived hash of the key column, mod n_shards —
  PORTABLE (bit-identical in Spark, DuckDB, Python), unlike Spark's
  ``hash()`` (Murmur3, seed-dependent) — so the manifest is
  oracle-checkable and a rebuilt corpus shards identically.
- the write is one ``repartition(n, shard)`` shuffle then a
  ``partitionBy(shard)`` parquet write: each shard lands as one
  directory, balanced by the hash.
- the manifest is a single aggregate over the same plan: rows, xor of
  per-row key hashes (order-independent), min/max key per shard.

Scale: one keyed shuffle over the output data — the minimum possible for
a sharded write — and the manifest aggregation is map-side-combining on
the same partitioning, so it adds no extra shuffle of row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id(key: F.Column, n_shards: int) -> F.Column:
    """Portable deterministic shard for a key: first 8 md5 hex chars as
    an int, mod n_shards. Matches DuckDB
    ``CAST('0x'||substr(md5(CAST(k AS VARCHAR)),1,8) AS BIGINT) % n``."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % F.lit(n_shards)).cast("int")


def shard_manifest(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """(shard, n_rows, xor_checksum, min_key, max_key) per shard.

    The checksum is the XOR of each row's 32-bit key hash — order- and
    partitioning-independent, so a manifest computed from the written
    files always equals one computed from the source plan."""
    key = F.col(key_col)
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return (
        df.select(shard_id(key, n_shards).alias("shard"), key.alias("_k"), h.alias("_h"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(_h)").alias("xor_checksum"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
        )
    )


def write_training_shards(
    df: DataFrame, path: str, key_col: str, n_shards: int
) -> DataFrame:
    """Write ``df`` as ``path/shard=i/`` parquet directories plus a
    ``path/_manifest`` parquet; returns the manifest DataFrame.

    Deterministic: rebuilding from the same input produces the same
    shard membership and the same manifest, so downstream trainers can
    diff manifests instead of data."""
    sharded = df.withColumn("shard", shard_id(F.col(key_col), n_shards))
    sharded.repartition(n_shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)
    spark = df.sparkSession
    manifest = shard_manifest(spark.read.parquet(path), key_col, n_shards)
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def validate_shards(spark, path: str, key_col: str, n_shards: int) -> bool:
    """Recompute the manifest from the written shard files and compare to
    the stored one. True iff every (shard, n_rows, xor_checksum) agrees —
    the cheap integrity check a trainer runs before consuming."""
    stored = spark.read.parquet(f"{path}/_manifest").select(
        "shard", "n_rows", "xor_checksum"
    )
    actual = shard_manifest(spark.read.parquet(path), key_col, n_shards).select(
        "shard", "n_rows", "xor_checksum"
    )
    return stored.exceptAll(actual).isEmpty() and actual.exceptAll(stored).isEmpty()


def split_assignment(
    key: F.Column, weights: dict[str, float], buckets: int = 10_000
) -> F.Column:
    """Deterministic train/val/test assignment from the same portable
    md5 hash as :func:`shard_id`: the key's hash bucket (of ``buckets``)
    falls into cumulative weight ranges. STABLE UNDER CORPUS GROWTH —
    a document's split never changes when other documents are added or
    removed, which is what makes hash splits (vs random splits) safe to
    recompute at every rebuild. Weights must sum to 1."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    b = h % F.lit(buckets)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = b < F.lit(int(round(acc * buckets)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return (expr.otherwise(last) if expr is not None else F.lit(last)).alias("split")


def split_manifest(
    df: DataFrame, key_col: str, weights: dict[str, float], buckets: int = 10_000
) -> DataFrame:
    """(split, n_rows, xor_checksum) per split — the hand-off contract
    for a train/val/test partition, same checksum algebra as
    :func:`shard_manifest`."""
    key = F.col(key_col)
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return (
        df.select(split_assignment(key, weights, buckets).alias("split"), h.alias("_h"))
        .groupBy("split")
        .agg(F.count("*").alias("n_rows"), F.expr("bit_xor(_h)").alias("xor_checksum"))
    )

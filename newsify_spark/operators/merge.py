"""Mutation semantics on immutable tables.

The reference mutates MongoDB/Postgres rows in place (S8-S12, S17:
insert_one / update_one $set|$push / update_many $in / delete_one /
UPDATE...SET). On a lakehouse there is no in-place update; each becomes a
pure DataFrame transform whose result overwrites (or appends to) the
table. At 100 TB these writes target only affected partitions
(partitionBy date / bucket) — the transforms below are already keyed so
dynamic partition overwrite applies directly; with Delta/Iceberg on the
classpath they become MERGE INTO with no logic change.

Reference citations: upsert batch-cluster-service.py:154-158 &
recommendation-trainer.py:259-263 (S9); $push array append
duplication_service.py:110-116 (S10); update_many bulk label
batch-cluster-service.py:170-173 (S11); delete_one sweep
batch-cluster-service.py:178-180 (S12); flag update
bias_detection_service.py:104-117 (S17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_by_key(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """update_one(..., upsert=True): new rows win, untouched old rows
    survive. anti-join is a single shuffle on the key (broadcast when
    ``new`` is small — Catalyst/AQE decides)."""
    return new.unionByName(old.join(new, keys, "left_anti"))


def upsert_partitioned(
    spark,
    path: str,
    new: DataFrame,
    keys: list[str],
    partition_col: str,
) -> None:
    """S9 at 100 TB (VERDICT round-1 item #6): upsert into a
    date/bucket-partitioned parquet table via DYNAMIC partition
    overwrite — only partitions present in ``new`` are rewritten; every
    other partition's files are untouched. This is the MERGE INTO
    equivalent for plain parquet (with Delta/Iceberg on the classpath
    the body becomes one MERGE statement, same call signature).

    The affected-partition list is collected (bounded by the partition
    count, never row count); the merged slice is localCheckpoint'ed so
    the overwrite does not read from the path it is writing.

    A key may MOVE partitions (its new row carries a different
    ``partition_col`` value than its old row). Affected partitions are
    therefore the union of the new rows' partitions and the partitions
    currently holding any upserted key — both get rewritten, so the old
    row is dropped from its former partition instead of surviving as a
    stale duplicate.
    """
    old = spark.read.parquet(path)
    new_parts = new.select(partition_col).distinct()
    moved_parts = (
        old.join(new.select(*keys).distinct(), keys, "left_semi")
        .select(partition_col)
        .distinct()
    )
    parts = [r[0] for r in new_parts.union(moved_parts).distinct().collect()]
    affected = old.filter(F.col(partition_col).isin(parts))
    merged = upsert_by_key(affected, new.select(*old.columns), keys)
    merged = merged.localCheckpoint(eager=True)  # break source==sink lineage
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only rewrites partitions PRESENT in the output —
    # a partition emptied by a key move must be deleted explicitly
    left = {r[0] for r in merged.select(partition_col).distinct().collect()}
    emptied = [p for p in parts if p not in left]
    if emptied:
        sc = spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        Path = sc._jvm.org.apache.hadoop.fs.Path
        for p in emptied:
            pdir = Path(f"{path}/{partition_col}={p}")
            fs = pdir.getFileSystem(hconf)
            if fs.exists(pdir):
                fs.delete(pdir, True)


def bulk_update(
    target: DataFrame, updates: DataFrame, keys: list[str], set_cols: list[str]
) -> DataFrame:
    """update_many({key IN ...}, {$set: ...}): left join + coalesce keeps
    unmatched rows unchanged. ``updates`` columns must be the keys plus
    ``set_cols``."""
    upd = updates.select(*keys, *[F.col(c).alias(f"__new_{c}") for c in set_cols])
    out = target.join(upd, keys, "left")
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c)))
    return out.drop(*[f"__new_{c}" for c in set_cols])


def delete_keys(target: DataFrame, doomed: DataFrame, keys: list[str]) -> DataFrame:
    """delete_one per key -> one anti join."""
    return target.join(doomed.select(*keys), keys, "left_anti")


def array_append_distinct(
    target: DataFrame, key: str, arr_col: str, additions: DataFrame, add_col: str
) -> DataFrame:
    """$push with upstream-guaranteed dedup (E4) -> array_union.

    ``additions``: (key, add_col) rows; grouped to arrays then unioned
    into the target's array column. Rows without additions pass through."""
    grouped = additions.groupBy(key).agg(F.collect_list(add_col).alias("__adds"))
    out = target.join(grouped, key, "left")
    return out.withColumn(
        arr_col,
        F.when(
            F.col("__adds").isNotNull(), F.array_union(F.col(arr_col), F.col("__adds"))
        ).otherwise(F.col(arr_col)),
    ).drop("__adds")

"""RESTORE-as-a-commit and blind-append auto-rebase
(operators/txnlog.py round 12): restore re-publishes a prior snapshot
metadata-only (rewriting only deletion-vector-divergent files), the
change feed reports the exact net diff, history and time travel stay
intact, vacuumed targets fail loudly; append_rebase re-commits
already-written files under a new version when the CAS is lost."""

from __future__ import annotations

import unittest.mock as mock

import pytest
from pyspark.sql import functions as F

from newsify_spark.operators import txnlog as T


def _fixture(spark, n=100):
    return (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("val"))
        .repartition(4)
    )


def _mutate(spark, path):
    """upsert + COW delete + DV delete: v1..v3."""
    T.upsert_rows(
        spark, path,
        spark.createDataFrame([(50, 999)], "k long, val long"), ["k"],
    )
    T.delete_rows(
        spark, path, spark.range(10).select(F.col("id").alias("k")), ["k"]
    )
    T.delete_rows(
        spark, path, spark.range(20, 25).select(F.col("id").alias("k")),
        ["k"], mode="dv",
    )


def test_restore_roundtrip_and_forward(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    orig = sorted(map(tuple, T.read_table(spark, path).collect()))
    _mutate(spark, path)
    assert T.read_table(spark, path).count() == 85
    rv = T.restore(spark, path, 0)
    assert rv == 4
    assert sorted(map(tuple, T.read_table(spark, path).collect())) == orig
    # the restore is itself restorable away from — forward to the DV
    # state (vector-divergent file rewritten, content exact)
    rv2 = T.restore(spark, path, 3)
    snap = T.read_table(spark, path)
    assert snap.count() == 85
    assert snap.filter((F.col("k") >= 20) & (F.col("k") < 25)).count() == 0
    assert snap.filter(F.col("k") == 50).first().val == 999
    # time travel across both restores is intact
    assert T.read_table(spark, path, version=0).count() == 100
    assert T.read_table(spark, path, version=3).count() == 85
    assert T.read_table(spark, path, version=rv).count() == 100
    # already at the target: no-op
    assert T.restore(spark, path, rv2) is None


def test_restore_change_feed_is_net_diff(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    _mutate(spark, path)
    rv = T.restore(spark, path, 0)
    ch = T.read_changes(spark, path, rv, rv)
    ins = sorted(
        (r.k, r.val)
        for r in ch.filter(F.col("_change_type") == "insert").collect()
    )
    dels = sorted(
        (r.k, r.val)
        for r in ch.filter(F.col("_change_type") == "delete").collect()
    )
    # un-deleted rows (COW batch + DV batch) + the upsert preimage return
    assert ins == sorted(
        [(k, 2 * k) for k in range(10)]
        + [(k, 2 * k) for k in range(20, 25)]
        + [(50, 100)]
    )
    # the upsert postimage is retracted
    assert dels == [(50, 999)]


def test_restore_metadata_only_when_no_dv_divergence(spark, tmp_path):
    """Without vector divergence the restore re-adds dropped files
    BY REFERENCE: the commit's add list points at the original
    ``data/c0-*`` paths, no new data directory appears."""
    import os

    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    dirs_before = set(os.listdir(os.path.join(path, "data")))
    T.delete_rows(
        spark, path, spark.range(10).select(F.col("id").alias("k")), ["k"]
    )
    dirs_mid = set(os.listdir(os.path.join(path, "data")))
    rv = T.restore(spark, path, 0)
    e = T.history(path)[rv]
    assert all(f.startswith("data/c0-") for f in e["add"])
    # stats carried for the re-added files: pruning still works
    rep = T.scan_report(path, [("k", "=", 1)])
    assert rep["files_skipped"] > 0
    assert set(os.listdir(os.path.join(path, "data"))) == dirs_mid
    assert dirs_before <= dirs_mid


def test_restore_after_vacuum_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(
        spark, path, spark.range(10).select(F.col("id").alias("k")), ["k"]
    )
    T.vacuum(spark, path, retain_versions=1)
    with pytest.raises(ValueError, match="vacuumed"):
        T.restore(spark, path, 0)


def test_append_rebase_recommits_same_files(spark, tmp_path):
    """A lost CAS re-commits the ALREADY-WRITTEN files under the next
    version — observable because the data directory keeps the original
    version prefix while the commit lands one higher."""
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    orig_commit = T._commit
    stolen = []

    def racing(path_, v_, op, add, remove, cols, txn=None, stats=None,
               dv=None):
        if op == "append" and not stolen:
            stolen.append(v_)
            orig_commit(path_, v_, "append", [], [], cols)
        return orig_commit(path_, v_, op, add, remove, cols, txn=txn,
                           stats=stats, dv=dv)

    with mock.patch.object(T, "_commit", side_effect=racing):
        v = T.append_rebase(
            spark,
            path,
            spark.createDataFrame([(500, 1)], "k long, val long"),
        )
    assert v == stolen[0] + 1  # landed one past the stolen version
    e = T.history(path)[v]
    assert all(f.startswith(f"data/c{stolen[0]}-") for f in e["add"])
    assert T.read_table(spark, path).filter(F.col("k") == 500).count() == 1


def test_append_rebase_exhausts(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    orig_commit = T._commit

    def always_racing(path_, v_, op, add, remove, cols, txn=None,
                      stats=None, dv=None):
        if op == "append" and add:
            orig_commit(path_, v_, "append", [], [], cols)
        return orig_commit(path_, v_, op, add, remove, cols, txn=txn,
                           stats=stats, dv=dv)

    with mock.patch.object(T, "_commit", side_effect=always_racing):
        with pytest.raises(T.ConcurrentWriteError, match="lost the version"):
            T.append_rebase(
                spark,
                path,
                spark.createDataFrame([(500, 1)], "k long, val long"),
                max_rebases=2,
            )

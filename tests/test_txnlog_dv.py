"""Deletion vectors (merge-on-read deletes) on the transaction log —
operators/txnlog.py round 12.

Contract pins: a DV delete rewrites NO data file (write-amplification
guarantee); readers, COW rewrites, optimize, and the change feed all
apply vectors; vectors accumulate and die with their file; purge_dvs
reconciles; vacuum treats referenced sidecars as live; checkpoints
carry the attachment map; the streaming feed delivers DV-only commits.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newsify_spark.operators import txnlog as T


def _fixture(spark, n=100, parts=4):
    return (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("val"))
        .repartition(parts)
    )


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_dv_delete_rewrites_no_data_file(spark, tmp_path):
    """The whole point: the live data-file set is UNCHANGED by a DV
    delete — only a sidecar appears — yet reads exclude the rows."""
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    files_before = set(T._snapshot_state(path)["files"])
    v = T.delete_rows(spark, path, _keys(spark, 0, 10), ["k"], mode="dv")
    st = T._snapshot_state(path)
    assert set(st["files"]) == files_before  # no add, no remove
    assert st["dvs"], "commit must attach a deletion vector"
    assert all(parts for parts in st["dvs"].values())
    snap = T.read_table(spark, path)
    assert snap.count() == 90
    assert snap.filter(F.col("k") < 10).count() == 0
    # history records a delete op with no file churn
    e = T.history(path)[v]
    assert e["op"] == "delete" and not e["add"] and not e["remove"]
    assert e["dv"]


def test_dv_accumulate_time_travel_and_pruned_read(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(spark, path, _keys(spark, 0, 10), ["k"], mode="dv")
    T.delete_rows(spark, path, _keys(spark, 10, 15), ["k"], mode="dv")
    assert T.read_table(spark, path).count() == 85
    # time travel re-applies exactly the vectors attached at each version
    assert T.read_table(spark, path, version=0).count() == 100
    assert T.read_table(spark, path, version=1).count() == 90
    # stats-pruned read still applies vectors on the surviving files
    assert T.read_table(spark, path, where=[("k", "<", 20)]).count() == 5


def test_dv_change_feed_exact_delete_images(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(spark, path, _keys(spark, 0, 10), ["k"], mode="dv")
    T.delete_rows(spark, path, _keys(spark, 10, 15), ["k"], mode="dv")
    ch = T.read_changes(spark, path, 1, 2)
    assert ch.filter(F.col("_change_type") != "delete").count() == 0
    got = sorted((r._commit_version, r.k, r.val) for r in ch.collect())
    want = sorted(
        [(1, k, 2 * k) for k in range(10)]
        + [(2, k, 2 * k) for k in range(10, 15)]
    )
    assert got == want


def test_rewrite_of_dv_file_applies_vectors_no_resurrection(spark, tmp_path):
    """An upsert whose COW blast radius includes a vector-carrying file
    must apply the vectors (the rewrite drops them) — and the rewrite's
    OWN change feed must not resurface the already-deleted rows as
    fresh delete images (the removed side reads vector-filtered)."""
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(spark, path, _keys(spark, 0, 15), ["k"], mode="dv")
    v = T.upsert_rows(
        spark,
        path,
        spark.createDataFrame([(20, 999)], "k long, val long"),
        ["k"],
    )
    snap = T.read_table(spark, path)
    assert snap.count() == 85
    assert snap.filter(F.col("k") == 20).first().val == 999
    assert snap.filter(F.col("k") < 15).count() == 0  # no resurrection
    got = sorted(
        (r._change_type, r.k, r.val)
        for r in T.read_changes(spark, path, v, v).collect()
    )
    assert got == [("delete", 20, 40), ("insert", 20, 999)]


def test_cow_delete_applies_existing_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark, parts=2))
    T.delete_rows(spark, path, _keys(spark, 0, 5), ["k"], mode="dv")
    T.delete_rows(spark, path, _keys(spark, 5, 8), ["k"], mode="cow")
    snap = T.read_table(spark, path)
    assert snap.count() == 92
    assert snap.filter(F.col("k") < 8).count() == 0


def test_purge_dvs_reconciles_and_nets_to_zero(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(spark, path, _keys(spark, 0, 10), ["k"], mode="dv")
    before = sorted(map(tuple, T.read_table(spark, path).collect()))
    pv = T.purge_dvs(spark, path)
    assert pv is not None
    after = sorted(map(tuple, T.read_table(spark, path).collect()))
    assert after == before  # data-identical on live rows
    assert not T._snapshot_state(path)["dvs"]
    # reconciliation is invisible to CDC consumers
    assert T.read_changes(spark, path, pv, pv).count() == 0
    # idempotent: nothing left to purge
    assert T.purge_dvs(spark, path) is None


def test_optimize_applies_and_drops_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(spark, path, _keys(spark, 0, 10), ["k"], mode="dv")
    before = sorted(map(tuple, T.read_table(spark, path).collect()))
    v = T.optimize(spark, path, target_bytes=1 << 20)
    assert v is not None
    assert sorted(map(tuple, T.read_table(spark, path).collect())) == before
    assert not T._snapshot_state(path)["dvs"]
    assert T.read_changes(spark, path, v, v).count() == 0


def test_vacuum_keeps_referenced_sidecars(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(spark, path, _keys(spark, 0, 10), ["k"], mode="dv")
    # retained snapshot still references the vector: vacuum must keep it
    removed = T.vacuum(spark, path, retain_versions=1)
    assert all("-dv/" not in f for f in removed)
    assert T.read_table(spark, path).count() == 90
    # after purge the sidecar is unreferenced and reclaimed
    T.purge_dvs(spark, path)
    removed = T.vacuum(spark, path, retain_versions=1)
    assert any("-dv/" in f for f in removed)
    assert T.read_table(spark, path).count() == 90


def test_dv_survives_checkpoint(spark, tmp_path):
    """The attachment map rides checkpoints: resolve a snapshot PAST a
    checkpoint boundary (CHECKPOINT_EVERY commits of padding) and the
    vectors still apply."""
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(spark, path, _keys(spark, 0, 10), ["k"], mode="dv")
    pad = spark.createDataFrame(
        [(10_000, 0)], "k long, val long"
    ).coalesce(1)
    for i in range(T.CHECKPOINT_EVERY + 1):
        T.append_rows(
            spark,
            path,
            pad.select((F.col("k") + i).alias("k"), "val"),
        )
    assert T._checkpoints(path), "padding must cross a checkpoint"
    ck_state = T._snapshot_state(path)
    assert ck_state["dvs"], "checkpointed state must carry the vectors"
    snap = T.read_table(spark, path)
    assert snap.filter(F.col("k") < 10).count() == 0
    assert snap.count() == 90 + T.CHECKPOINT_EVERY + 1


def test_dv_noop_when_no_position_matches(spark, tmp_path):
    """Keys absent from the table: the commit lands (version advances)
    but attaches nothing and leaves no orphan sidecar directory."""
    import os

    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    v = T.delete_rows(
        spark, path, _keys(spark, 10_000, 10_005), ["k"], mode="dv"
    )
    assert v == 1
    st = T._snapshot_state(path)
    assert not st["dvs"]
    data_root = os.path.join(path, "data")
    assert not [d for d in os.listdir(data_root) if d.endswith("-dv")]
    assert T.read_table(spark, path).count() == 100


def test_dv_rejects_unknown_mode(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    with pytest.raises(ValueError, match="unknown delete mode"):
        T.delete_rows(spark, path, _keys(spark, 0, 1), ["k"], mode="nope")


def test_stream_cdf_delivers_dv_only_commits(spark, tmp_path):
    """A DV commit has empty add/remove lists — the streaming source's
    structural no-op detection must still deliver it (it changes rows),
    while a genuinely empty delete commit is skipped."""
    from newsify_spark.streaming.cdf import stream_changes

    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.delete_rows(spark, path, _keys(spark, 0, 10), ["k"], mode="dv")  # v1
    T.delete_rows(spark, path, _keys(spark, 10_000, 10_001), ["k"])  # v2 noop
    batches = list(stream_changes(spark, path, 1, 2))
    assert [(lo, hi) for lo, hi, _ in batches] == [(1, 1)]
    got = sorted(r.k for r in batches[0][2].collect())
    assert got == list(range(10))

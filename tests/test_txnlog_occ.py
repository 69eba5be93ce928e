"""Optimistic-concurrency LOGICAL CONFLICT RESOLUTION on the
transaction log (Delta's conflict matrix, VLDB 2020 §3.2).

The version CAS always detects interleaving; these tests pin what
happens NEXT: rewrites whose interleaved commits are provably disjoint
(by commit-recorded stats) re-commit metadata-only under the next
version — no Spark job re-runs — while genuine conflicts (same files
rewritten, possibly-matching keys appended, schema races, DV'd victims)
raise ConcurrentWriteError naming the cause. Interleavings are injected
by hooking the stage between version pinning and commit, exactly the
real race window.
"""

import pytest
from pyspark.sql import functions as F

from newsify_spark.operators import txnlog as T


def _mk(spark, tmp_path, n=40):
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"s{i % 2}", float(i)) for i in range(n)],
        "id int, status string, price double",
    )
    # range layout => commit stats can PROVE key disjointness
    T.create_table(spark, tbl, df.repartitionByRange(4, "id"))
    return tbl


def _row(spark, i, status="x", price=0.0):
    return spark.createDataFrame(
        [(i, status, price)], "id int, status string, price double"
    )


def _interleave_after_write(monkeypatch, action):
    """Run ``action`` once, right after the mutation under test has
    written its data files but before its commit — the CAS-loss
    window."""
    orig = T._write_data
    state = {"armed": True}

    def hook(spark, path, df, version):
        out = orig(spark, path, df, version)
        if state["armed"]:
            state["armed"] = False
            action()
        return out

    monkeypatch.setattr(T, "_write_data", hook)


def test_upsert_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    tbl = _mk(spark, tmp_path)
    _interleave_after_write(
        monkeypatch,
        lambda: T.append_rows(spark, tbl, _row(spark, 1000, "blind")),
    )
    v = T.upsert_rows(spark, tbl, _row(spark, 3, "upd", 9.0), keys=["id"])
    # the interleaved append took version 1; the upsert REBASED to 2
    assert v == 2
    got = {r.id: r.status for r in T.read_table(spark, tbl).collect()}
    assert got[3] == "upd" and got[1000] == "blind" and len(got) == 41
    ops = [e["op"] for e in T._read_log(tbl)]
    assert ops == ["create", "append", "upsert"]


def test_upsert_conflicts_with_matching_append(spark, tmp_path, monkeypatch):
    tbl = _mk(spark, tmp_path)
    # the interleaved append lands id=3 — the very key the upsert read:
    # its snapshot missed a row that should have been merged
    _interleave_after_write(
        monkeypatch,
        lambda: T.append_rows(spark, tbl, _row(spark, 3, "race")),
    )
    with pytest.raises(T.ConcurrentWriteError, match="may contain keys"):
        T.upsert_rows(spark, tbl, _row(spark, 3, "upd", 9.0), keys=["id"])
    # the loser's data never became visible
    assert T.read_table(spark, tbl).filter("status = 'upd'").count() == 0


def test_delete_rebases_and_conflicts_correctly(spark, tmp_path, monkeypatch):
    tbl = _mk(spark, tmp_path)
    _interleave_after_write(
        monkeypatch,
        lambda: T.append_rows(spark, tbl, _row(spark, 2000, "blind")),
    )
    T.delete_rows(spark, tbl, _row(spark, 5).select("id"), keys=["id"])
    snap = T.read_table(spark, tbl)
    assert snap.filter("id = 5").count() == 0
    assert snap.filter("id = 2000").count() == 1

    tbl2 = _mk(spark, tmp_path / "b")
    _interleave_after_write(
        monkeypatch,
        lambda: T.append_rows(spark, tbl2, _row(spark, 7, "race")),
    )
    with pytest.raises(T.ConcurrentWriteError, match="may contain keys"):
        T.delete_rows(spark, tbl2, _row(spark, 7).select("id"), keys=["id"])


def test_two_rewrites_of_same_file_conflict(spark, tmp_path, monkeypatch):
    tbl = _mk(spark, tmp_path)
    # both mutations hit id 3 and 4 — same range file
    _interleave_after_write(
        monkeypatch,
        lambda: T.upsert_rows(
            spark, tbl, _row(spark, 4, "first", 1.0), keys=["id"]
        ),
    )
    with pytest.raises(T.ConcurrentWriteError, match="concurrently rewrote"):
        T.upsert_rows(spark, tbl, _row(spark, 3, "second", 2.0), keys=["id"])
    got = {r.id: r.status for r in T.read_table(spark, tbl).collect()}
    assert got[4] == "first" and got[3] == "s1"  # loser invisible


def test_optimize_rebases_over_any_append(spark, tmp_path, monkeypatch):
    tbl = _mk(spark, tmp_path)
    # append OVERLAPPING keys — irrelevant to a data-identical re-layout
    _interleave_after_write(
        monkeypatch,
        lambda: T.append_rows(spark, tbl, _row(spark, 3, "ingest")),
    )
    v = T.optimize(spark, tbl, target_bytes=1 << 30)
    assert v == 2
    snap = T.read_table(spark, tbl)
    assert snap.count() == 41
    assert snap.filter("id = 3").count() == 2  # both rows live


def test_optimize_conflicts_when_victim_rewritten(
    spark, tmp_path, monkeypatch
):
    tbl = _mk(spark, tmp_path)
    _interleave_after_write(
        monkeypatch,
        lambda: T.delete_rows(
            spark, tbl, _row(spark, 3).select("id"), keys=["id"]
        ),
    )
    with pytest.raises(T.ConcurrentWriteError, match="concurrently rewrote"):
        T.optimize(spark, tbl, target_bytes=1 << 30)
    # the delete won; optimize's staged rewrite never surfaced
    assert T.read_table(spark, tbl).count() == 39


def test_dv_delete_conflicts_when_annotated_file_rewritten(
    spark, tmp_path, monkeypatch
):
    tbl = _mk(spark, tmp_path)
    orig = T._write_deletion_vector
    state = {"armed": True}

    def hook(*a, **kw):
        out = orig(*a, **kw)
        if state["armed"]:
            state["armed"] = False
            # rewrite the same file region the vector annotates
            T.delete_rows(
                spark, tbl, _row(spark, 4).select("id"), keys=["id"]
            )
        return out

    monkeypatch.setattr(T, "_write_deletion_vector", hook)
    with pytest.raises(T.ConcurrentWriteError):
        T.delete_rows(
            spark, tbl, _row(spark, 3).select("id"), keys=["id"], mode="dv"
        )
    snap = T.read_table(spark, tbl)
    assert snap.filter("id = 3").count() == 1  # dv delete aborted
    assert snap.filter("id = 4").count() == 0  # interleaver won


def test_merge_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    tbl = _mk(spark, tmp_path)
    _interleave_after_write(
        monkeypatch,
        lambda: T.append_rows(spark, tbl, _row(spark, 3000, "blind")),
    )
    T.merge_table(
        spark, tbl, _row(spark, 6, "m", 1.0), on=["id"],
        when_matched_update="all",
    )
    got = {r.id: r.status for r in T.read_table(spark, tbl).collect()}
    assert got[6] == "m" and got[3000] == "blind"


def test_schema_race_conflicts(spark, tmp_path, monkeypatch):
    tbl = _mk(spark, tmp_path)
    wide = spark.createDataFrame(
        [(4000, "w", 0.0, "extra")],
        "id int, status string, price double, note string",
    )
    _interleave_after_write(
        monkeypatch, lambda: T.append_rows(spark, tbl, wide)
    )
    with pytest.raises(T.ConcurrentWriteError, match="schema"):
        T.upsert_rows(spark, tbl, _row(spark, 6, "u", 1.0), keys=["id"])

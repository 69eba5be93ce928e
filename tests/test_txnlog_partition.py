"""Hive-style partitioned tables on the transaction log.

Partition values live in the file paths (self-describing), fold into
per-file stats as degenerate min=max intervals at write time, and are
re-attached at read by ONE broadcast file→values join — so every
existing skipping path prunes whole partitions and the scan stays one
plan node at any partition count. These tests pin: skip-count floors,
partitioned == unpartitioned result parity, type/escape round-trips,
null partitions, mutation lifecycle (upsert / CoW + DV delete /
OPTIMIZE / restore / vacuum), partition-key blast radius, and the
change feed carrying partition columns.
"""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from newsify_spark.operators import txnlog as T


def _mk(spark, n=60):
    rows = [
        (i, f"d{i % 3}", datetime.date(2026, 1, 1 + i % 4), float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "id int, dom string, day date, v double"
    )


def test_partition_pruning_skip_counts(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark), partition_by=["dom", "day"])
    state = T._snapshot_state(tbl)
    by_dom = {}
    for f in state["files"]:
        vals = T._parse_partition_values(
            f, T._partition_spec(tbl)
        )
        by_dom.setdefault(vals["dom"], set()).add(f)
    rep = T.scan_report(tbl, [("dom", "=", "d1")])
    # equality on a partition column opens EXACTLY that partition
    assert rep["files_read"] == len(by_dom["d1"])
    rep_in = T.scan_report(tbl, [("dom", "in", ["d0", "d2"])])
    assert rep_in["files_read"] == len(by_dom["d0"] | by_dom["d2"])
    rep_day = T.scan_report(
        tbl,
        [("day", "between", (datetime.date(2026, 1, 1), datetime.date(2026, 1, 2)))],
    )
    assert 0 < rep_day["files_read"] < rep_day["files_live"]
    # conjunction prunes to the intersection
    rep_both = T.scan_report(
        tbl, [("dom", "=", "d1"), ("day", "=", datetime.date(2026, 1, 2))]
    )
    assert rep_both["files_read"] <= min(rep["files_read"], 9)


def test_partitioned_matches_unpartitioned(spark, tmp_path):
    df = _mk(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    T.create_table(spark, a, df, partition_by=["dom"])
    T.create_table(spark, b, df)
    for where in (
        None,
        [("dom", "=", "d2")],
        [("id", "<", 10)],
        [("dom", "in", ["d0", "d1"]), ("v", ">=", 30.0)],
    ):
        pa = sorted(map(tuple, T.read_table(spark, a, where=where)
                        .select("id", "dom", "day", "v").collect()))
        pb = sorted(map(tuple, T.read_table(spark, b, where=where)
                        .select("id", "dom", "day", "v").collect()))
        assert pa == pb and pa


def test_partition_value_types_and_escapes_roundtrip(spark, tmp_path):
    tbl = str(tmp_path / "t")
    rows = [
        (1, "a b", 7, datetime.date(2026, 2, 1)),
        (2, "x%y=z", -3, datetime.date(2026, 2, 2)),
        (3, "01", 0, datetime.date(2026, 2, 3)),  # leading zero survives
        (4, "a/b:c", 2**40, datetime.date(2026, 2, 4)),  # bigint value
    ]
    df = spark.createDataFrame(rows, "id int, s string, k bigint, day date")
    T.create_table(spark, tbl, df, partition_by=["s", "k", "day"])
    got = {
        r.id: (r.s, r.k, r.day)
        for r in T.read_table(spark, tbl).collect()
    }
    assert got == {i: (s, k, d) for i, s, k, d in rows}
    # declared types survive the round-trip (never inferred: '01' is a
    # STRING partition, not the int 1)
    sch = dict(T.read_table(spark, tbl).dtypes)
    assert sch["s"] == "string" and sch["k"] == "bigint" and sch["day"] == "date"
    one = T.read_table(spark, tbl, where=[("s", "=", "01")]).collect()
    assert [r.id for r in one] == [3]
    big = T.read_table(spark, tbl, where=[("k", "=", 2**40)]).collect()
    assert [r.id for r in big] == [4]


def test_null_partition_values(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id int, g string"
    )
    T.create_table(spark, tbl, df, partition_by=["g"])
    nul = T.read_table(spark, tbl, where=[("g", "is_null", None)])
    assert sorted(r.id for r in nul.collect()) == [2, 4]
    nn = T.read_table(spark, tbl, where=[("g", "is_not_null", None)])
    assert sorted(r.id for r in nn.collect()) == [1, 3]
    # null-partition files are PROVABLY excluded from an equality scan
    rep = T.scan_report(tbl, [("g", "=", "a")])
    assert rep["files_read"] < rep["files_live"]
    # and equality never matches the null partition row-level either
    assert [r.id for r in T.read_table(spark, tbl, where=[("g", "=", "a")]).collect()] == [1]


def test_mutation_lifecycle_preserves_layout(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark), partition_by=["dom"])
    spec = T._partition_spec(tbl)

    up = spark.createDataFrame(
        [(1, "d1", datetime.date(2026, 1, 2), 99.0),
         (999, "d0", datetime.date(2026, 1, 1), 5.0)],
        "id int, dom string, day date, v double",
    )
    T.upsert_rows(spark, tbl, up, keys=["id"])
    T.delete_rows(
        spark, tbl,
        spark.createDataFrame([(2,)], "id int"), keys=["id"],
    )
    T.delete_rows(
        spark, tbl,
        spark.createDataFrame([(5,)], "id int"), keys=["id"], mode="dv",
    )
    T.optimize(spark, tbl, target_bytes=1 << 30)
    T.purge_dvs(spark, tbl)

    # every live file still sits in a hive partition dir with a value
    # consistent with its rows
    state = T._snapshot_state(tbl)
    for f in state["files"]:
        assert "dom=" in f, f
    snap = T.read_table(spark, tbl)
    got = {r.id: (r.dom, r.v) for r in snap.collect()}
    assert got[1] == ("d1", 99.0) and got[999] == ("d0", 5.0)
    assert 2 not in got and 5 not in got
    # partition pruning still exact after the full lifecycle
    rep = T.scan_report(tbl, [("dom", "=", "d1")])
    assert rep["files_read"] < rep["files_live"]
    only = T.read_table(spark, tbl, where=[("dom", "=", "d1")])
    assert set(r.dom for r in only.collect()) == {"d1"}


def test_partition_key_delete_blast_radius(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark), partition_by=["dom"])
    state0 = T._snapshot_state(tbl)
    d1_files = {
        f for f in state0["files"]
        if T._parse_partition_values(f, T._partition_spec(tbl))["dom"] == "d1"
    }
    v = T.delete_rows(
        spark, tbl,
        spark.createDataFrame([("d1",)], "dom string"), keys=["dom"],
    )
    entry = [e for e in T._read_log(tbl) if e["version"] == v][0]
    # the CoW blast radius is EXACTLY the doomed partition
    assert set(entry["remove"]) == d1_files
    assert entry["add"] == []  # nothing survives the per-partition files
    assert T.read_table(spark, tbl).filter("dom = 'd1'").count() == 0
    assert T.read_table(spark, tbl).count() == 40


def test_dv_delete_with_partition_key(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark), partition_by=["dom"])
    T.delete_rows(
        spark, tbl,
        spark.createDataFrame([(7, "d1")], "id int, dom string"),
        keys=["id", "dom"], mode="dv",
    )
    snap = T.read_table(spark, tbl)
    assert snap.filter("id = 7").count() == 0
    assert snap.count() == 59
    # the vector covers a file in the right partition
    state = T._snapshot_state(tbl)
    dvf = [f for f, ps in state["dvs"].items() if ps]
    assert dvf and all("dom=d1" in f for f in dvf)


def test_change_feed_carries_partition_columns(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark, 12), partition_by=["dom"])
    T.append_rows(
        spark, tbl,
        spark.createDataFrame(
            [(100, "d7", datetime.date(2026, 3, 1), 1.0)],
            "id int, dom string, day date, v double",
        ),
    )
    T.delete_rows(
        spark, tbl,
        spark.createDataFrame([(3,)], "id int"), keys=["id"],
    )
    ch = T.read_changes(spark, tbl, 1)
    rows = {(r.id, r._change_type): r.dom for r in ch.collect()}
    assert rows[(100, "insert")] == "d7"
    assert rows[(3, "delete")] == "d0"


def test_restore_and_time_travel_partitioned(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark, 12), partition_by=["dom"])
    T.delete_rows(
        spark, tbl,
        spark.createDataFrame([("d0",)], "dom string"), keys=["dom"],
    )
    assert T.read_table(spark, tbl).count() == 8
    old = T.read_table(spark, tbl, version=0)
    assert old.count() == 12 and dict(old.dtypes)["dom"] == "string"
    T.restore(spark, tbl, 0)
    back = T.read_table(spark, tbl)
    assert back.count() == 12
    assert back.filter("dom = 'd0'").count() == 4


def test_vacuum_walks_partition_dirs(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark, 12), partition_by=["dom"])
    T.optimize(spark, tbl, target_bytes=1 << 30)
    removed = T.vacuum(spark, tbl)
    assert removed and all("dom=" in f for f in removed)
    # no orphaned empty partition dirs remain
    for dp, dns, fns in os.walk(os.path.join(tbl, "data")):
        assert fns or dns, dp
    assert T.read_table(spark, tbl).count() == 12


def test_checks_can_reference_partition_columns(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark, 12), partition_by=["dom"])
    T.add_check(spark, tbl, "dom_known", "dom IN ('d0','d1','d2')")
    bad = spark.createDataFrame(
        [(200, "evil", datetime.date(2026, 1, 1), 0.0)],
        "id int, dom string, day date, v double",
    )
    with pytest.raises(T.CheckViolation):
        T.append_rows(spark, tbl, bad)
    assert T.read_table(spark, tbl).count() == 12
    # the aborted write left no stray files behind
    state = T._snapshot_state(tbl)
    on_disk = {
        os.path.relpath(os.path.join(dp, f), tbl)
        for dp, _, fns in os.walk(os.path.join(tbl, "data"))
        for f in fns
        if f.endswith(".parquet")
    }
    assert on_disk == set(state["files"])


def test_create_rejects_bad_partition_specs(spark, tmp_path):
    df = _mk(spark, 6)
    with pytest.raises(ValueError, match="supported"):
        T.create_table(
            spark, str(tmp_path / "a"), df, partition_by=["v"]
        )  # double: no lossless dir form
    with pytest.raises(ValueError, match="not in the dataframe"):
        T.create_table(spark, str(tmp_path / "b"), df, partition_by=["nope"])
    with pytest.raises(ValueError, match="partition columns"):
        T.create_table(
            spark, str(tmp_path / "c"), df,
            partition_by=["dom"], bloom_cols=["dom"],
        )
    tbl = str(tmp_path / "d")
    T.create_table(spark, tbl, df, partition_by=["dom"])
    # the general evolution gate already rejects dropping a column; the
    # partition-specific write check backstops frames built outside it
    with pytest.raises(ValueError, match="schema mismatch"):
        T.append_rows(spark, tbl, df.drop("dom"))
    with pytest.raises(ValueError, match="missing its"):
        T._write_data(spark, tbl, df.drop("dom"), 99)


def test_partitioned_plus_bloom_and_zorder_compose(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = _mk(spark, 120)
    T.create_table(
        spark, tbl,
        df.repartitionByRange(4, "id"),
        partition_by=["dom"], bloom_cols=["id"],
    )
    # bloom on the data column still prunes within partitions
    rep = T.scan_report(tbl, [("dom", "=", "d1"), ("id", "=", 7)])
    assert rep["files_read"] <= 2
    got = T.read_table(
        spark, tbl, where=[("dom", "=", "d1"), ("id", "=", 7)]
    ).collect()
    assert [r.id for r in got] == [7]
    # zorder rewrite keeps the partition layout
    T.optimize(spark, tbl, target_bytes=1 << 30, zorder_by=["id", "v"])
    state = T._snapshot_state(tbl)
    assert all("dom=" in f for f in state["files"])
    rep2 = T.scan_report(tbl, [("dom", "=", "d1")])
    assert rep2["files_read"] < rep2["files_live"]
    assert T.read_table(spark, tbl).count() == 120


def test_repartition_table_adopts_layout(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = _mk(spark)
    T.create_table(spark, tbl, df.repartition(4))  # unpartitioned
    assert T._partition_spec(tbl) is None
    v = T.repartition_table(spark, tbl, ["dom"])
    # the rewrite is data-identical (CDF nets to zero rows per key)
    net = T.read_changes(spark, tbl, v, v)
    assert net.groupBy("id").agg(
        F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(-1))
        .alias("d")
    ).filter("d <> 0").count() == 0
    # new layout prunes; data intact
    rep = T.scan_report(tbl, [("dom", "=", "d1")])
    assert rep["files_read"] < rep["files_live"]
    got = sorted(map(tuple, T.read_table(spark, tbl)
                     .select("id", "dom", "v").collect()))
    exp = sorted((i, f"d{i % 3}", float(i)) for i in range(60))
    assert got == exp
    # time travel to the pre-evolution snapshot still reads correctly
    old = T.read_table(spark, tbl, version=0)
    assert sorted(r.dom for r in old.collect()) == sorted(
        f"d{i % 3}" for i in range(60)
    )


def test_repartition_evolution_keeps_old_hive_files_readable(
    spark, tmp_path
):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark), partition_by=["dom"])
    T.repartition_table(spark, tbl, ["day"])
    spec = T._partition_spec(tbl)
    assert spec["cols"] == ["day"]
    assert set(spec["types"]) == {"dom", "day"}  # append-only history
    # current reads: both columns correct (day from path, dom from data)
    got = {r.id: (r.dom, r.day) for r in T.read_table(spark, tbl).collect()}
    import datetime as dt
    assert got[7] == ("d1", dt.date(2026, 1, 4))
    # time travel to the dom-partitioned snapshot: dom attaches from
    # the OLD paths via the historical type record
    old = T.read_table(spark, tbl, version=0)
    assert {r.id: r.dom for r in old.collect()}[7] == "d1"
    # pruning works on the NEW layout
    rep = T.scan_report(tbl, [("day", "=", dt.date(2026, 1, 4))])
    assert rep["files_read"] < rep["files_live"]
    # and still on the old column, via the rewrite's footer stats
    # (dom is a data column in the new files)
    got_d1 = T.read_table(spark, tbl, where=[("dom", "=", "d1")])
    assert got_d1.count() == 20


def test_repartition_mixed_layout_mid_evolution_reads(spark, tmp_path):
    # simulate the crash window: spec written, rewrite not committed —
    # old unpartitioned files must still read correctly under the spec
    tbl = str(tmp_path / "t")
    df = _mk(spark, 12)
    T.create_table(spark, tbl, df.repartition(2))
    T._write_partition_spec(tbl, df, ["dom"])
    got = sorted(r.dom for r in T.read_table(spark, tbl).collect())
    assert got == sorted(f"d{i % 3}" for i in range(12))
    # appends under the new spec land hive-layout; both cohorts read
    T.append_rows(
        spark, tbl,
        spark.createDataFrame(
            [(100, "d9", None, 1.0)], "id int, dom string, day date, v double"
        ),
    )
    snap = {r.id: r.dom for r in T.read_table(spark, tbl).collect()}
    assert snap[100] == "d9" and snap[3] == "d0" and len(snap) == 13


def test_repartition_rejects_type_redeclaration(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", 5)], "id int, g string, k int")
    T.create_table(spark, tbl, df, partition_by=["g"])
    redecl = spark.createDataFrame([(1, 2, 5)], "id int, g int, k int")
    with pytest.raises(ValueError, match="previously recorded"):
        T._write_partition_spec(tbl, redecl, ["g"])


def test_zorder_on_partitioned_table_bounds_file_count(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = _mk(spark, 300)
    T.create_table(spark, tbl, df.repartition(8), partition_by=["dom"])
    n_before = len(T._snapshot_state(tbl)["files"])
    T.optimize(spark, tbl, target_bytes=1 << 30, zorder_by=["id", "v"])
    state = T._snapshot_state(tbl)
    # range keys = (dom, zkey) with n_out=1: one task per run => file
    # count ~ partition count, NOT n_out x partitions
    assert len(state["files"]) <= 4, sorted(state["files"])
    assert len(state["files"]) < n_before
    assert all("dom=" in f for f in state["files"])
    got = sorted(map(tuple, T.read_table(spark, tbl)
                     .select("id", "dom", "v").collect()))
    exp = sorted((i, f"d{i % 3}", float(i)) for i in range(300))
    assert got == exp


def test_exactly_once_sink_into_partitioned_table(spark, tmp_path):
    # the streaming sink composes with hive layout: idempotent appends
    # land partitioned, replays are no-ops, pruning works on the result
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark, 6), partition_by=["dom"])
    batch = _mk(spark, 12).filter("id >= 6")
    assert T.idempotent_append(spark, tbl, batch, "appA", 1) is not None
    assert T.idempotent_append(spark, tbl, batch, "appA", 1) is None  # replay
    assert T.read_table(spark, tbl).count() == 12
    rep = T.scan_report(tbl, [("dom", "=", "d1")])
    assert rep["files_read"] < rep["files_live"]


def test_table_detail_and_operation_metrics(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark, 30), partition_by=["dom"])
    T.add_check(spark, tbl, "v_nonneg", "v >= 0")
    T.delete_rows(
        spark, tbl,
        spark.createDataFrame([("d2",)], "dom string"), keys=["dom"],
    )
    T.delete_rows(
        spark, tbl,
        spark.createDataFrame([(0, "d0")], "id int, dom string"),
        keys=["id", "dom"], mode="dv",
    )
    det = T.table_detail(tbl)
    assert det["num_rows"] == 20  # physical rows; DV not subtracted
    assert det["partition_columns"] == ["dom"]
    assert det["num_deletion_vectors"] == 1
    assert det["checks"] == ["v_nonneg"]
    assert det["size_bytes"] > 0 and det["num_files"] > 0
    mets = {m["version"]: m for m in T.operation_metrics(tbl)}
    assert mets[0]["op"] == "create" and mets[0]["rows_added"] == 30
    assert mets[1]["op"] == "delete" and mets[1]["rows_removed"] == 10
    assert mets[1]["rows_added"] == 0 and mets[1]["num_files_added"] == 0
    assert mets[2]["num_deletion_vectors_added"] == 1
    # time-travel detail sees the pre-delete state
    assert T.table_detail(tbl, version=0)["num_rows"] == 30


def test_exclusion_predicates_prune_partitions(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark), partition_by=["dom"])
    state = T._snapshot_state(tbl)
    spec = T._partition_spec(tbl)
    d1 = {f for f in state["files"]
          if T._parse_partition_values(f, spec)["dom"] == "d1"}
    # "everything except d1" skips exactly d1's files
    rep = T.scan_report(tbl, [("dom", "!=", "d1")])
    assert rep["files_skipped"] == len(d1)
    got = T.read_table(spark, tbl, where=[("dom", "!=", "d1")])
    assert sorted(r.id for r in got.collect()) == sorted(
        i for i in range(60) if i % 3 != 1
    )
    rep2 = T.scan_report(tbl, [("dom", "not_in", ["d0", "d1"])])
    assert rep2["files_read"] == rep2["files_live"] - rep2["files_skipped"]
    got2 = T.read_table(spark, tbl, where=[("dom", "not_in", ["d0", "d1"])])
    assert {r.dom for r in got2.collect()} == {"d2"}
    # null-partition rows never satisfy an exclusion (SQL 3VL), and the
    # null partition's files are prunable too (single-valued... all-null)
    T.append_rows(
        spark, tbl,
        spark.createDataFrame(
            [(100, None, None, 0.0)], "id int, dom string, day date, v double"
        ),
    )
    got3 = T.read_table(spark, tbl, where=[("dom", "!=", "d1")])
    assert 100 not in {r.id for r in got3.collect()}


def test_exclusion_predicates_never_prune_wrong_on_data_stats(
    spark, tmp_path
):
    tbl = str(tmp_path / "t")
    # multi-valued files: != must not prune them even when the excluded
    # value sits inside [min, max]
    df = spark.createDataFrame(
        [(i, f"g{i % 4}", float(i)) for i in range(40)],
        "id int, g string, v double",
    )
    T.create_table(spark, tbl, df.coalesce(2))
    got = T.read_table(spark, tbl, where=[("g", "!=", "g2")])
    assert sorted(r.id for r in got.collect()) == sorted(
        i for i in range(40) if i % 4 != 2
    )
    rep = T.scan_report(tbl, [("g", "!=", "g2")])
    assert rep["files_skipped"] == 0  # no file is single-valued
    # float stats never prove an exclusion empty (hidden NaN satisfies
    # any !=): the constant-v file below still reads
    dfv = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id int, v double")
    tbl2 = str(tmp_path / "f")
    T.create_table(spark, tbl2, dfv.coalesce(1))
    rep2 = T.scan_report(tbl2, [("v", "!=", 5.0)])
    assert rep2["files_skipped"] == 0
    # but an int single-valued file prunes
    dfi = spark.createDataFrame([(1, 5), (2, 5)], "id int, k int")
    tbl3 = str(tmp_path / "i")
    T.create_table(spark, tbl3, dfi.coalesce(1))
    rep3 = T.scan_report(tbl3, [("k", "!=", 5)])
    assert rep3["files_skipped"] == 1
    assert T.read_table(spark, tbl3, where=[("k", "!=", 5)]).count() == 0


def test_optimize_where_scopes_to_partition(spark, tmp_path):
    tbl = str(tmp_path / "t")
    T.create_table(spark, tbl, _mk(spark, 90), partition_by=["dom"])
    spec = T._partition_spec(tbl)
    state0 = T._snapshot_state(tbl)
    d1 = {f for f in state0["files"]
          if T._parse_partition_values(f, spec)["dom"] == "d1"}
    others = set(state0["files"]) - d1
    v = T.optimize(
        spark, tbl, target_bytes=1 << 30, where=[("dom", "=", "d1")]
    )
    entry = [e for e in T._read_log(tbl) if e["version"] == v][0]
    # only d1's files were rewritten; cold partitions untouched
    assert set(entry["remove"]) == d1
    state1 = T._snapshot_state(tbl)
    assert others <= set(state1["files"])
    assert all("dom=d1" in f for f in entry["add"])
    assert len(entry["add"]) < len(d1)  # actually compacted
    # data identical, feed nets to zero
    assert T.read_changes(spark, tbl, v, v).count() == 0
    assert T.read_table(spark, tbl).count() == 90
    # scoped zorder: re-cluster one partition only
    v2 = T.optimize(
        spark, tbl, target_bytes=1 << 30, zorder_by=["id", "v"],
        where=[("dom", "=", "d2")],
    )
    e2 = [e for e in T._read_log(tbl) if e["version"] == v2][0]
    assert all("dom=d2" in f for f in e2["remove"])
    assert T.read_table(spark, tbl).count() == 90

"""Transaction-log stats, data skipping, OPTIMIZE ZORDER, checkpoints.

Round-10 lakehouse legs (public designs: Delta stats/ZORDER/checkpoints,
Armbrust et al. VLDB 2020; Iceberg manifests). The contract under test:
pruning is ONLY an optimization — every ``where=`` read must equal the
unpruned read filtered, file-for-file layout notwithstanding — while
the metadata actually shrinks the opened-file set on selective
predicates and the checkpointed replay resolves the same snapshot as
the full log walk.
"""

import json
import os

from pyspark.sql import functions as F

from newsify_spark.operators import txnlog as T


def _frame(spark, n=1000, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.concat(F.lit("s"), F.format_string("%06d", F.col("id"))).alias("s"),
    )


def _ranged_table(spark, path, n=4000, files=8):
    """A table whose files are key-ranged — the layout stats pruning
    thrives on (each file owns one k interval)."""
    T.create_table(
        spark, path, _frame(spark, n).repartitionByRange(files, "k")
    )


def test_commit_records_footer_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    _ranged_table(spark, path, n=1000, files=4)
    entry = T.history(path)[-1]
    stats = entry["stats"]
    assert set(stats) == set(entry["add"]) and len(stats) == 4
    # per-file mins/maxs tile the full key range with no overlap gaps
    spans = sorted(
        (s["min"]["k"], s["max"]["k"], s["rows"]) for s in stats.values()
    )
    assert spans[0][0] == 0 and spans[-1][1] == 999
    assert sum(r for _, _, r in spans) == 1000
    for (_, hi_prev, _), (lo, _, _) in zip(spans, spans[1:]):
        assert lo > hi_prev
    # string column indexed too; null counts present
    any_s = next(iter(stats.values()))
    assert any_s["min"]["s"].startswith("s") and any_s["nulls"]["k"] == 0


def test_pruned_read_equals_filtered_full_read(spark, tmp_path):
    path = str(tmp_path / "t")
    _ranged_table(spark, path)
    where = [("k", "between", (500, 900)), ("v", ">=", 0)]
    pruned = T.read_table(spark, path, where=where)
    full = T.read_table(spark, path).filter(
        F.col("k").between(500, 900) & (F.col("v") >= 0)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )
    rep = T.scan_report(path, where)
    assert rep["files_live"] == 8
    # 401 of 4000 keys ~ 1-2 of 8 range files
    assert rep["files_read"] <= 3 and rep["files_skipped"] >= 5


def test_string_and_equality_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    _ranged_table(spark, path)
    # point lookup: exactly one range file can hold k=1234
    rep = T.scan_report(path, [("k", "=", 1234)])
    assert rep["files_read"] == 1
    got = T.read_table(spark, path, where=[("k", "=", 1234)]).collect()
    assert len(got) == 1 and got[0]["k"] == 1234
    # string predicates prune on footer string stats (k-ordered => s-ordered)
    rep_s = T.scan_report(path, [("s", "<=", "s000100")])
    assert rep_s["files_read"] == 1
    assert (
        T.read_table(spark, path, where=[("s", "<=", "s000100")]).count()
        == 101
    )


def test_predicate_matching_nothing_returns_empty_with_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    _ranged_table(spark, path, n=100, files=2)
    out = T.read_table(spark, path, where=[("k", ">", 10_000_000)])
    assert out.count() == 0
    assert out.columns == ["k", "v", "s"]


def test_files_without_stats_are_read_not_skipped(spark, tmp_path):
    """Commits that predate stats (or lost them) must make pruning
    conservative, never wrong: strip one commit's stats from the log and
    the pruned read still returns every matching row."""
    path = str(tmp_path / "t")
    _ranged_table(spark, path, n=1000, files=4)
    log = os.path.join(path, "_txnlog", "0.json")
    entry = json.load(open(log))
    del entry["stats"]
    os.unlink(log)
    json.dump(entry, open(log, "w"))
    where = [("k", "between", (0, 9))]
    assert T.read_table(spark, path, where=where).count() == 10
    rep = T.scan_report(path, where)
    assert rep["files_read"] == rep["files_live"] == 4  # nothing skippable


def test_all_null_files_prune_on_null_count(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _frame(spark, 100).coalesce(1))
    nulls = spark.range(5).select(
        F.lit(None).cast("long").alias("k"),
        F.lit(None).cast("long").alias("v"),
        F.lit("x").alias("s"),
    )
    T.append_rows(spark, path, nulls.coalesce(1))
    # the all-null-k file cannot satisfy ANY comparison on k
    rep = T.scan_report(path, [("k", ">=", 0)])
    assert rep["files_live"] == 2 and rep["files_read"] == 1
    assert T.read_table(spark, path, where=[("k", ">=", 0)]).count() == 100


def test_zorder_optimize_clusters_both_columns(spark, tmp_path):
    """Adversarial start: files ordered by a THIRD column, so every file
    spans the full range of both z-columns and nothing prunes. After
    OPTIMIZE ZORDER(a, b): snapshot data identical, the optimize
    commit's CDF nets to zero, time travel intact, and point-ish
    predicates on EITHER column now skip most files."""
    path = str(tmp_path / "t")
    n = 20_000
    df = spark.range(n).select(
        (F.xxhash64(F.col("id"), F.lit(1)) % 1000).alias("a"),
        (F.xxhash64(F.col("id"), F.lit(2)) % 1000).alias("b"),
        F.col("id").alias("noise"),
    )
    T.create_table(spark, path, df.repartitionByRange(8, "noise"))
    before = T.read_table(spark, path)
    before_rows = sorted(map(tuple, before.collect()))
    where_a = [("a", "between", (0, 120))]
    where_b = [("b", "between", (0, 120))]
    assert T.scan_report(path, where_a)["files_skipped"] == 0
    assert T.scan_report(path, where_b)["files_skipped"] == 0

    v = T.optimize(spark, path, target_bytes=40_000, zorder_by=["a", "b"])
    assert v == 1
    after = T.read_table(spark, path)
    assert sorted(map(tuple, after.collect())) == before_rows
    assert T.read_changes(spark, path, v, v).count() == 0
    assert (
        sorted(map(tuple, T.read_table(spark, path, version=0).collect()))
        == before_rows
    )
    rep_a = T.scan_report(path, where_a)
    rep_b = T.scan_report(path, where_b)
    if not (rep_a["files_skipped"] and rep_b["files_skipped"]):
        # repartitionByRange samples its boundaries with a fresh seed
        # per execution; a pathological sample can leave one window
        # unpruned (observed ~once across hundreds of suite runs).
        # Z-order is best-effort clustering — one re-cluster restores
        # selectivity, which is also the operational answer.
        T.optimize(spark, path, target_bytes=40_000, zorder_by=["a", "b"])
        rep_a = T.scan_report(path, where_a)
        rep_b = T.scan_report(path, where_b)
    assert rep_a["files_live"] >= 4
    assert rep_a["files_skipped"] > 0 and rep_b["files_skipped"] > 0
    # and the pruned reads stay exact
    for where, col in ((where_a, "a"), (where_b, "b")):
        got = T.read_table(spark, path, where=where)
        want = [r for r in before_rows if 0 <= r[0 if col == "a" else 1] <= 120]
        assert sorted(map(tuple, got.collect())) == sorted(want)


def test_zorder_date_string_clusters_both_columns(spark, tmp_path):
    """Delta's OPTIMIZE ZORDER surface covers any orderable column; the
    common real-world key is (date, string) — e.g. (ship_date, region)
    (VERDICT r10 #5). Adversarial start (files ranged on a third
    column), then ZORDER(d, s): values identical, CDF nets to zero, and
    selective predicates on EITHER the date or the string column skip
    files."""
    path = str(tmp_path / "t")
    n = 20_000
    df = spark.range(n).select(
        F.date_add(
            F.lit("2024-01-01"), (F.xxhash64("id", F.lit(1)) % 365).cast("int")
        ).alias("d"),
        F.concat(
            F.lit("reg"),
            F.format_string("%03d", F.abs(F.xxhash64("id", F.lit(2)) % 200)),
        ).alias("s"),
        F.col("id").alias("noise"),
    )
    T.create_table(spark, path, df.repartitionByRange(8, "noise"))
    before_rows = sorted(map(tuple, T.read_table(spark, path).collect()))
    where_d = [("d", "between", (__import__("datetime").date(2024, 1, 1),
                                 __import__("datetime").date(2024, 2, 15)))]
    where_s = [("s", "<=", "reg025")]
    assert T.scan_report(path, where_d)["files_skipped"] == 0
    assert T.scan_report(path, where_s)["files_skipped"] == 0

    v = T.optimize(spark, path, target_bytes=40_000, zorder_by=["d", "s"])
    assert v == 1
    assert sorted(map(tuple, T.read_table(spark, path).collect())) == before_rows
    assert T.read_changes(spark, path, v, v).count() == 0
    rep_d = T.scan_report(path, where_d)
    rep_s = T.scan_report(path, where_s)
    if not (rep_d["files_skipped"] and rep_s["files_skipped"]):
        # same unlucky-boundary-sample guard as the numeric z-order pin
        T.optimize(spark, path, target_bytes=40_000, zorder_by=["d", "s"])
        rep_d = T.scan_report(path, where_d)
        rep_s = T.scan_report(path, where_s)
    assert rep_d["files_live"] >= 4
    assert rep_d["files_skipped"] > 0 and rep_s["files_skipped"] > 0
    # pruned reads stay exact
    import datetime

    got_d = sorted(map(tuple, T.read_table(spark, path, where=where_d).collect()))
    want_d = sorted(
        r for r in before_rows
        if datetime.date(2024, 1, 1) <= r[0] <= datetime.date(2024, 2, 15)
    )
    assert got_d == want_d
    got_s = sorted(map(tuple, T.read_table(spark, path, where=where_s).collect()))
    assert got_s == sorted(r for r in before_rows if r[1] <= "reg025")


def test_zorder_rejects_unorderable_types(spark, tmp_path):
    import pytest

    path = str(tmp_path / "t")
    T.create_table(
        spark,
        path,
        spark.range(10).select("id", F.array(F.col("id")).alias("arr")),
    )
    with pytest.raises(ValueError, match="zorder_by"):
        T.optimize(spark, path, zorder_by=["arr"])


def test_checkpoint_written_and_replay_equivalent(spark, tmp_path):
    """12 commits => a 10.checkpoint.json exists; snapshot state resolved
    THROUGH the checkpoint (live files, columns, stats) must equal the
    raw full-log replay, and reads at/around the checkpoint version
    time-travel correctly."""
    path = str(tmp_path / "t")
    T.create_table(spark, path, _frame(spark, 50).coalesce(1))
    for i in range(1, 12):
        T.append_rows(
            spark, path, _frame(spark, 10, offset=1000 * i).coalesce(1)
        )
    assert 10 in T._checkpoints(path)
    ck = json.load(open(T._checkpoint_path(path, 10)))
    assert ck["version"] == 10 and ck["columns"] == ["k", "v", "s"]

    # raw replay (checkpoint-blind) == checkpointed state, stats included
    raw_files: dict = {}
    for e in T._read_log(path):
        for f in e["remove"]:
            raw_files.pop(f, None)
        for f in e["add"]:
            raw_files[f] = (e.get("stats") or {}).get(f)
    state = T._snapshot_state(path)
    assert state["files"] == raw_files
    assert T.read_table(spark, path).count() == 50 + 11 * 10
    assert T.read_table(spark, path, version=10).count() == 50 + 10 * 10
    assert T.read_table(spark, path, version=9).count() == 50 + 9 * 10
    # pruning still works through the checkpointed state
    rep = T.scan_report(path, [("k", ">=", 11_000)])
    assert rep["files_read"] == 1


def test_checkpoint_survives_mutations_and_occ(spark, tmp_path):
    """Upserts/deletes past a checkpoint keep resolving correctly, and
    the checkpoint file itself never participates in the version CAS."""
    path = str(tmp_path / "t")
    T.create_table(
        spark, path, _frame(spark, 200).repartitionByRange(4, "k")
    )
    for i in range(1, 11):
        T.append_rows(
            spark, path, _frame(spark, 5, offset=10_000 * i).coalesce(1)
        )
    assert 10 in T._checkpoints(path)
    up = spark.createDataFrame(
        [(0, 999_999, "patched")], "k long, v long, s string"
    )
    T.upsert_rows(spark, path, up, ["k"])
    T.delete_rows(
        spark,
        path,
        spark.createDataFrame([(1,)], "k long"),
        ["k"],
    )
    got = {r["k"]: r for r in T.read_table(spark, path).collect()}
    assert got[0]["s"] == "patched" and 1 not in got
    assert len(got) == 200 + 50 - 1


def test_blast_radius_candidates_pruned_by_stats(spark, tmp_path):
    """A point upsert's victim SEARCH reads ~1 file of a range-clustered
    table, not all of them: the stats envelope rules the rest out before
    the containment semi-join. Stripping stats falls back to scanning
    every live file with an identical final result."""
    path = str(tmp_path / "t")
    _ranged_table(spark, path)  # 8 key-ranged files
    keys = spark.createDataFrame([(1234,)], "k long")
    state = T._snapshot_state(path)
    assert len(T._candidate_files(state, keys, ["k"])) == 1
    # a spread key set keeps only the overlapping range files
    spread = spark.createDataFrame([(10,), (3990,)], "k long")
    n_spread = len(T._candidate_files(state, spread, ["k"]))
    assert n_spread == 8  # envelope [10, 3990] spans everything — honest cap
    # end-to-end: the upsert rewrites exactly the one containing file
    up = spark.createDataFrame([(1234, -1, "patched")], "k long, v long, s string")
    T.upsert_rows(spark, path, up, ["k"])
    entry = T.history(path)[-1]
    assert entry["op"] == "upsert" and len(entry["remove"]) == 1
    got = {
        r["k"]: r["s"]
        for r in T.read_table(
            spark, path, where=[("k", "between", (1233, 1235))]
        ).collect()
    }
    assert got[1234] == "patched" and got[1233] == "s001233"


def test_blast_radius_stats_stripped_falls_back(spark, tmp_path):
    path = str(tmp_path / "t")
    _ranged_table(spark, path, n=400, files=4)
    log = os.path.join(path, "_txnlog", "0.json")
    entry = json.load(open(log))
    del entry["stats"]
    os.unlink(log)
    json.dump(entry, open(log, "w"))
    keys = spark.createDataFrame([(7,)], "k long")
    state = T._snapshot_state(path)
    assert len(T._candidate_files(state, keys, ["k"])) == 4  # no pruning
    T.delete_rows(spark, path, keys, ["k"])
    assert T.read_table(spark, path).count() == 399
    # only the file that actually held k=7 was rewritten
    assert len(T.history(path)[-1]["remove"]) == 1


def test_null_keys_never_match_and_never_break_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    _ranged_table(spark, path, n=100, files=2)
    keys = spark.createDataFrame(
        [(None,), (5,)], "k long"
    )
    T.delete_rows(spark, path, keys, ["k"])
    assert T.read_table(spark, path).count() == 99  # only k=5 deleted


def test_vacuum_retention_window(spark, tmp_path):
    """retain_versions=2 keeps the last two snapshots time-travelable;
    files only the older history referenced are reclaimed."""
    path = str(tmp_path / "t")
    _ranged_table(spark, path, n=400, files=4)  # v0
    up = spark.createDataFrame([(0, -1, "x")], "k long, v long, s string")
    T.upsert_rows(spark, path, up, ["k"])  # v1 rewrites 1 file
    T.optimize(spark, path, target_bytes=1 << 30, min_files=2)  # v2 compacts
    v0_only = set(T._live_files(path, 0)) - set(T._live_files(path, 1)) - set(
        T._live_files(path, 2)
    )
    assert v0_only  # the upsert victim
    removed = set(T.vacuum(spark, path, retain_versions=2))
    assert removed == v0_only
    assert T.read_table(spark, path).count() == 400
    assert T.read_table(spark, path, version=1).count() == 400
    # v0 is no longer readable: its file set is gone from disk
    import pytest as _pytest

    with _pytest.raises(Exception):
        T.read_table(spark, path, version=0).count()


def test_checkpoint_carries_txn_high_water(spark, tmp_path):
    """The exactly-once marker resolves through the checkpoint's txn map
    plus the log tail — same answers as a full-log replay, and a
    replayed batch id from before the checkpoint still no-ops."""
    path = str(tmp_path / "t")
    T.create_table(spark, path, _frame(spark, 20).coalesce(1))
    for b in range(12):
        T.idempotent_append(
            spark, path, _frame(spark, 5, offset=1000 * (b + 1)).coalesce(1),
            "appA", b,
        )
    T.idempotent_append(
        spark, path, _frame(spark, 5, offset=90_000).coalesce(1), "appB", 3
    )
    ck = json.load(open(T._checkpoint_path(path, 10)))
    assert ck["txn"]["appA"] == 9  # batches 0..9 landed by version 10
    assert T.last_committed_batch(path, "appA") == 11
    assert T.last_committed_batch(path, "appB") == 3
    assert T.last_committed_batch(path, "missing") is None
    # checkpointed answer == raw full replay
    raw = {}
    for e in T._read_log(path):
        t = e.get("txn")
        if t:
            raw[t["app_id"]] = max(raw.get(t["app_id"], -1), t["batch_id"])
    assert raw == T._txn_high_water(path)
    # a replay of a pre-checkpoint batch id is still a no-op
    n_before = T.read_table(spark, path).count()
    assert (
        T.idempotent_append(
            spark, path, _frame(spark, 5, offset=1000).coalesce(1), "appA", 1
        )
        is None
    )
    assert T.read_table(spark, path).count() == n_before


# --- ADVICE r10 soundness fixes -------------------------------------------


def test_date_literal_on_timestamp_column_never_pruned_wrong(spark, tmp_path):
    """A date literal on a timestamp column: Spark coerces the date to
    midnight (rows match) while the pre-fix lexicographic interval test
    compared '2024-03-05T00:00:00' <= '2024-03-05' (False) and pruned
    the file — silently dropping matching rows (ADVICE r10 #1)."""
    import datetime

    path = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.to_timestamp(
            F.date_add(F.lit("2024-03-05"), F.col("id").cast("int"))
        ).alias("ts"),
    )
    T.create_table(spark, path, df.repartitionByRange(5, "ts"))
    lit = datetime.date(2024, 3, 5)
    got = T.read_table(spark, path, where=[("ts", "<=", lit)])
    want = T.read_table(spark, path).filter(F.col("ts") <= F.lit(lit))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() == 1  # exactly the midnight row
    # the reverse shape too: timestamp literal against a DATE column
    df2 = spark.range(10).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("2024-03-05"), F.col("id").cast("int")).alias("d"),
    )
    path2 = str(tmp_path / "t2")
    T.create_table(spark, path2, df2.repartitionByRange(5, "d"))
    ts_lit = datetime.datetime(2024, 3, 6, 12, 0, 0)
    got2 = T.read_table(spark, path2, where=[("d", "<", ts_lit)])
    want2 = T.read_table(spark, path2).filter(F.col("d") < F.lit(ts_lit))
    assert sorted(map(tuple, got2.collect())) == sorted(
        map(tuple, want2.collect())
    )
    # date < timestamp'...12:00' => dates 03-05 and 03-06 both match
    assert got2.count() == 2


def test_nan_rows_survive_gt_pruning(spark, tmp_path):
    """Spark orders NaN above every double, so v > x matches NaN rows for
    any x; footer min/max may exclude NaN, so the '>' direction must
    never prune float stats (ADVICE r10 #2)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, float("nan"))], ["k", "v"]
    )
    T.create_table(spark, path, df.coalesce(1))
    got = T.read_table(spark, path, where=[("v", ">", 5.0)])
    assert got.count() == 1  # the NaN row
    assert [r.k for r in got.collect()] == [2]
    # NaN literals never prune either ('<' with NaN lit matches non-NaN rows)
    got_lt = T.read_table(spark, path, where=[("v", "<", float("nan"))])
    assert got_lt.count() == 2
    # '<' with a finite literal may still prune soundly: NaN fails v < x
    assert T.read_table(spark, path, where=[("v", "<", 1.5)]).count() == 1


def test_optimize_on_empty_log_returns_none(spark, tmp_path):
    assert T.optimize(spark, str(tmp_path / "missing")) is None
    assert (
        T.optimize(spark, str(tmp_path / "missing2"), zorder_by=["x"]) is None
    )


def test_all_pruned_read_keeps_evolved_column_types(spark, tmp_path):
    """When every file is pruned, the empty result's schema must carry
    columns added by later additive evolution with their REAL types —
    sampling only the first file regressed them to NullType, breaking
    downstream unions (ADVICE r10 #4)."""
    path = str(tmp_path / "t")
    T.create_table(
        spark, path, spark.range(10).select(F.col("id").alias("k")).coalesce(1)
    )
    T.append_rows(
        spark,
        path,
        spark.range(10, 20).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("w")
        ).coalesce(1),
    )
    empty = T.read_table(spark, path, where=[("k", ">", 10_000)])
    assert empty.count() == 0
    full = T.read_table(spark, path)
    assert dict(empty.dtypes) == dict(full.dtypes)
    # the schema must be union-compatible with the non-empty read
    assert full.unionByName(empty).count() == full.count()


# --- per-file bloom stats for `=` predicates (r11) -------------------------


def test_spark_crc32_matches_zlib(spark):
    """The bloom build hashes executor-side with F.crc32 and probes
    driver-side with zlib.crc32 — a disagreement would be a false
    negative, i.e. a wrongly pruned file. Pin bit-for-bit parity over
    representative key shapes (the int path goes through cast-to-string
    on both sides)."""
    import zlib

    vals = ["", "a", "hello world", "käse", "123", "-9007199254740993", "x" * 300]
    got = (
        spark.createDataFrame([(v,) for v in vals], "s string")
        .select("s", F.crc32(F.encode("s", "utf-8")).alias("c"))
        .collect()
    )
    for r in got:
        assert r.c == zlib.crc32(r.s.encode("utf-8")), r.s


def _uuidish_table(spark, path, n=8000, files=32, bloom=True):
    """Hash-ordered string keys: every file spans the whole key domain,
    so min/max intervals never prune a point lookup."""
    df = spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("key"),
        (F.col("id") % 1000).alias("v"),
    )
    T.create_table(
        spark, path, df.repartition(files),
        bloom_cols=["key"] if bloom else None,
    )
    return df


def test_bloom_point_lookup_opens_few_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _uuidish_table(spark, path, n=8000, files=32)
    probe = T.read_table(spark, path).limit(1).first()
    rep = T.scan_report(path, [("key", "=", probe.key)])
    assert rep["files_live"] == 32
    # the key lives in 1 file; ~1% fpp adds at most a file or two
    assert rep["files_read"] <= 4, rep
    got = T.read_table(spark, path, where=[("key", "=", probe.key)]).collect()
    assert len(got) == 1 and got[0].v == probe.v
    # absent key: usually 0 files, never a wrong row
    rep0 = T.scan_report(path, [("key", "=", "definitely-not-a-key")])
    assert rep0["files_read"] <= 2
    assert (
        T.read_table(spark, path, where=[("key", "=", "no-such")]).count() == 0
    )
    # without blooms the same layout reads (nearly) everything — hash
    # order leaves every file's min/max interval spanning ~the domain
    path2 = str(tmp_path / "t2")
    _uuidish_table(spark, path2, n=8000, files=32, bloom=False)
    k2 = T.read_table(spark, path2).limit(1).first().key
    assert T.scan_report(path2, [("key", "=", k2)])["files_read"] >= 24


def test_bloom_never_false_negative_and_survives_mutations(spark, tmp_path):
    """The correctness contract: a bloom-pruned `=` read equals the
    full read filtered, for EVERY live key — across append, COW upsert
    and OPTIMIZE (all of which write new files whose blooms come from
    the table-property config, no parameter threading)."""
    path = str(tmp_path / "t")
    base = spark.range(500).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("s"),
    )
    T.create_table(spark, path, base.repartition(8), bloom_cols=["k", "s"])
    T.append_rows(
        spark,
        path,
        spark.range(500, 700).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("s")
        ).repartition(4),
    )
    T.upsert_rows(
        spark,
        path,
        spark.createDataFrame([(3, "updated")], "k long, s string"),
        ["k"],
    )
    T.optimize(spark, path, target_bytes=1 << 20)
    full = {r.k: r.s for r in T.read_table(spark, path).collect()}
    assert len(full) == 700 and full[3] == "updated"
    import random

    rng = random.Random(7)
    for k in rng.sample(sorted(full), 40):
        got = T.read_table(spark, path, where=[("k", "=", int(k))]).collect()
        assert [(r.k, r.s) for r in got] == [(k, full[k])], k
        got_s = T.read_table(spark, path, where=[("s", "=", full[k])]).collect()
        assert [(r.k, r.s) for r in got_s] == [(k, full[k])], k
    # commit entries actually carry the bitmaps for both columns
    entry = T.history(path)[-1]
    some = next(s for s in entry["stats"].values() if s)
    assert set(some["bloom"]) == {"k", "s"}
    assert some["bloom"]["k"]["words"], "empty bitmap"


def test_bloom_rejects_unhashable_column_types(spark, tmp_path):
    import pytest

    path = str(tmp_path / "t")
    df = spark.range(5).select("id", (F.col("id") * 1.5).alias("f"))
    with pytest.raises(ValueError, match="bloom_cols"):
        T.create_table(spark, path, df, bloom_cols=["f"])


def test_bloom_stats_survive_checkpoint_replay(spark, tmp_path):
    """Checkpoints carry each live file's stats verbatim — including
    bloom bitmaps — so a reader resolving its snapshot from the
    checkpoint (12 commits => 10.checkpoint.json) prunes point lookups
    exactly like a raw-log replay."""
    path = str(tmp_path / "t")
    df0 = spark.range(400).select(
        F.md5(F.col("id").cast("string")).alias("key"),
        F.col("id").alias("v"),
    )
    T.create_table(spark, path, df0.repartition(4), bloom_cols=["key"])
    for i in range(1, 13):
        T.append_rows(
            spark,
            path,
            spark.range(400 + 50 * i, 400 + 50 * (i + 1)).select(
                F.md5(F.col("id").cast("string")).alias("key"),
                F.col("id").alias("v"),
            ).coalesce(1),
        )
    assert os.path.exists(T._checkpoint_path(path, 10))
    # a key from the pre-checkpoint era and one from the tail
    probe_old = T.read_table(spark, path, where=[("v", "=", 3)]).first().key
    rep = T.scan_report(path, [("key", "=", probe_old)])
    assert rep["files_live"] >= 16
    assert rep["files_read"] <= 4, rep
    got = T.read_table(spark, path, where=[("key", "=", probe_old)]).collect()
    assert len(got) == 1 and got[0].v == 3
    probe_new = T.read_table(spark, path, where=[("v", "=", 970)]).first().key
    got2 = T.read_table(spark, path, where=[("key", "=", probe_new)]).collect()
    assert len(got2) == 1 and got2[0].v == 970
    assert T.scan_report(path, [("key", "=", probe_new)])["files_read"] <= 4


def test_legacy_bare_date_stats_never_pruned_wrong(spark, tmp_path):
    """Tables written BEFORE the r11 midnight-normalization persist
    bare 'YYYY-MM-DD' date stats in their commit entries; the literal
    side now always encodes midnight-ISO, and comparing the two
    lexicographically prunes a file whose max date IS the queried day
    ('2024-03-09T00:00:00' > '2024-03-09') — silently dropping rows
    (ADVICE r11 #1). The guard declines to prune that pairing."""
    import datetime

    path = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("2024-03-05"), F.col("id").cast("int")).alias("d"),
    )
    T.create_table(spark, path, df.repartitionByRange(5, "d"))
    # simulate the legacy on-disk format: strip stats back to bare dates
    log = T._log_path(path)
    for fn in os.listdir(log):
        if not fn.endswith(".json"):
            continue
        p = os.path.join(log, fn)
        with open(p) as fh:
            e = json.load(fh)
        for s in (e.get("stats") or {}).values():
            for side in ("min", "max"):
                for c, v in list((s or {}).get(side, {}).items()):
                    if isinstance(v, str) and "T" in v:
                        s[side][c] = v.split("T")[0]
        with open(p, "w") as fh:
            json.dump(e, fh)
    lit = datetime.date(2024, 3, 9)
    for op, want in (("=", 1), (">=", 6), ("<=", 5)):
        got = T.read_table(spark, path, where=[("d", op, lit)])
        full = T.read_table(spark, path)
        want_df = {
            "=": full.filter(F.col("d") == F.lit(lit)),
            ">=": full.filter(F.col("d") >= F.lit(lit)),
            "<=": full.filter(F.col("d") <= F.lit(lit)),
        }[op]
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want_df.collect())
        ), op
        assert got.count() == want, op
    # genuine string columns are untouched by the guard: bare-date
    # strings vs a bare-date string literal still prune
    path2 = str(tmp_path / "t2")
    df2 = spark.range(10).select(
        F.col("id").alias("k"),
        F.date_format(
            F.date_add(F.lit("2024-03-05"), F.col("id").cast("int")),
            "yyyy-MM-dd",
        ).alias("s"),
    )
    T.create_table(spark, path2, df2.repartitionByRange(5, "s"))
    rep = T.scan_report(path2, [("s", "=", "2024-03-09")])
    assert rep["files_read"] == 1


def test_in_list_pruning_unions_per_key_files(spark, tmp_path):
    """`in` = the batched point-lookup shape (VERDICT r11 #7): the kept
    file set must be exactly the union of the per-key prunes — bloom
    bitmaps included — and the read must equal the unpruned read
    filtered by isin()."""
    path = str(tmp_path / "t")
    _uuidish_table(spark, path, n=8000, files=32)
    probes = [r.key for r in T.read_table(spark, path).limit(3).collect()]
    per_key = sum(
        T.scan_report(path, [("key", "=", k)])["files_read"] for k in probes
    )
    rep = T.scan_report(path, [("key", "in", probes)])
    assert rep["files_live"] == 32
    assert rep["files_read"] <= per_key, (rep, per_key)
    assert rep["files_read"] <= 12  # 3 keys x <=4 files each
    got = T.read_table(spark, path, where=[("key", "in", probes)])
    want = T.read_table(spark, path).filter(F.col("key").isin(probes))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() == 3
    # ranged layout: interval pruning drives the union instead of blooms
    path2 = str(tmp_path / "t2")
    _ranged_table(spark, path2)
    rep2 = T.scan_report(path2, [("k", "in", (5, 3995))])
    assert rep2["files_read"] == 2
    got2 = T.read_table(spark, path2, where=[("k", "in", (5, 3995))])
    assert sorted(r.k for r in got2.collect()) == [5, 3995]
    # empty in-list: everything pruned, empty result with schema intact
    rep3 = T.scan_report(path2, [("k", "in", ())])
    assert rep3["files_read"] == 0
    empty = T.read_table(spark, path2, where=[("k", "in", ())])
    assert empty.count() == 0 and set(empty.columns) == {"k", "v", "s"}


def test_cdf_footer_probe_cap_and_directory_batching(spark, tmp_path, monkeypatch):
    """read_changes' driver-side schema probe reads one footer PER
    COMMIT DIRECTORY (all files in data/c{v}-*/ come from one
    df.write.parquet => one physical schema), and past
    CDF_FOOTER_PROBE_MAX directories it raises the documented guidance
    error pointing at chunked stream_changes (VERDICT r11 #6)."""
    import pyarrow.parquet as papq

    path = str(tmp_path / "t")
    T.create_table(spark, path, _frame(spark, 100).coalesce(2))
    for i in range(1, 4):
        T.append_rows(spark, path, _frame(spark, 50, offset=1000 * i).coalesce(2))
    # 4 commits x 2 files: the probe must read 4 footers, not 8
    calls = []
    real = papq.read_schema

    def counting(p, *a, **kw):
        calls.append(p)
        return real(p, *a, **kw)

    monkeypatch.setattr(papq, "read_schema", counting)
    got = T.read_changes(spark, path, 0)
    assert got.count() == 250  # all inserts
    assert len(calls) == 4, calls
    # cap enforcement: 4 add-side directories > max of 3 => guidance error
    monkeypatch.setattr(T, "CDF_FOOTER_PROBE_MAX", 3)
    import pytest

    with pytest.raises(ValueError, match="stream_changes"):
        T.read_changes(spark, path, 0)
    # a commit-sized chunk stays under the cap and still reads fine
    assert T.read_changes(spark, path, 0, 0).count() == 100


def test_null_predicates_prune_on_null_counts(spark, tmp_path):
    """is_null / is_not_null prune on the per-file null COUNTS that
    already ride every commit: a file with zero nulls can't match
    is_null, an all-null file can't match is_not_null — and an all-null
    file MUST still be read for is_null (the all-null guard that rules
    comparison predicates out rules null tests in)."""
    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 30, None).otherwise(F.col("id") * 2).alias("v"),
    )
    T.create_table(spark, path, df.repartitionByRange(5, "k"))
    full = T.read_table(spark, path)
    got_null = T.read_table(spark, path, where=[("v", "is_null", None)])
    assert sorted(r.k for r in got_null.collect()) == list(range(30))
    rep = T.scan_report(path, [("v", "is_null", None)])
    assert rep["files_live"] == 5
    # ~30/100 keys => only the leading range files hold nulls
    assert rep["files_read"] <= 2, rep
    got_nn = T.read_table(spark, path, where=[("v", "is_not_null", None)])
    assert sorted(map(tuple, got_nn.collect())) == sorted(
        map(tuple, full.filter(F.col("v").isNotNull()).collect())
    )
    rep_nn = T.scan_report(path, [("v", "is_not_null", None)])
    # files holding ONLY nulls are skipped; mixed files are read
    assert rep_nn["files_read"] <= 4, rep_nn
    assert rep_nn["files_read"] + rep["files_read"] >= 5  # covers all rows
    # conjunction with a range predicate composes
    got_band = T.read_table(
        spark, path, where=[("v", "is_not_null", None), ("k", "<", 10)]
    )
    assert got_band.count() == 0  # k<10 rows are all null in v


def test_version_as_of_timestamp_time_travel(spark, tmp_path):
    """Delta's timestampAsOf surface: resolve the newest commit at-or-
    before a wall-clock timestamp, then read that snapshot."""
    import time as _time

    import pytest

    path = str(tmp_path / "t")
    T.create_table(spark, path, _frame(spark, 100).coalesce(1))
    _time.sleep(0.05)
    T.append_rows(spark, path, _frame(spark, 10, offset=1000).coalesce(1))
    _time.sleep(0.05)
    T.append_rows(spark, path, _frame(spark, 10, offset=2000).coalesce(1))
    h = T.history(path)
    assert [e["version"] for e in h] == [0, 1, 2]
    # between v0 and v1 resolves v0; at/after the head resolves the head
    mid = (h[0]["ts"] + h[1]["ts"]) / 2
    assert T.version_as_of(path, mid) == 0
    assert T.version_as_of(path, h[1]["ts"]) == 1
    assert T.version_as_of(path, _time.time() + 60) == 2
    v = T.version_as_of(path, mid)
    assert T.read_table(spark, path, version=v).count() == 100
    assert T.read_table(spark, path).count() == 120
    with pytest.raises(ValueError, match="predates"):
        T.version_as_of(path, h[0]["ts"] - 10)

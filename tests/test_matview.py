"""Incremental materialized views (operators/matview.py): the view
must equal the full re-aggregation after every refresh, refreshes are
exactly-once via the txn marker, zero-count groups drop out, no-op
ranges advance the marker without moving data, views chain (a view is
itself a change-feed source), and concurrent writers lose the CAS.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newsify_spark.operators import matview as MV
from newsify_spark.operators import txnlog as T


def _src(spark, n=100):
    return (
        spark.range(n)
        .select(
            (F.col("id") % 7).alias("g"),
            F.col("id").alias("k"),
            (F.col("id") * 1.5).alias("x"),
        )
        .repartition(4)
    )


def _expect(spark, src_path):
    cur = T.read_table(spark, src_path)
    return {
        r.g: (r.n, round(r.sum_x, 6))
        for r in cur.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("x"), F.lit(0))).alias("sum_x"),
        )
        .collect()
    }


def _got(spark, mv_path):
    return {
        r.g: (r.n, round(r.sum_x, 6))
        for r in T.read_table(spark, mv_path).collect()
    }


def test_matview_tracks_full_recompute_through_mutations(spark, tmp_path):
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    assert _got(spark, mv) == _expect(spark, src)
    # append: new groups (mod 11) + existing ones
    T.append_rows(
        spark,
        src,
        spark.range(100, 120).select(
            (F.col("id") % 11).alias("g"),
            F.col("id").alias("k"),
            (F.col("id") * 1.5).alias("x"),
        ),
    )
    assert MV.refresh_matview(spark, mv) is not None
    assert _got(spark, mv) == _expect(spark, src)
    # update (moves a row between groups) + bulk delete, one refresh
    T.upsert_rows(
        spark,
        src,
        spark.createDataFrame([(0, 5, 100.0)], "g long, k long, x double"),
        ["k"],
    )
    T.delete_rows(
        spark, src, spark.range(100, 120).select(F.col("id").alias("k")),
        ["k"],
    )
    assert MV.refresh_matview(spark, mv) is not None
    assert _got(spark, mv) == _expect(spark, src)
    # merge-on-read delete emptying a whole group: incremental DELETE
    doomed = T.read_table(spark, src).filter(F.col("g") == 3).select("k")
    T.delete_rows(spark, src, doomed, ["k"], mode="dv")
    assert MV.refresh_matview(spark, mv) is not None
    got = _got(spark, mv)
    assert got == _expect(spark, src)
    assert 3 not in got


def test_matview_refresh_is_exactly_once(spark, tmp_path):
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    head0 = MV.last_refreshed_source_version(mv)
    assert head0 == 0
    # current view: refresh is a no-op returning None, marker unmoved
    assert MV.refresh_matview(spark, mv) is None
    T.append_rows(spark, src, _src(spark).limit(5))
    assert MV.refresh_matview(spark, mv) is not None
    assert MV.last_refreshed_source_version(mv) == 1
    # replay (same source head): no-op — the delta cannot double-apply
    before = _got(spark, mv)
    assert MV.refresh_matview(spark, mv) is None
    assert _got(spark, mv) == before


def test_matview_noop_source_range_advances_marker(spark, tmp_path):
    """A source commit that touched no files (delete of absent keys)
    still advances the marker — with a data-free mv_refresh commit —
    so the next refresh never re-walks the no-op range."""
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    T.delete_rows(
        spark, src, spark.range(10_000, 10_003).select(F.col("id").alias("k")),
        ["k"],
    )
    v = MV.refresh_matview(spark, mv)
    assert v is not None
    e = T.history(mv)[v]
    assert e["op"] == "mv_refresh" and not e["add"] and not e["remove"]
    assert MV.last_refreshed_source_version(mv) == 1
    assert _got(spark, mv) == _expect(spark, src)


def test_matview_new_groups_only_skips_view_rewrite(spark, tmp_path):
    """A delta of brand-new groups touches NO view file: the refresh
    commit adds the new groups' files and removes nothing."""
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    T.append_rows(
        spark,
        src,
        spark.range(3).select(
            (F.col("id") + 1000).alias("g"),
            (F.col("id") + 10_000).alias("k"),
            F.lit(2.0).alias("x"),
        ),
    )
    v = MV.refresh_matview(spark, mv)
    e = T.history(mv)[v]
    assert e["add"] and not e["remove"]
    assert _got(spark, mv) == _expect(spark, src)


def test_matview_chains(spark, tmp_path):
    """A view is a transaction-log table with its own change feed, so a
    SECOND-level view maintains over the first incrementally: mv2 is
    the histogram of mv1's group sizes (group by n, count groups,
    sum their sums). An update that moves a group between size buckets
    flows through as delete(preimage)+insert(postimage) and the
    counting algorithm relocates it."""
    src, mv1, mv2 = (
        str(tmp_path / "src"),
        str(tmp_path / "mv1"),
        str(tmp_path / "mv2"),
    )
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv1, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    MV.create_matview(spark, mv2, mv1, ["n"], sums={"tot_x": "sum_x"},
                      count_col="n_groups")

    def expect_mv2():
        return {
            r.n: (r.n_groups, round(r.tot_x, 6))
            for r in T.read_table(spark, mv1)
            .groupBy("n")
            .agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.sum("sum_x").alias("tot_x"),
            )
            .collect()
        }

    T.append_rows(
        spark,
        src,
        spark.range(200, 230).select(
            (F.col("id") % 5).alias("g"),
            F.col("id").alias("k"),
            (F.col("id") * 0.5).alias("x"),
        ),
    )
    assert MV.refresh_matview(spark, mv1) is not None
    assert _got(spark, mv1) == _expect(spark, src)
    assert MV.refresh_matview(spark, mv2) is not None
    got2 = {
        r.n: (r.n_groups, round(r.tot_x, 6))
        for r in T.read_table(spark, mv2).collect()
    }
    assert got2 == expect_mv2()
    # the first view's feed for its refresh nets to the changed groups
    v1 = MV.last_refreshed_source_version(mv2)
    changed = {r.g for r in T.read_changes(spark, mv1, v1, v1).collect()}
    assert changed == {0, 1, 2, 3, 4}


def test_matview_concurrent_writer_loses_cas(spark, tmp_path):
    import unittest.mock as mock

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    T.append_rows(spark, src, _src(spark).limit(5))
    orig = T._read_files_aligned
    fired = []

    def ambush(spark_, path_, files, cols, dvs=None):
        if path_ == mv and not fired:  # claim the pinned version first
            fired.append(True)
            T.append_rows(
                spark_,
                mv,
                spark_.createDataFrame(
                    [(999, 1, 0.0)], "g long, n long, sum_x double"
                ),
            )
        return orig(spark_, path_, files, cols, dvs=dvs)

    with mock.patch.object(T, "_read_files_aligned", side_effect=ambush):
        with pytest.raises(T.ConcurrentWriteError):
            MV.refresh_matview(spark, mv)


def test_matview_rejects_collision_and_missing_config(spark, tmp_path):
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    with pytest.raises(ValueError, match="collides"):
        MV.create_matview(spark, mv, src, ["g"], sums={"n": "x"},
                          count_col="n")
    with pytest.raises(ValueError, match="no materialized-view config"):
        MV.refresh_matview(spark, str(tmp_path / "nope"))


def test_follow_matview_streams_chunked_refreshes(spark, tmp_path):
    from newsify_spark.streaming.cdf import follow_matview

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    # three source commits
    T.upsert_rows(
        spark, src,
        spark.createDataFrame([(3, 5, 100.0)], "g long, k long, x double"),
        ["k"],
    )
    T.delete_rows(
        spark, src,
        spark.createDataFrame([(10,), (11,)], "k long"), ["k"],
    )
    T.append_rows(
        spark, src,
        spark.createDataFrame([(9, 1000, 1.0)], "g long, k long, x double"),
    )
    vs = follow_matview(spark, mv, batch_commits=1)
    assert len(vs) == 3
    assert _got(spark, mv) == _expect(spark, src)
    # every intermediate view version is consistent with the source at
    # the matching commit boundary (time travel over the VIEW)
    for mv_v, src_v in zip(vs, [1, 2, 3]):
        view_at = {
            r.g: (r.n, round(r.sum_x, 6))
            for r in T.read_table(spark, mv, version=mv_v).collect()
        }
        src_at = {
            r.g: (r.n, round(r.sum_x, 6))
            for r in T.read_table(spark, src, version=src_v)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce(F.col("x"), F.lit(0))).alias("sum_x"),
            )
            .collect()
        }
        assert view_at == src_at, (mv_v, src_v)
    # replay: the feed is exhausted, offsets persisted => no new commits
    assert follow_matview(spark, mv, batch_commits=1) == []


def test_follow_matview_bounded_and_batched(spark, tmp_path):
    from newsify_spark.streaming.cdf import follow_matview

    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    for i in range(4):
        T.append_rows(
            spark, src,
            spark.createDataFrame(
                [(i % 7, 2000 + i, float(i))], "g long, k long, x double"
            ),
        )
    # bounded at source v2: only the first chunk of 2 applies
    vs = follow_matview(spark, mv, to_version=2, batch_commits=2)
    assert len(vs) == 1
    assert MV.last_refreshed_source_version(mv) == 2
    # the remainder in one batched chunk
    vs2 = follow_matview(spark, mv, batch_commits=10)
    assert len(vs2) == 1
    assert _got(spark, mv) == _expect(spark, src)


def test_refresh_matview_rejects_future_to_version(spark, tmp_path):
    src, mv = str(tmp_path / "src"), str(tmp_path / "mv")
    T.create_table(spark, src, _src(spark))
    MV.create_matview(spark, mv, src, ["g"], sums={"sum_x": "x"},
                      count_col="n")
    with pytest.raises(ValueError, match="beyond the source head"):
        MV.refresh_matview(spark, mv, to_version=99)

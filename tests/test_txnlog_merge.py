"""General MERGE INTO on the transaction log.

Three-clause Delta-style MERGE (matched-update with condition,
matched-delete with condition, not-matched-insert with condition) as
file-granular copy-on-write: clause semantics, precedence, null-key
behavior, three-valued condition logic, duplicate-source rejection,
blast radius, CDF decomposition, CHECK interplay, and partitioned
targets.
"""

import pytest
from pyspark.sql import functions as F

from newsify_spark.operators import txnlog as T


def _base(spark, tmp_path, partition_by=None, n=20):
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"s{i % 2}", float(i * 10)) for i in range(n)],
        "id int, status string, price double",
    )
    T.create_table(spark, tbl, df.repartition(4), partition_by=partition_by)
    return tbl


def test_merge_three_clauses_with_conditions(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [
            (3, "upd", 999.0),   # update fires (s.price > t.price)
            (5, "del", 0.0),     # delete fires
            (7, "upd", 1.0),     # update condition FALSE -> untouched
            (100, "new", 5.0),   # insert
        ],
        "id int, status string, price double",
    )
    v = T.merge_table(
        spark, tbl, src, on=["id"],
        when_matched_update={"price": "s.price", "status": "s.status"},
        when_matched_update_condition="s.price > t.price",
        when_matched_delete="s.status = 'del'",
        when_not_matched_insert="all",
    )
    got = {r.id: (r.status, r.price)
           for r in T.read_table(spark, tbl).collect()}
    assert got[3] == ("upd", 999.0)
    assert 5 not in got
    assert got[7] == ("s1", 70.0)
    assert got[100] == ("new", 5.0)
    assert got[0] == ("s0", 0.0) and len(got) == 20
    # blast radius: only files holding ids 3/5/7 were rewritten
    entry = [e for e in T._read_log(tbl) if e["version"] == v][0]
    assert 0 < len(entry["remove"]) < 4


def test_merge_delete_precedes_update(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(4, "x", 5000.0)], "id int, status string, price double"
    )
    # both clauses would fire; Delta semantics: delete wins
    T.merge_table(
        spark, tbl, src, on=["id"],
        when_matched_update="all",
        when_matched_delete=True,
        when_not_matched_insert=None,
    )
    assert T.read_table(spark, tbl).filter("id = 4").count() == 0
    assert T.read_table(spark, tbl).count() == 19


def test_merge_null_condition_means_clause_skipped(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(6, None, 1.0)], "id int, status string, price double"
    )
    # s.status = 'del' evaluates NULL -> delete must NOT fire; the
    # update condition also NULL -> row stays untouched
    T.merge_table(
        spark, tbl, src, on=["id"],
        when_matched_update="all",
        when_matched_update_condition="s.status = 'go'",
        when_matched_delete="s.status = 'del'",
        when_not_matched_insert=None,
    )
    row = T.read_table(spark, tbl).filter("id = 6").collect()[0]
    assert (row.status, row.price) == ("s0", 60.0)


def test_merge_insert_condition_filters_inserts(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(200, "a", 1.0), (201, "b", 2.0)],
        "id int, status string, price double",
    )
    T.merge_table(
        spark, tbl, src, on=["id"],
        when_not_matched_insert="all",
        when_not_matched_insert_condition="s.status = 'a'",
    )
    ids = {r.id for r in T.read_table(spark, tbl).collect()}
    assert 200 in ids and 201 not in ids


def test_merge_partial_insert_map_backfills_null(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    src = spark.createDataFrame([(300,)], "id int")
    T.merge_table(
        spark, tbl, src, on=["id"],
        when_not_matched_insert={"id": "s.id", "price": "0.0"},
    )
    row = T.read_table(spark, tbl).filter("id = 300").collect()[0]
    assert row.status is None and row.price == 0.0


def test_merge_null_source_key_inserts(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(None, "nul", 1.0)], "id int, status string, price double"
    )
    # null keys never equi-match: the row is an INSERT (SQL semantics)
    T.merge_table(spark, tbl, src, on=["id"], when_matched_update="all")
    nul = T.read_table(spark, tbl).filter("id IS NULL").collect()
    assert len(nul) == 1 and nul[0].status == "nul"


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    dup = spark.createDataFrame(
        [(1, "a", 0.0), (1, "b", 1.0)], "id int, status string, price double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        T.merge_table(spark, tbl, dup, on=["id"])


def test_merge_rejects_no_clauses_and_bad_keys(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    src = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="no-op"):
        T.merge_table(
            spark, tbl, src, on=["id"],
            when_not_matched_insert=None,
        )
    with pytest.raises(ValueError, match="not in table columns"):
        T.merge_table(spark, tbl, src, on=["nope"])


def test_merge_cdf_decomposition(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(3, "upd", 999.0), (5, "del", 0.0), (100, "new", 5.0),
         (7, "noop", 70.0)],
        "id int, status string, price double",
    )
    v = T.merge_table(
        spark, tbl, src, on=["id"],
        when_matched_update={"price": "s.price", "status": "s.status"},
        when_matched_update_condition="s.status = 'upd'",
        when_matched_delete="s.status = 'del'",
    )
    types = {(r.id, r._change_type)
             for r in T.read_changes(spark, tbl, v, v).collect()}
    assert (3, "delete") in types and (3, "insert") in types  # update pair
    assert (5, "delete") in types and (5, "insert") not in types
    assert (100, "insert") in types
    # the carried-over neighbor rows and the no-op matched row cancel
    assert (7, "insert") not in types and (7, "delete") not in types


def test_merge_respects_check_constraints(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    T.add_check(spark, tbl, "price_pos", "price >= 0")
    src = spark.createDataFrame(
        [(3, "bad", -1.0)], "id int, status string, price double"
    )
    head = T._versions(tbl)[-1]
    with pytest.raises(T.CheckViolation):
        T.merge_table(spark, tbl, src, on=["id"], when_matched_update="all")
    assert T._versions(tbl)[-1] == head  # nothing committed
    assert T.read_table(spark, tbl).filter("id = 3").collect()[0].price == 30.0


def test_merge_on_partitioned_table_moves_rows_across_partitions(
    spark, tmp_path
):
    tbl = _base(spark, tmp_path, partition_by=["status"])
    src = spark.createDataFrame(
        [(4, "s9", 4.0), (200, "s9", 7.0)],
        "id int, status string, price double",
    )
    T.merge_table(spark, tbl, src, on=["id"], when_matched_update="all")
    got = {r.id: r.status for r in T.read_table(spark, tbl).collect()}
    assert got[4] == "s9" and got[200] == "s9" and len(got) == 21
    # moved rows landed in the right partition DIRECTORY, and pruning
    # on the new value finds exactly them
    hits = T.read_table(spark, tbl, where=[("status", "=", "s9")])
    assert sorted(r.id for r in hits.collect()) == [4, 200]
    rep = T.scan_report(tbl, [("status", "=", "s9")])
    assert rep["files_read"] < rep["files_live"]


def test_merge_applies_deletion_vectors_on_victims(spark, tmp_path):
    tbl = _base(spark, tmp_path)
    # DV-delete id=3, then merge-update id=2 (likely same file region):
    # the rewrite must APPLY the vector, never resurrect id=3
    T.delete_rows(
        spark, tbl, spark.createDataFrame([(3,)], "id int"),
        keys=["id"], mode="dv",
    )
    T.merge_table(
        spark, tbl,
        spark.createDataFrame(
            [(2, "u", 1.0)], "id int, status string, price double"
        ),
        on=["id"], when_matched_update="all",
    )
    snap = T.read_table(spark, tbl)
    assert snap.filter("id = 3").count() == 0
    assert snap.filter("id = 2").collect()[0].status == "u"

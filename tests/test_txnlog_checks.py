"""Table CHECK constraints on the transaction log (round 12 — Delta's
ALTER TABLE ADD CONSTRAINT semantics): row-adding writes validate the
just-written files in one column-pruned aggregate and abort without a
commit (staged files removed) on violation; add_check validates the
existing snapshot; SQL NULL semantics pass."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from newsify_spark.operators import txnlog as T


def _fixture(spark, n=50):
    return (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("val"))
        .repartition(2)
    )


def _data_files(path):
    out = []
    droot = os.path.join(path, "data")
    for d in os.listdir(droot):
        out += [f"{d}/{f}" for f in os.listdir(os.path.join(droot, d))]
    return sorted(out)


def test_violating_append_aborts_without_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.add_check(spark, path, "val_nonneg", "val >= 0")
    before_files = _data_files(path)
    bad = spark.createDataFrame([(500, -1.0)], "k long, val double")
    with pytest.raises(T.CheckViolation, match="val_nonneg.*1 rows"):
        T.append_rows(spark, path, bad)
    # nothing committed, nothing staged left behind
    assert T._next_version(path) == 1
    assert _data_files(path) == before_files
    assert T.read_table(spark, path).count() == 50
    # a clean append still passes
    T.append_rows(spark, path, spark.createDataFrame(
        [(500, 1.0)], "k long, val double"))
    assert T.read_table(spark, path).count() == 51


def test_add_check_validates_existing_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    with pytest.raises(T.CheckViolation, match="existing rows violate"):
        T.add_check(spark, path, "small", "val < 10")
    # the rejected constraint is not registered: big values still append
    T.append_rows(spark, path, spark.createDataFrame(
        [(500, 9999.0)], "k long, val double"))


def test_upsert_postimage_violation_aborts(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.add_check(spark, path, "val_nonneg", "val >= 0")
    with pytest.raises(T.CheckViolation):
        T.upsert_rows(
            spark, path,
            spark.createDataFrame([(5, -3.0)], "k long, val double"), ["k"],
        )
    snap = T.read_table(spark, path)
    assert snap.count() == 50
    assert snap.filter(F.col("k") == 5).first().val == 10.0


def test_null_check_passes_sql_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.add_check(spark, path, "val_cap", "val < 1e6")
    T.append_rows(spark, path, spark.createDataFrame(
        [(500, None)], "k long, val double"))  # NULL check = pass
    assert T.read_table(spark, path).count() == 51


def test_drop_check_and_multi_constraint_report(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.add_check(spark, path, "a_nonneg", "val >= 0")
    T.add_check(spark, path, "b_key_cap", "k < 1000")
    bad = spark.createDataFrame(
        [(5000, -1.0), (6000, 2.0)], "k long, val double"
    )
    with pytest.raises(T.CheckViolation) as ei:
        T.append_rows(spark, path, bad)
    msg = str(ei.value)
    assert "a_nonneg" in msg and "(1 rows)" in msg
    assert "b_key_cap" in msg and "(2 rows)" in msg
    T.drop_check(path, "b_key_cap")
    with pytest.raises(ValueError, match="no CHECK constraint"):
        T.drop_check(path, "b_key_cap")
    # only the remaining constraint enforces now
    T.append_rows(spark, path, spark.createDataFrame(
        [(5000, 1.0)], "k long, val double"))
    with pytest.raises(T.CheckViolation, match="a_nonneg"):
        T.append_rows(spark, path, spark.createDataFrame(
            [(1, -1.0)], "k long, val double"))


def test_append_rebase_enforces_checks(spark, tmp_path):
    path = str(tmp_path / "t")
    T.create_table(spark, path, _fixture(spark))
    T.add_check(spark, path, "val_nonneg", "val >= 0")
    with pytest.raises(T.CheckViolation):
        T.append_rebase(spark, path, spark.createDataFrame(
            [(500, -1.0)], "k long, val double"))
    assert T._next_version(path) == 1

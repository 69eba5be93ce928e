"""Count-Min sketch (operators/cms.py): never-undercount guarantee,
merge algebra, error bound on the fixture, bounded sketch size."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from newsify_spark.operators.cms import cm_build, cm_estimate, cm_merge
from newsify_spark.functions.text import tokens
from newsify_spark.tables import load

SF = "/root/testdata/sf0.01"
D, W = 4, 256


def _toks(spark):
    docs = load(spark, SF, "documents")
    return docs.select(F.explode(tokens("text")).alias("tok"))


def test_never_undercounts_and_error_bound(spark):
    toks = _toks(spark)
    n_total = toks.count()
    sketch = cm_build(toks, "tok", D, W)
    exact = toks.groupBy("tok").agg(F.count("*").alias("n"))
    est = cm_estimate(sketch, toks.distinct(), "tok", D, W)
    j = exact.join(est, "tok")
    under = j.filter(F.col("est") < F.col("n")).count()
    assert under == 0  # structural guarantee, not probabilistic
    # CM bound: overcount <= (e/w)*N w.p. 1-(1/e)^d; deterministic here
    bound = math.e / W * n_total
    worst = j.select(F.max(F.col("est") - F.col("n"))).first()[0]
    assert worst <= bound, (worst, bound)


def test_sketch_size_bounded(spark):
    sketch = cm_build(_toks(spark), "tok", D, W)
    assert sketch.count() <= D * W


def test_merge_equals_union_build(spark):
    docs = load(spark, SF, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0).select(F.explode(tokens("text")).alias("tok"))
    b = docs.filter(F.col("doc_id") % 2 == 1).select(F.explode(tokens("text")).alias("tok"))
    merged = cm_merge(cm_build(a, "tok", D, W), cm_build(b, "tok", D, W))
    whole = cm_build(a.unionByName(b), "tok", D, W)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_absent_keys_estimate_zero_not_vanish(spark):
    """ADVICE r5: empty counters in the sparse sketch mean 0. A key
    hitting >=1 empty cell must take that 0 into its min (not min over
    only occupied cells), and keys whose cells are all empty must still
    appear in the output with est=0."""
    one = spark.createDataFrame([("alpha",)], "tok string")
    wide = 4096
    sketch = cm_build(one, "tok", D, wide)
    keys = spark.createDataFrame(
        [("alpha",), ("never_seen_1",), ("never_seen_2",)], "tok string"
    )
    est = {r["tok"]: r["est"] for r in cm_estimate(sketch, keys, "tok", D, wide).collect()}
    assert set(est) == {"alpha", "never_seen_1", "never_seen_2"}
    assert est["alpha"] == 1
    # deterministic md5 positions: with 1 occupied cell per row of 4096,
    # these unseen keys hit an empty cell in at least one row -> 0
    assert est["never_seen_1"] == 0 and est["never_seen_2"] == 0
    # empty store (streaming first batch): every key estimates exactly 0
    empty = spark.createDataFrame([], "r int, c long, cnt long")
    est0 = cm_estimate(empty, keys, "tok", D, wide)
    assert est0.count() == 3
    assert est0.filter(F.col("est") != 0).count() == 0


def test_build_is_all_expression(spark):
    plan = cm_build(_toks(spark), "tok", D, W)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan.lower() or "Partial" in plan

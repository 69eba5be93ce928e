"""Declarative data-quality constraints (Deequ-style) for pipeline gates.

The reference validates records imperatively at service boundaries
(pydantic models on FastAPI routes; ad-hoc `if not article.get(...)`
guards in ingestion_service.py). At 100 TB validation must be a QUERY:
every rule folds into ONE aggregate pass over the table (map-side
combining sums of CASE expressions — no shuffle of row data, one scan
total no matter how many rules), and the output is a small per-rule
violation report a pipeline can gate on or a human can read.

Rules are (name, predicate) pairs where the predicate is a boolean
Column that is True when the ROW PASSES. NULL predicate results count
as violations (a rule that can't be evaluated is a failed rule —
fail-closed, matching SQL three-valued logic pitfalls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_checks(df: DataFrame, rules: list[tuple[str, F.Column]]) -> DataFrame:
    """(check, violations, total) — one row per rule, ONE scan total.

    All rules aggregate in a single pass (their sums combine map-side);
    the 1-row wide result is then unpivoted driver-free via stack().
    """
    if not rules:
        raise ValueError("run_checks: no rules given")
    aggs = [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), F.lit(0)).otherwise(F.lit(1))
        ).alias(f"_v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    wide = df.agg(F.count(F.lit(1)).alias("_total"), *aggs)
    pairs = ", ".join(f"'{name}', _v{i}" for i, (name, _) in enumerate(rules))
    return wide.selectExpr(
        f"stack({len(rules)}, {pairs}) AS (check, violations)", "_total AS total"
    ).select("check", F.col("violations").cast("long"), F.col("total").cast("long"))


def expect_all(df: DataFrame, rules: list[tuple[str, F.Column]]) -> DataFrame:
    """Fail-fast gate: raises ValueError listing every violated rule, or
    returns the report DataFrame when everything passes. The shape a
    pipeline stage calls between 'wrote silver' and 'promoted to gold'."""
    report = run_checks(df, rules).persist()
    bad = report.filter(F.col("violations") > 0).collect()
    if bad:
        detail = ", ".join(f"{r['check']}: {r['violations']}/{r['total']}" for r in bad)
        report.unpersist()
        raise ValueError(f"data-quality gate failed — {detail}")
    return report

"""Oracle parity: every registered query with an oracle must match DuckDB
exactly (row count + sorted column names + order-insensitive values) —
the same contract the driver enforces in CORRECTNESS_r{N}.json.
Queries without an oracle get a rows-returned smoke check here (their
invariants live in test_operators.py).
"""

from __future__ import annotations

import pytest

from newsify_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, ddb):
    q = REGISTRY[name]
    assert_matches_oracle(q.fn(spark, SF_DIR), q.oracle, ddb)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only(name, spark):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    # mirror the driver's rows-only contract (spark_rows > 0) so a
    # rows-only query regressing to empty output fails locally first
    assert df.count() > 0
    assert len(df.schema) > 0

"""Shared fixtures: one SparkSession per test run, one DuckDB connection
with the fixture tables registered as views (mirroring the driver's
oracle harness), and a comparison helper implementing the driver's
contract: row count + column names + order-insensitive values.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from newsify_spark.session import get_spark
from newsify_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("newsify_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — the
    order-insensitive canonical form both engines must agree on."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, oracle_sql: str, con) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(oracle_sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count differs: spark={len(got)} oracle={len(want)}"
    # exact equality — the driver hashes values, so near-enough is not enough
    mism = []
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            eq = (got[c].fillna(-1e308) == want[c].fillna(-1e308))
        else:
            eq = got[c].fillna("␀").eq(want[c].fillna("␀"))
        if not eq.all():
            idx = (~eq).idxmax()
            mism.append(f"{c}: first diff at row {idx}: spark={got[c][idx]!r} oracle={want[c][idx]!r} ({int((~eq).sum())} rows)")
    assert not mism, "value mismatches:\n" + "\n".join(mism)

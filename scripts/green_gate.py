#!/usr/bin/env python3
"""Pre-snapshot green gate (VERDICT r2 item 3).

Runs exactly the queries the correctness driver will see — the first 50
sorted names of ``driver_registry()`` — against the CURRENT fixture at
sf0.01, comparing each against its DuckDB oracle with the driver's own
contract (row count, sorted column names, order-insensitive values).
Exits non-zero on ANY error or mismatch, so an end-of-round commit on a
red gate is a conscious act, not an accident (round 2 shipped a fixture
regression nobody ran).

Usage:  python scripts/green_gate.py [sf_dir]           # default sf0.01
        python scripts/green_gate.py --all [sf_dir]     # whole registry
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from newsify_spark.queries import REGISTRY  # noqa: E402  (populates registry)
from newsify_spark.queries.registry import driver_registry  # noqa: E402
from newsify_spark.session import get_spark  # noqa: E402
from newsify_spark.tables import TABLES  # noqa: E402

DRIVER_WINDOW = 50


def _canon(df: pd.DataFrame) -> pd.DataFrame:
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


def compare(spark_df, oracle_sql: str | None, con) -> str | None:
    """None if green, else a one-line reason."""
    got = _canon(spark_df.toPandas())
    if oracle_sql is None:
        return None if len(got) >= 0 else "no rows"
    want = _canon(con.execute(oracle_sql).fetchdf())
    if list(got.columns) != list(want.columns):
        return f"columns: spark={list(got.columns)} oracle={list(want.columns)}"
    if len(got) != len(want):
        return f"rows: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        # Null masks compared separately: fillna(sentinel) raises on
        # pandas 2.x nullable Int64 / datetime64 columns containing NA.
        gna, wna = got[c].isna().to_numpy(), want[c].isna().to_numpy()
        if pd.api.types.is_float_dtype(got[c]):
            import numpy as np

            val_eq = np.isclose(
                got[c].to_numpy(dtype="float64", na_value=0.0),
                want[c].to_numpy(dtype="float64", na_value=0.0),
                rtol=1e-9,
                atol=1e-12,
            )
        else:
            val_eq = got[c].eq(want[c]).fillna(False).to_numpy()
        eq = pd.Series((gna == wna) & (gna | val_eq), index=got.index)
        if not eq.all():
            i = (~eq).idxmax()
            return f"values[{c}] row {i}: spark={got[c][i]!r} oracle={want[c][i]!r}"
    return None


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_all = "--all" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    reg = driver_registry()
    names = sorted(reg)
    if not run_all:
        names = names[:DRIVER_WINDOW]

    spark = get_spark("green_gate", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    t0 = time.time()
    failures: dict[str, str] = {}
    for i, name in enumerate(names, 1):
        q = reg[name]
        try:
            reason = compare(q.fn(spark, sf_dir), q.oracle, con)
        except Exception as e:  # noqa: BLE001 — gate must report, not die
            reason = f"ERR {type(e).__name__}: {str(e).splitlines()[0][:160]}"
        status = "ok" if reason is None else "FAIL"
        print(f"[{i:>3}/{len(names)}] {status:<4} {name}" + ("" if reason is None else f"  — {reason}"))
        if reason is not None:
            failures[name] = reason

    dt = time.time() - t0
    print(json.dumps({
        "gate": "green" if not failures else "RED",
        "checked": len(names),
        "failed": len(failures),
        "failures": failures,
        "sf_dir": sf_dir,
        "sec": round(dt, 1),
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

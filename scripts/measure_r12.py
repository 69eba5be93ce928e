#!/usr/bin/env python
"""Round-12 optimization measurement harness.

Times individual bench queries through the same noop-sink methodology as
bench.py (median of N passes) and captures `.explain("formatted")` into
plans/r12/<name>_<tag>.txt. Used to isolate per-query cost while
iterating — bench.py stays the ground truth for the headline number.

Usage:
  python scripts/measure_r12.py before q1 q2 ...   # plans + timings, tag files _before
  python scripts/measure_r12.py after  q1 q2 ...   # same, tag _after
  python scripts/measure_r12.py time   q1 q2 ...   # timings only, no plan files
  (no query names = all bench-tagged queries)
"""
from __future__ import annotations

import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newsify_spark.queries import REGISTRY
from newsify_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def formatted_plan(df) -> str:
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = old
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or sorted(n for n, q in REGISTRY.items() if q.bench)

    if "SPARK_GRAFT_BLOOM_CACHE" not in os.environ:
        import tempfile

        os.environ["SPARK_GRAFT_BLOOM_CACHE"] = tempfile.mkdtemp(
            prefix="newsify_measure_bloom_"
        )

    spark = get_spark("newsify_measure_r12")
    force(spark.range(1_000_000).selectExpr("sum(id) AS s"))  # warmup

    if tag in ("before", "after"):
        os.makedirs(PLANS_DIR, exist_ok=True)

    per_pass: dict[str, list[float]] = {n: [] for n in names}
    for p in range(PASSES):
        for name in names:
            q = REGISTRY[name]
            spark.sparkContext.setJobDescription(f"r12 {tag} {name} pass{p + 1}")
            t0 = time.perf_counter()
            df = q.fn(spark, SF_DIR)
            if p == 0 and tag in ("before", "after"):
                with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                    f.write(formatted_plan(df))
            force(df)
            dt = round(time.perf_counter() - t0, 3)
            per_pass[name].append(dt)
            print(f"# pass {p + 1}/{PASSES} {name}: {dt}s", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)

    out = {
        n: {"median": round(statistics.median(ts), 3), "passes": ts}
        for n, ts in per_pass.items()
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: runs the bench-tagged queries from the registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced through the noop sink so every output column is
materialized (a bare count() would let Spark prune the projections).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from newsify_spark.queries import REGISTRY
from newsify_spark.session import get_spark
from newsify_spark.tables import DEFAULT_SF_DIR


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("newsify_bench")
    # JVM/codegen warmup so the first timed query isn't penalized
    force(spark.range(1_000_000).selectExpr("sum(id) AS s"))

    names = sorted(n for n, q in REGISTRY.items() if q.bench)
    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        force(q.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)

    # regression gate vs the checked-in baseline (BENCH_r01 adopted per
    # VERDICT round-1 item #8): flag any query >1.5x its baseline time
    regressions: dict[str, str] = {}
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_BENCH.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("sf") != sf:
            # baseline recorded at a different scale factor — timings are
            # not comparable, skip the gate rather than flag everything
            print(
                f"# baseline sf={base.get('sf')} != run sf={sf}; regression gate skipped",
                file=sys.stderr,
            )
            base = {}
        for name, t in timings.items():
            b = base.get("queries", {}).get(name)
            if b and t > 1.5 * b:
                regressions[name] = f"{t:.3f}s vs baseline {b:.3f}s"
        if regressions:
            print(f"# REGRESSIONS (>1.5x baseline): {regressions}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "baseline_total": base.get("value") if os.path.exists(base_path) else None,
                "regressions": regressions,
            }
        )
    )


if __name__ == "__main__":
    main()

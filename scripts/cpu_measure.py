#!/usr/bin/env python
"""CPU-time measurement harness for noisy hosts (round 12).

Wall-clock A/B on this sandbox is polluted by ambient host load (3-5x
run-to-run swings observed mid-round). Total CPU seconds consumed by
the Spark process SUBTREE (the local[N] JVM plus its pyspark.daemon
workers plus this driver) is far more stable under contention: work
stolen by a noisy neighbour delays the wall clock but does not add CPU
cycles to our processes. This measures, per noop-sink pass, the delta
of utime+stime summed over /proc for this process and every live
descendant — the local-mode executor threads all live in the one JVM,
so the subtree captures the whole computation.

Usage: python scripts/cpu_measure.py q1 q2 ...   (passes via
SPARK_GRAFT_BENCH_PASSES, default 3; prints JSON with cpu+wall lists).
"""
from __future__ import annotations

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
CLK = os.sysconf("SC_CLK_TCK")


def _children(pid: int, ppids: dict[int, int]) -> set[int]:
    out = {pid}
    added = True
    while added:
        added = False
        for p, pp in ppids.items():
            if pp in out and p not in out:
                out.add(p)
                added = True
    return out


def subtree_cpu_seconds() -> float:
    """utime+stime (incl. reaped children via cutime/cstime) summed over
    this process and all live descendants."""
    me = os.getpid()
    ppids: dict[int, int] = {}
    stats: dict[int, tuple[int, ...]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                raw = f.read().decode("ascii", "replace")
        except OSError:
            continue
        # fields after the (comm) parens; comm may contain spaces
        rest = raw[raw.rindex(")") + 2 :].split()
        pid = int(d)
        ppids[pid] = int(rest[1])  # ppid is field 4 -> rest[1]
        # utime=14,stime=15,cutime=16,cstime=17 -> rest[11..14]
        stats[pid] = tuple(int(x) for x in rest[11:15])
    total = 0
    for pid in _children(me, ppids):
        if pid in stats:
            total += sum(stats[pid])
    return total / CLK


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: cpu_measure.py query [query ...]")
    if "SPARK_GRAFT_BLOOM_CACHE" not in os.environ:
        import tempfile

        os.environ["SPARK_GRAFT_BLOOM_CACHE"] = tempfile.mkdtemp(
            prefix="newsify_measure_bloom_"
        )
    spark = get_spark("newsify_cpu_measure_r12")
    force(spark.range(1_000_000).selectExpr("sum(id) AS s"))  # warmup

    out: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        cpu, wall, jobs, stages, tasks = [], [], [], [], []
        for p in range(PASSES):
            group = f"cpu_{name}_p{p + 1}"
            spark.sparkContext.setJobGroup(group, f"cpu {name} pass{p + 1}")
            c0, t0 = subtree_cpu_seconds(), time.perf_counter()
            force(q.fn(spark, SF_DIR))
            wall.append(round(time.perf_counter() - t0, 3))
            cpu.append(round(subtree_cpu_seconds() - c0, 3))
            # deterministic structural counters — immune to host noise:
            # number of jobs/stages/tasks this pass actually ran
            st = spark.sparkContext.statusTracker()
            jids = st.getJobIdsForGroup(group)
            sids = set()
            for j in jids:
                ji = st.getJobInfo(j)
                if ji:
                    sids.update(ji.stageIds)
            ntasks = 0
            nstages = 0
            for s in sids:
                si = st.getStageInfo(s)
                if si and si.numTasks > 0:
                    nstages += 1
                    ntasks += si.numTasks
            jobs.append(len(jids))
            stages.append(nstages)
            tasks.append(ntasks)
            spark.sparkContext.setJobGroup(None, None)
        out[name] = {
            "cpu_min": min(cpu),
            "cpu": cpu,
            "wall_min": min(wall),
            "wall": wall,
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
        print(f"# {name}: cpu={cpu} wall={wall} jobs={jobs} tasks={tasks}", file=sys.stderr)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

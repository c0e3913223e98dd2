"""Scheduler-truth tally for named registry queries: jobs / stages / tasks
from ``SparkContext.statusTracker()`` for ONE warm run each, plus wall time.

The r15 optimization rounds established that wall-clock deltas below ~2× are
not decidable on a contended hypervisor, while job/stage/task counts are
deterministic for an unchanged plan — so optimizations are judged primarily
on this tally (guide §1), with wall clock as supporting evidence.

Usage:
    python tools/tally.py [--sf /root/testdata/sf0.1] [--runs 1] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from streaming_data_pipeline_with_iceberg_and_spark_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("tally")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM/codegen + python workers, and one cold pass of each target
    # so session memos are built before the measured run
    force(qs["q5_revenue_by_nation"](spark, args.sf))
    force(
        spark.range(sc.defaultParallelism * 4, numPartitions=sc.defaultParallelism)
        .mapInPandas(lambda it: it, "id long")
    )
    for name in args.queries:
        if name in qs:
            force(qs[name](spark, args.sf))

    jtracker = sc._jsc.sc().statusTracker()

    # r16 (r15 ADVICE): count jobs via a per-measurement job GROUP instead
    # of the null group since session start — with many measured queries
    # the UI store evicts old jobs/stages past spark.ui.retainedJobs and a
    # since-start delta silently undercounts. A fresh group id per run
    # enumerates exactly that run's jobs; stages/tasks are read while the
    # run's entries are the newest in the store, so eviction cannot touch
    # them.
    def group_counts(group_id):
        jobs = jtracker.getJobIdsForGroup(group_id)
        stage_ids = set()
        n_tasks = 0
        for jid in jobs:
            info = jtracker.getJobInfo(jid)
            if info.isEmpty():
                continue
            for s in info.get().stageIds():
                stage_ids.add(s)
        for s in stage_ids:
            si = jtracker.getStageInfo(s)
            if not si.isEmpty():
                n_tasks += si.get().numTasks()
        return len(jobs), len(stage_ids), n_tasks

    print("query\tjobs\tstages\ttasks\twall_s")
    for name in args.queries:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}\tMISSING")
            continue
        best = None
        for run in range(max(1, args.runs)):
            gid = f"tally-{name}-{run}"
            sc.setJobGroup(gid, f"tally: {name}")
            t = time.perf_counter()
            force(fn(spark, args.sf))
            wall = time.perf_counter() - t
            sc._jsc.clearJobGroup()
            cur = (*group_counts(gid), wall)
            if best is None or cur[3] < best[3]:
                best = cur
        print(f"{name}\t{best[0]}\t{best[1]}\t{best[2]}\t{best[3]:.2f}", flush=True)
    print(f"# load={os.getloadavg()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-stage profile of one warm run of a registry query, via the Spark UI
REST API (the headless stand-in for guide §7.1's Stages tab).

The bench session runs with spark.ui.enabled=false; this tool enables the UI
on its own session only, runs the named queries once cold + once measured,
and prints every stage submitted during the measured run with its wall
duration, task count, summed executor run time, GC, shuffle bytes and
Python-eval share — so "where does the 2 s go" is answered from scheduler
truth instead of guesswork.

Usage:
    python tools/profile.py [--sf /root/testdata/sf0.1] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from streaming_data_pipeline_with_iceberg_and_spark_spark.session import (
        get_spark,
    )

    import __spark_entry__ as entrymod

    spark = get_spark(
        "profile", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"}
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs["q5_revenue_by_nation"](spark, args.sf))
    force(
        spark.range(sc.defaultParallelism * 4, numPartitions=sc.defaultParallelism)
        .mapInPandas(lambda it: it, "id long")
    )

    base = f"http://localhost:4055/api/v1/applications/{sc.applicationId}"

    for name in args.queries:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}\tMISSING")
            continue
        # one unmeasured pass: codegen + session memos
        sc.setJobDescription(f"profile-warmup: {name}")
        force(fn(spark, args.sf))
        jobs_before = {j["jobId"] for j in _get(base + "/jobs")}
        sc.setJobDescription(f"profile: {name}")
        t0 = time.perf_counter()
        force(fn(spark, args.sf))
        wall = time.perf_counter() - t0
        jobs = [j for j in _get(base + "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall={wall:.3f}s  jobs={len(jobs)} "
              f"stages={len(stage_ids)} ===")
        rows = []
        for sid in stage_ids:
            try:
                infos = _get(base + f"/stages/{sid}")
            except Exception:
                continue
            for st in infos:
                if st["status"] not in ("COMPLETE", "FAILED"):
                    continue
                dur = None
                if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    t_a = datetime.strptime(st["firstTaskLaunchedTime"], fmt)
                    t_b = datetime.strptime(st["completionTime"], fmt)
                    dur = (t_b - t_a).total_seconds()
                rows.append(
                    (
                        dur or 0.0,
                        sid,
                        st["numCompleteTasks"],
                        st.get("executorRunTime", 0) / 1e3,
                        st.get("jvmGcTime", 0) / 1e3,
                        st.get("shuffleReadBytes", 0),
                        st.get("shuffleWriteBytes", 0),
                        st.get("executorDeserializeTime", 0) / 1e3,
                        (st.get("name") or "")[:60],
                    )
                )
        rows.sort(reverse=True)
        print("  wall_s\tstage\ttasks\trun_s\tgc_s\tdeser_s\tshuf_r\tshuf_w\tname")
        for (dur, sid, ntask, run, gc, sr, sw, deser, nm) in rows[:25]:
            print(
                f"  {dur:6.3f}\t{sid}\t{ntask}\t{run:6.2f}\t{gc:4.2f}"
                f"\t{deser:5.2f}\t{sr // 1024}K\t{sw // 1024}K\t{nm}"
            )
        tot_sched = sum(r[0] for r in rows)
        print(f"  sum(stage wall)={tot_sched:.3f}s of {wall:.3f}s wall "
              f"(gap = driver/planning/collect time)")
    print(f"# load={os.getloadavg()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Per-query time breakdown for the optimization rounds (guide §1):
splits a declared query's wall time into

  build    — Python call to the query function (DataFrame construction;
             driver-side, includes any bounded first()/collect() the
             operator performs while composing the plan)
  analyze  — forcing analysis (df.schema)
  exec1/2  — two noop-sink runs (cold-ish / warm; codegen + Catalyst
             re-run both times, a warm run isolates executor time)

and prints a plan-shape summary (Exchange / *EvalPython / codegen /
scan / join-strategy counts) from explain("formatted").

Usage:
    python tools/profile_query.py q1 q2 ...
    python tools/profile_query.py --sf-dir /root/testdata/sf0.1 q1
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_summary(df) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    counts = {
        "exchange": len(re.findall(r"\bExchange\b", txt)),
        "scan": len(re.findall(r"Scan parquet", txt)),
        "py_eval": len(re.findall(r"EvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", txt)),
        "codegen": len(re.findall(r"WholeStageCodegen", txt)),
        "smj": len(re.findall(r"SortMergeJoin", txt)),
        "bhj": len(re.findall(r"BroadcastHashJoin", txt)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", txt)),
        "sort": len(re.findall(r"^\s*\S*\s*Sort ", txt, re.M)),
        "window": len(re.findall(r"\bWindow\b", txt)),
        "plan_chars": len(txt),
    }
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from hazelcast_jet_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # one warm-up to absorb JVM/parquet/codegen first-touch
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()
    entry.q1_pricing_summary(spark, args.sf_dir).write.format("noop").mode(
        "overwrite").save()

    sc = spark.sparkContext
    for name in args.names:
        fn = qs[name]
        # host wall-clock here is hypervisor-noise-dominated; job/stage/
        # task counts for the query's job group are DETERMINISTIC
        # work-shape evidence (guide §1: measure what the change moved)
        sc.setJobGroup(f"pq_{name}", f"profile: {name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        t1 = time.perf_counter()
        _ = df.schema
        t2 = time.perf_counter()
        execs = []
        for _i in range(args.runs):
            te = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(round(time.perf_counter() - te, 3))
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(f"pq_{name}")
        n_stages = n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        summ = plan_summary(df)
        print(f"{name}: build={t1 - t0:.3f}s analyze={t2 - t1:.3f}s "
              f"exec={execs} jobs={len(jobs)} stages={n_stages} "
              f"tasks={n_tasks} plan={summ}", flush=True)
        sc.setJobGroup(None, None)


if __name__ == "__main__":
    main()

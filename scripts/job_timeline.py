"""Per-job wall-time timeline of one registry query (round 16).

Runs the query warm, then dumps every Spark job of the LAST timed run
from the app status store: job id, description, duration, and the GAP
since the previous job's completion (gap = driver-side work: planning,
collects, py4j round-trips). The gap column is what separates
"cluster is slow" from "driver is thinking" (guide §7.3).

Usage: python scripts/job_timeline.py <query> [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import jvm_gc, materialize  # noqa: E402
from dwh_with_dask_spark.plans import QUERIES  # noqa: E402
from dwh_with_dask_spark.session import get_spark  # noqa: E402


def jobs_after(spark, t0_ms: float) -> list[dict]:
    store = spark.sparkContext._jsc.sc().statusStore()
    lst = store.jobsList(None)
    out = []
    for i in range(lst.size()):
        j = lst.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()
        if sub.isEmpty():
            continue
        sub_ms = sub.get().getTime()
        if sub_ms < t0_ms:
            continue
        comp_ms = comp.get().getTime() if not comp.isEmpty() else None
        out.append(
            {
                "id": j.jobId(),
                "desc": (j.description().get() if not j.description().isEmpty() else j.name())[:90],
                "sub": sub_ms,
                "comp": comp_ms,
                "stages": j.stageIds().size(),
                "tasks": j.numTasks(),
            }
        )
    return sorted(out, key=lambda r: r["sub"])


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"job_timeline_{name}")
    fn = QUERIES[name]
    materialize(fn(spark, sf_dir))  # warmup
    jvm_gc(spark)
    for _ in range(runs):
        t0 = time.time() * 1000
        tw0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        wall = time.perf_counter() - tw0
        time.sleep(0.3)  # let the listener bus drain
        jobs = jobs_after(spark, t0 - 5)
        print(f"\n{name}: wall={wall:.3f}s, {len(jobs)} jobs")
        prev_end = t0
        tot_job, tot_gap = 0.0, 0.0
        for j in jobs:
            dur = (j["comp"] - j["sub"]) / 1000 if j["comp"] else float("nan")
            gap = (j["sub"] - prev_end) / 1000
            prev_end = j["comp"] or j["sub"]
            tot_job += dur if dur == dur else 0
            tot_gap += gap
            print(
                f"  job {j['id']:4d}  dur={dur:7.3f}s gap={gap:7.3f}s "
                f"stages={j['stages']:2d} tasks={j['tasks']:4d}  {j['desc']}"
            )
        tail = (t0 + wall * 1000 - prev_end) / 1000
        print(f"  sum(job)={tot_job:.3f}s sum(gap)={tot_gap:.3f}s tail={tail:.3f}s")
        jvm_gc(spark)
    spark.stop()


if __name__ == "__main__":
    main()

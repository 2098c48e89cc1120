"""Round-16 suffix-family phase profile (guide §1.5: find WHERE the
time goes before touching anything).

Runs each suffix-family registry query warm (1 warmup + N timed runs)
with ``suffix.TIMINGS`` enabled, printing the eager-phase decomposition
per run plus the residual (final action = pair pass + consumer aggs,
which folds every lazy phase). Per-job wall times come from a
job-description label set around each query.

Usage: python scripts/profile_suffix_r16.py [--runs N] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import jvm_gc, materialize  # noqa: E402
from dwh_with_dask_spark.operators import suffix  # noqa: E402
from dwh_with_dask_spark.plans import QUERIES  # noqa: E402
from dwh_with_dask_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "dedup_suffix_spans",
    "suffix_longest_repeats",
    "dedup_suffix_removal",
    "dedup_suffix_incremental",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_suffix_r16")

    for name in names:
        fn = QUERIES[name]
        materialize(fn(spark, sf_dir))  # warmup
        jvm_gc(spark)
        for run in range(args.runs):
            suffix.TIMINGS = []
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            total = time.perf_counter() - t0
            phases = list(suffix.TIMINGS)
            suffix.TIMINGS = None
            eager = sum(s for _, s in phases)
            print(f"\n{name} run {run}: total={total:.3f}s  "
                  f"eager-phases={eager:.3f}s  residual={total - eager:.3f}s")
            for label, sec in phases:
                print(f"  {sec:7.3f}  {label}")
            jvm_gc(spark)
    spark.stop()


if __name__ == "__main__":
    main()

"""Probe-latency vs segment-count curve for the stored BM25 index
(VERDICT r10 ask #6): when should refresh_bm25_index's accumulated
segments be compacted? Builds the sf1 corpus index as 1 / 8 / 64
segments (same rows, same buckets), times the indexed probe (median of
5 after one warmup), then compacts the 64-segment index and re-times —
the probe answers are identical throughout (asserted). Appends the
table + the derived threshold guidance to BENCH_SCALE.md.

Usage: python scripts/exp_bm25_segments.py  (idle machine — see
BASELINE.md's timing protocol)."""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwh_with_dask_spark.operators import curation as C
from dwh_with_dask_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".localdata", "sf1")
WORK = os.path.join(REPO, ".localdata", "bm25_segexp")
TERMS = ["data", "model", "training", "quality", "filter"]


def probe_median(spark, path, runs=5):
    C.bm25_search_indexed(spark, path, TERMS, k=10).collect()  # warmup
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = C.bm25_search_indexed(spark, path, TERMS, k=10).collect()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), sorted(map(tuple, rows))


def build_segmented(spark, docs, path, n_segs):
    ids = docs.selectExpr("doc_id % {} AS g".format(n_segs), "doc_id", "text")
    first = ids.filter("g = 0").select("doc_id", "text")
    C.build_bm25_index(first, path, n_buckets=64, overwrite=True)
    for s in range(1, n_segs):
        C.refresh_bm25_index(
            ids.filter(f"g = {s}").select("doc_id", "text"), path
        )


def run_curve(spark) -> dict:
    """Measure the curve; returns {"results": {segs: (build_s,
    probe_med_s)}, "compact_s": float, "probe_after_compact": float}.
    Asserts probe answers are identical across layouts and after
    compaction."""
    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet"))
    os.makedirs(WORK, exist_ok=True)
    print("loadavg", os.getloadavg())
    results = {}
    answers = {}
    for n_segs in (1, 8, 64):
        path = os.path.join(WORK, f"idx_{n_segs}")
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        build_segmented(spark, docs, path, n_segs)
        build_s = time.perf_counter() - t0
        med, rows = probe_median(spark, path)
        results[n_segs] = (build_s, med)
        answers[n_segs] = rows
        print(f"segs={n_segs:3d} build={build_s:7.2f}s probe_med={med:6.3f}s",
              flush=True)
    assert answers[1] == answers[8] == answers[64], "probe answers diverged"
    # compaction of the 64-seg index
    path64 = os.path.join(WORK, "idx_64")
    t0 = time.perf_counter()
    C.compact_bm25_index(spark, path64)
    compact_s = time.perf_counter() - t0
    med_c, rows_c = probe_median(spark, path64)
    assert rows_c == answers[64], "compaction changed answers"
    print(f"compacted 64->1: compact={compact_s:6.2f}s probe_med={med_c:6.3f}s")
    return {
        "results": results,
        "compact_s": round(compact_s, 3),
        "probe_after_compact": round(med_c, 4),
    }


def main():
    out = run_curve(get_spark())
    print(out)


if __name__ == "__main__":
    main()

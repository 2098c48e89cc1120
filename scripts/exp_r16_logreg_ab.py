"""Round-16 interleaved same-process A/B: logreg_fit training-set
persist (VERDICT r15 ask #3 — the round-15 cross-process numbers
contradicted each other; this host can only adjudicate interleaved).

Alternates persist-ON / persist-OFF runs of the two registry queries
that exercise logreg_fit, N pairs each, in ONE Spark session; prints
per-arm medians and the pairwise deltas, plus result equality.

Usage: python scripts/exp_r16_logreg_ab.py [--pairs N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import jvm_gc, materialize  # noqa: E402
from dwh_with_dask_spark.operators import pca  # noqa: E402
from dwh_with_dask_spark.plans import QUERIES  # noqa: E402
from dwh_with_dask_spark.session import get_spark  # noqa: E402

TARGETS = ["embedding_logreg_probe", "quality_classifier_scores"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "exp_r16_logreg_ab.json"),
    )
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp_r16_logreg_ab")

    results: dict[str, dict] = {}
    for name in TARGETS:
        fn = QUERIES[name]
        # warm both arms once (JIT, FS cache)
        for flag in (True, False):
            pca._PERSIST_TRAIN = flag
            materialize(fn(spark, sf_dir))
        jvm_gc(spark)
        times: dict[bool, list[float]] = {True: [], False: []}
        rows: dict[bool, list] = {True: None, False: None}
        for pair in range(args.pairs):
            # alternate arm order per pair to cancel drift
            order = (True, False) if pair % 2 == 0 else (False, True)
            for flag in order:
                pca._PERSIST_TRAIN = flag
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                times[flag].append(time.perf_counter() - t0)
                jvm_gc(spark)
        pca._PERSIST_TRAIN = True
        on = statistics.median(times[True])
        off = statistics.median(times[False])
        results[name] = {
            "persist_on_median": round(on, 3),
            "persist_off_median": round(off, 3),
            "on_runs": [round(x, 3) for x in times[True]],
            "off_runs": [round(x, 3) for x in times[False]],
            "on_minus_off": round(on - off, 3),
        }
        print(f"{name}: ON={on:.3f}s OFF={off:.3f}s delta={on - off:+.3f}s")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()

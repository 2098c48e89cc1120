"""Round-15 A/B: tfidf_cosine_pairs inverted-index vs blocked GEMM.

The registry sweep (scripts/registry_sweep_r15_baseline.txt) put
dedup_tfidf_cosine at 40.1 s — 2x the next-worst query — because the
driver corpus has a 31-token vocabulary: every token's df ≈ 3.7k, so
the inverted-index self-join materializes sum(df²) ≈ 4.5e8 rows where
all-pairs is only n² = 2.5e7. This measures the blocked-GEMM path and
asserts full row equivalence (both impls, plus the auto dispatch) on
sf0.1 and sf0.01.

Usage: python scripts/exp_r15_tfidf_blocked.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwh_with_dask_spark.operators.dedup import tfidf_cosine_pairs
from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def release(df):
    if hasattr(df, "cache_scope"):
        df.cache_scope.release()


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="exp_r15_tfidf")

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load_table(spark, sf, "documents")
        outs = {}
        for strat in ("index", "blocked", "auto"):
            df = tfidf_cosine_pairs(docs, threshold=0.88, strategy=strat)
            outs[strat] = df.orderBy("id_a", "id_b").collect()
            release(df)
        assert outs["index"] == outs["blocked"], f"{sf}: blocked differs"
        assert outs["index"] == outs["auto"], f"{sf}: auto differs"
        print(f"{sf}: equivalence OK over {len(outs['index'])} rows", flush=True)

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    for strat in ("blocked", "auto", "index"):
        xs = []
        df = tfidf_cosine_pairs(docs, threshold=0.88, strategy=strat)
        noop(df)
        release(df)
        spark.sparkContext._jvm.System.gc()
        for _ in range(runs):
            df = tfidf_cosine_pairs(docs, threshold=0.88, strategy=strat)
            t0 = time.perf_counter()
            noop(df)
            xs.append(time.perf_counter() - t0)
            release(df)
        print(
            f"sf0.1 {strat}: median={statistics.median(xs):.3f}s "
            f"min={min(xs):.3f} max={max(xs):.3f}",
            flush=True,
        )
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()

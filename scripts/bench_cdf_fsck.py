"""Scale legs for the round-15 warehouse additions.

1. **Change-data-feed read amplification** (read_changes vs full
   snapshot_diff): versioned orders at sf1/sf10 split into 10 dirs; one
   dir-granular merge touches 1 dir. The CDF claim is cost ∝ affected
   dirs + batch, never 2x the table — measure both paths producing the
   IDENTICAL diff.
2. **Deep fsck wall time** at sf1/sf10: footer + sentinel reads only,
   no data columns.

Usage: python scripts/bench_cdf_fsck.py [sf1|sf10|both]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = 3


def main():
    from pyspark.sql import SparkSession, functions as F

    from dwh_with_dask_spark.operators.scd import snapshot_diff
    from dwh_with_dask_spark.versioned import (
        fsck,
        read_changes,
        read_version,
        versioned_commit,
        versioned_merge,
    )

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    sfs = ["sf1", "sf10"] if which == "both" else [which]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    for sf in sfs:
        src = os.path.join(REPO, ".localdata", sf, "orders.parquet")
        t = f"/tmp/cdf_bench_{sf}"
        shutil.rmtree(t, ignore_errors=True)
        orders = spark.read.parquet(src).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        # 10 key-range dirs (time/tenant-partitioned append shape)
        hi = orders.agg(F.max("o_orderkey")).first()[0]
        step = hi // 10 + 1
        for i in range(10):
            versioned_commit(
                orders.filter(
                    (F.col("o_orderkey") >= i * step)
                    & (F.col("o_orderkey") < (i + 1) * step)
                ),
                t,
                mode="append" if i else "overwrite",
                stats_cols=["o_orderkey"],
            )
        # one merge touching only dir 0's key range
        batch = (
            orders.filter(F.col("o_orderkey") < step)
            .limit(20000)
            .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
        )
        rep = versioned_merge(
            spark, t, batch, ["o_orderkey"], prune={"o_orderkey": (0, step)}
        )
        assert rep["dirs_rewritten"] == 1, rep
        v_from, v_to = rep["version"] - 1, rep["version"]

        def timed(fn):
            ts = []
            out = None
            for _ in range(RUNS):
                t0 = time.time()
                out = fn()
                ts.append(time.time() - t0)
                spark.sparkContext._jvm.System.gc()
            return statistics.median(ts), out

        def cdf():
            return sorted(
                tuple(r)
                for r in read_changes(
                    spark, t, v_from, v_to, ["o_orderkey"]
                ).collect()
            )

        def full():
            return sorted(
                tuple(r)
                for r in snapshot_diff(
                    read_version(spark, t, version=v_from),
                    read_version(spark, t, version=v_to),
                    ["o_orderkey"],
                ).collect()
            )

        t_cdf, r_cdf = timed(cdf)
        t_full, r_full = timed(full)
        assert r_cdf == r_full, f"{sf}: CDF != full snapshot diff"
        print(
            f"{sf}: read_changes {t_cdf:.3f}s vs full snapshot_diff "
            f"{t_full:.3f}s ({len(r_cdf)} change rows, identical)",
            flush=True,
        )

        t0 = time.time()
        rep = fsck(t, deep=True)
        td = time.time() - t0
        assert rep["ok"], rep["errors"][:3]
        nfiles = sum(
            len(files)
            for _, _, files in os.walk(os.path.join(t, "data"))
        )
        print(f"{sf}: fsck deep over {nfiles} files: {td:.3f}s", flush=True)
        shutil.rmtree(t, ignore_errors=True)


if __name__ == "__main__":
    main()

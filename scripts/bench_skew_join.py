"""Skew-join evidence at scale (VERDICT r14 ask #3).

The bench corpora carry uniform orderkeys, so the engine's two skew
remedies — AQE's runtime skew split (on by default in the session
factory) and ``operators.joins.salted_join`` — were plan-tested but
never MEASURED against a realistically skewed key. This script joins
the Zipf-skewed lineitem fixture (``gen_scale_data.py --skew-join``;
hottest orderkey holds ~13% of all rows) against orders (one row per
key) three ways and times them:

- plain:  sort-merge join, AQE skew split DISABLED — the hot key's
          entire row set lands in one task (the 100 TB hazard).
- aqe:    skew split ENABLED. The governing thresholds
          (skewedPartitionThresholdInBytes=256MB default, factor 5)
          are sized for production partitions; at local sf1/sf10 the
          hot partition is ~25/250 MB, so the thresholds are scaled
          DOWN with the data (8MB/factor 2) — at 100 TB the hot
          partition passes the production thresholds naturally.
- salted: ``salted_join(salt=32)``, skew split disabled — the manual
          remedy for paths AQE doesn't cover.

All variants must produce identical aggregates (asserted); the aqe
leg must show the skew split in its FINAL adaptive plan (asserted).

Usage: python scripts/bench_skew_join.py [sf1|sf10|both]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = 3


def build_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def run_variant(spark, fixture: str, src: str, variant: str):
    from pyspark.sql import functions as F

    from dwh_with_dask_spark.operators.joins import salted_join

    confs = {
        # broadcast would dodge the skew entirely (and IS the right
        # first answer when the dim fits — this bench is about when
        # it doesn't)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": (
            "true" if variant == "aqe" else "false"
        ),
        # thresholds scaled down with the local data (see module doc)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
    }
    for k, v in confs.items():
        spark.conf.set(k, v)

    def build():
        # fresh reads per run: Spark reuses shuffle stages for repeated
        # actions on the SAME DataFrame lineage (runs 2..n would skip
        # every exchange and time only the final stage) — a new lineage
        # forces real execution each run
        li = spark.read.parquet(f"{fixture}/lineitem_skew.parquet")
        orders = spark.read.parquet(f"{src}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        if variant == "salted":
            joined = salted_join(
                li, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
                on="l_orderkey", salt=32,
            )
        else:
            joined = li.join(
                orders, li.l_orderkey == orders.o_orderkey, "inner"
            )
        return joined.groupBy("l_returnflag", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("rev"),
        )

    times, result, agg = [], None, None
    for _ in range(RUNS):
        agg = build()
        t0 = time.time()
        rows = agg.collect()
        times.append(time.time() - t0)
        result = sorted(
            (r.l_returnflag, r.o_orderpriority, r.n, float(r.rev))
            for r in rows
        )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    if variant == "aqe":
        assert "isFinalPlan=true" in plan
        assert "skew" in plan.lower(), (
            "AQE leg did not split the skewed partition:\n" + plan[:3000]
        )
        print("  aqe: skew split CONFIRMED in final plan", flush=True)
    spark.sparkContext._jvm.System.gc()
    return statistics.median(times), result


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    sfs = ["sf1", "sf10"] if which == "both" else [which]
    spark = build_session()
    for sf in sfs:
        fixture = os.path.join(REPO, ".localdata", f"skewjoin_{sf}")
        src = os.path.join(REPO, ".localdata", sf)
        if not os.path.isdir(fixture):
            print(f"{sf}: fixture missing — run gen_scale_data.py --skew-join")
            continue
        results = {}
        for variant in ("plain", "aqe", "salted"):
            sec, res = run_variant(spark, fixture, src, variant)
            results[variant] = (sec, res)
            print(f"{sf} {variant}: {sec:.3f}s", flush=True)
        vals = [r for _, r in results.values()]
        for other in vals[1:]:
            assert len(other) == len(vals[0]), f"{sf}: row counts differ"
            for x, y in zip(vals[0], other):
                # counts/keys exact; the double revenue sum is order-
                # dependent across plans — last-cent tolerance
                assert x[:3] == y[:3], f"{sf}: {x} vs {y}"
                assert abs(x[3] - y[3]) <= 0.05, f"{sf}: {x} vs {y}"
        print(f"{sf}: all three variants value-identical "
              f"({len(vals[0])} agg rows; revenue to the cent)", flush=True)


if __name__ == "__main__":
    main()

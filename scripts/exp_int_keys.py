"""Round-6 experiment (VERDICT r5 ask #1): does keying the token
aggregations on xxhash64 ints instead of term strings pay at sf1?

Variants measured over .localdata/sf1 documents (~30M token
occurrences), one warmup + median of 3, idle host required:

  floor      tokenize+explode, count(1)           — the scan+tokenize floor
  agg_str    groupBy(term).count()                — today's string agg
  agg_int    groupBy(xxhash64(term)).count()      — int agg, strings dropped
  hh_cur     heavy_hitters current (string keys)
  hh_int     int-keyed counts + min(term) carry
  hh_int2    int-keyed counts, strings recovered by a 2nd tokenize pass
             filtered to broadcast survivor hashes
  cms_cur    corpus_cms_counts current plan
  cms_int    same but every join keyed on xxhash64(term)

Prints one table; outcome documented in BENCH_SCALE.md either way.

MEASURED (2026-08-14, idle host, loadavg 0.65->1.23) — NEGATIVE result:

    floor        1.848 s   (tokenize+explode alone)
    agg_str      1.896 s   (string groupBy adds ~0.05 s over floor)
    agg_int      1.858 s   (int keys buy ~nothing)
    hh_cur       2.061 s
    hh_int       2.053 s   (min(term) carry: wash)
    hh_int2      2.126 s   (2nd-pass string recovery: LOSES)
    cms_cur      2.250 s
    cms_int      2.209 s

Conclusion: the VERDICT-r5 hypothesis (string-keyed shuffle is the
cost) is false at this scale — the tokenize FLOOR is the cost. That
redirected the round-6 work to the one-regex tokenizer
(exp_tokenize_floor.py), which cut the floor 42% and brought the whole
family under the 2x line without touching key types.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import jvm_gc, materialize
from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.operators.textstats import tokens
from dwh_with_dask_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".localdata", "sf1")


def timed(spark, build, runs=3):
    build().count() if False else materialize(build())  # warmup
    jvm_gc(spark)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(build())
        ts.append(time.perf_counter() - t0)
        jvm_gc(spark)
    return statistics.median(ts)


def main():
    spark = get_spark()
    d = load_table(spark, SF1, "documents")
    par = spark.sparkContext.defaultParallelism

    def base():
        return (
            d.select(tokens("text").alias("__toks"))
            .repartition(par)
            .select(F.explode("__toks").alias("term"))
        )

    def floor():
        return base().agg(F.count(F.lit(1)).alias("n"))

    def agg_str():
        return base().groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))

    def agg_int():
        return (
            base()
            .select(F.xxhash64("term").alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def hh_cur():
        from dwh_with_dask_spark.operators.sketches import heavy_hitters

        return heavy_hitters(base(), "term", 0.0335)

    def hh_int():
        c = (
            base()
            .groupBy(F.xxhash64("term").alias("h"))
            .agg(F.count(F.lit(1)).alias("cnt"), F.min("term").alias("term"))
        )
        total = c.agg(F.sum("cnt").alias("__total"))
        return (
            c.crossJoin(F.broadcast(total))
            .withColumn("share", F.col("cnt") / F.col("__total"))
            .filter(F.col("share") >= 0.0335)
            .select("term", "cnt", "share")
        )

    def hh_int2():
        c = (
            base()
            .select(F.xxhash64("term").alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        total = c.agg(F.sum("cnt").alias("__total"))
        surv = (
            c.crossJoin(F.broadcast(total))
            .withColumn("share", F.col("cnt") / F.col("__total"))
            .filter(F.col("share") >= 0.0335)
        )
        names = (
            base()
            .select("term", F.xxhash64("term").alias("h"))
            .join(F.broadcast(surv.select("h")), "h", "left_semi")
            .distinct()
        )
        return names.join(F.broadcast(surv), "h").select("term", "cnt", "share")

    def cms_cur():
        from dwh_with_dask_spark.operators.sketches import (
            cms_build_from_counts,
            cms_estimate,
        )

        exact = base().groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        sketch = cms_build_from_counts(exact, "term", "cnt", depth=4, width=64)
        est = cms_estimate(sketch, exact.select("term"), "term", depth=4, width=64)
        return exact.join(est, "term").select("term", "cnt", "cms_est")

    def cms_int():
        from dwh_with_dask_spark.operators.sketches import _cell

        exact = (
            base()
            .groupBy(F.xxhash64("term").alias("h"))
            .agg(F.count(F.lit(1)).alias("cnt"), F.min("term").alias("term"))
        )
        k = F.col("term").cast("string")
        cells = F.array(
            *[
                F.struct(F.lit(r).alias("row"), _cell(k, r, 64, "cms").alias("cell"))
                for r in range(4)
            ]
        )
        sketch = (
            exact.select(F.explode(cells).alias("__c"), F.col("cnt"))
            .groupBy(F.col("__c.row").alias("row"), F.col("__c.cell").alias("cell"))
            .agg(F.sum("cnt").alias("total"))
        )
        probes = exact.select("h", "term", "cnt", F.explode(cells).alias("__c")).select(
            "h", "term", "cnt",
            F.col("__c.row").alias("row"), F.col("__c.cell").alias("cell"),
        )
        return (
            probes.join(F.broadcast(sketch), ["row", "cell"])
            .groupBy("h", "term", "cnt")
            .agg(F.min("total").alias("cms_est"))
            .select("term", "cnt", "cms_est")
        )

    load0 = open("/proc/loadavg").read().split()[0]
    out = {}
    for name, fn in [
        ("floor", floor), ("agg_str", agg_str), ("agg_int", agg_int),
        ("hh_cur", hh_cur), ("hh_int", hh_int), ("hh_int2", hh_int2),
        ("cms_cur", cms_cur), ("cms_int", cms_int),
    ]:
        out[name] = timed(spark, fn)
        print(f"{name:10s} {out[name]:7.3f} s", flush=True)
    load1 = open("/proc/loadavg").read().split()[0]
    print(f"loadavg {load0} -> {load1}")


if __name__ == "__main__":
    main()

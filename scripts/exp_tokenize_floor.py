"""Round-6 experiment part 2: the token family's cost is the tokenize
floor (exp_int_keys.py: floor 1.85 s of hh_cur 2.06 s). Decompose it:

  scan        count(1) over raw text (scan only)
  scan_norep  tokenize floor WITHOUT the repartition barrier
  floor_cur   repartition + normalize_text (regexp_replace) + split(' ')
  floor_1re   repartition + split(lower, '\\s+') + filter '' — ONE regex
  floor_1re_n no repartition, one-regex tokenize
  hh_1re      heavy hitters over the one-regex tokenize

MEASURED (2026-08-14, idle host) — ADOPTED engine-wide as
dedup.text_tokens:

    scan          0.152 s   (raw text count)
    floor_cur     1.238 s   (normalize_text 2-regex + split)
    scan_norep    1.420 s   (2-partition scan: repartition IS needed)
    floor_1re     0.724 s   (ONE regex pass: -42%)
    floor_1re_n   0.984 s
    hh_1re        1.228 s   (heavy hitters, was ~2.06 s)

sf1 query ratios vs DuckDB after adoption: heavy_hitters 2.70x->0.94x,
cms 3.21x->1.25x, oov 2.24x->0.74x, bm25 1.50x->0.35x.
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
    materialize(build())
    jvm_gc(spark)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(build())
        ts.append(time.perf_counter() - t0)
        jvm_gc(spark)
    return statistics.median(ts)


def fast_tokens(col):
    return F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda t: t != "")


def main():
    spark = get_spark()
    d = load_table(spark, SF1, "documents")
    par = spark.sparkContext.defaultParallelism
    print("scan partitions:", d.rdd.getNumPartitions(), flush=True)

    def scan():
        return d.agg(F.count("text"))

    def floor_of(tok, repart):
        src = d.repartition(par) if repart else d
        return (
            src.select(tok.alias("__toks"))
            .select(F.explode("__toks").alias("term"))
            .agg(F.count(F.lit(1)))
        )

    def hh_1re():
        from dwh_with_dask_spark.operators.sketches import heavy_hitters

        base = (
            d.repartition(par)
            .select(fast_tokens("text").alias("__toks"))
            .select(F.explode("__toks").alias("term"))
        )
        return heavy_hitters(base, "term", 0.0335)

    load0 = open("/proc/loadavg").read().split()[0]
    for name, fn in [
        ("scan", scan),
        ("floor_cur", lambda: floor_of(tokens("text"), True)),
        ("scan_norep", lambda: floor_of(tokens("text"), False)),
        ("floor_1re", lambda: floor_of(fast_tokens("text"), True)),
        ("floor_1re_n", lambda: floor_of(fast_tokens("text"), False)),
        ("hh_1re", hh_1re),
    ]:
        print(f"{name:12s} {timed(spark, fn):7.3f} s", flush=True)
    print("loadavg", load0, "->", open("/proc/loadavg").read().split()[0])


if __name__ == "__main__":
    main()

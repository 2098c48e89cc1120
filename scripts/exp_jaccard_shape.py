"""Round-7 experiment: bisect/fix the sf0.1 exact-Jaccard regression.

VERDICT r6 measured HEAD's `_doc_shingles` (widen RAW text below the
tokenize + no-shuffle coalesce barrier above it) at 1.34/1.77 s
(uncapped/capped) vs the round-5 shape (tokenize BELOW one exchange
that carries the token arrays) at 0.87/1.19 s, and bisected the
difference to the restructure, not the tokenizer or the barrier
mechanism alone. This script times both shapes (plus the unconditional
round-5 original as a control) on the REAL registry queries at sf0.1,
bench.py protocol (noop sink, 1 warmup + N timed, inter-trial GC).

Run:  python scripts/exp_jaccard_shape.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dwh_with_dask_spark.operators import dedup as D
from dwh_with_dask_spark.operators.partitioning import barrier, widen
from dwh_with_dask_spark.plans import QUERIES
from dwh_with_dask_spark.session import get_spark


def shape_head(df, id_col, text_col, n):
    """Round-6 HEAD: widen raw text, tokenize above, coalesce barrier."""
    toks_df = barrier(
        widen(df.select(id_col, text_col), id_col).select(
            F.col(id_col).alias("id"),
            D.text_tokens(text_col).alias("__toks"),
        )
    )
    return (
        toks_df.select(
            "id", F.explode(D._grams_from_tokens(F.col("__toks"), n)).alias("shingle")
        ).distinct()
    )


def shape_r5_conditional(df, id_col, text_col, n):
    """Verdict-prescribed fix: tokenize BELOW a conditional exchange that
    carries the token arrays (widen keeps its wide-scan no-op path)."""
    toks = df.select(
        F.col(id_col).alias("id"), D.text_tokens(text_col).alias("__toks")
    )
    toks_df = widen(toks, "id")
    return (
        toks_df.select(
            "id", F.explode(D._grams_from_tokens(F.col("__toks"), n)).alias("shingle")
        ).distinct()
    )


def shape_r5_unconditional(df, id_col, text_col, n):
    """Round-5 original: unconditional repartition of __toks (control)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    toks = df.select(
        F.col(id_col).alias("id"), D.text_tokens(text_col).alias("__toks")
    )
    toks_df = toks.repartition(par, "id")
    return (
        toks_df.select(
            "id", F.explode(D._grams_from_tokens(F.col("__toks"), n)).alias("shingle")
        ).distinct()
    )


SHAPES = {
    "head_r6": shape_head,
    "r5_conditional_widen": shape_r5_conditional,
    "r5_unconditional": shape_r5_unconditional,
}

QUERY_NAMES = ["dedup_ngram_jaccard", "dedup_ngram_jaccard_capped"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="exp_jaccard_shape")
    gc = spark.sparkContext._jvm.System.gc

    for shape_name, fn in SHAPES.items():
        D._doc_shingles = fn  # type: ignore[assignment]
        for qname in QUERY_NAMES:
            q = QUERIES[qname]
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
            gc()
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            gc()
            print(
                f"{shape_name:24s} {qname:28s} "
                f"median={statistics.median(ts):.3f}s "
                f"min={min(ts):.3f} max={max(ts):.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()

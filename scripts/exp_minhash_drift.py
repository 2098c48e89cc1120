"""Round-8 experiment: settle the dedup_minhash_lsh sf0.1 drift
(VERDICT r7 ask #4 / watch item: 0.906 re-baseline -> 0.952 r6 ->
1.048 r7, +16% across rounds with MAD ~0.025).

MinHash shares `_doc_shingles` with the Jaccard family, and that
helper's plan shape changed in BOTH drift rounds (round 6: widen raw
text + coalesce barrier; round 7: tokenize below a conditional widen
of the token arrays). The Jaccard A/B (`exp_jaccard_shape.py`) showed
those shapes differ 2x for the exploded-shingle distinct; minhash's
downstream is a groupBy("id") instead, so the question is whether the
round-7 shape costs IT anything. Same methodology: monkeypatch the
three shapes into the REAL registry query at sf0.1, bench.py protocol
(noop sink, 1 warmup + N timed, inter-trial GC), plus an executed-plan
exchange count per shape so a timing delta has a mechanism or is
declared noise.

Run:  python scripts/exp_minhash_drift.py [sf_dir] [runs]
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


def shape_r6(df, id_col, text_col, n):
    """Round-6: widen raw text, tokenize above, coalesce barrier."""
    toks_df = barrier(
        widen(df.select(id_col, text_col), id_col).select(
            F.col(id_col).alias("id"),
            D.text_tokens(text_col).alias("__toks"),
        )
    )
    return (
        toks_df.select(
            "id",
            F.explode(D._grams_from_tokens(F.col("__toks"), n)).alias(
                "shingle"
            ),
        ).distinct()
    )


def shape_r7_head(df, id_col, text_col, n):
    """Round-7 HEAD: tokenize below one conditional widen of __toks."""
    toks = df.select(
        F.col(id_col).alias("id"), D.text_tokens(text_col).alias("__toks")
    )
    toks_df = widen(toks, "id")
    return (
        toks_df.select(
            "id",
            F.explode(D._grams_from_tokens(F.col("__toks"), n)).alias(
                "shingle"
            ),
        ).distinct()
    )


def shape_r5(df, id_col, text_col, n):
    """Round-5: unconditional repartition of __toks (the 0.906 shape)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    toks = df.select(
        F.col(id_col).alias("id"), D.text_tokens(text_col).alias("__toks")
    )
    toks_df = toks.repartition(par, "id")
    return (
        toks_df.select(
            "id",
            F.explode(D._grams_from_tokens(F.col("__toks"), n)).alias(
                "shingle"
            ),
        ).distinct()
    )


SHAPES = {
    "r5_unconditional": shape_r5,
    "r6_coalesce_barrier": shape_r6,
    "r7_head_widen_toks": shape_r7_head,
}

QNAME = "dedup_minhash_lsh"


def n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark(app_name="exp_minhash_drift")
    gc = spark.sparkContext._jvm.System.gc

    q = QUERIES[QNAME]
    for shape_name, fn in SHAPES.items():
        D._doc_shingles = fn  # type: ignore[assignment]
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        gc()
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        gc()
        med = statistics.median(ts)
        print(
            f"{shape_name:22s} {QNAME} median={med:.3f}s "
            f"min={min(ts):.3f} max={max(ts):.3f} "
            f"all={[round(t, 3) for t in sorted(ts)]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

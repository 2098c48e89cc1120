"""Round-15 A/B: bm25_scores' corpus-stats branch.

The before plan (plans/r15/text_bm25_top_terms_before.txt) shows TWO
full tokenize passes over the corpus: the scoring branch (scan 1) and
the stats branch (scan 14) each re-derive the (doc, term, dl, tf)
aggregate because column pruning makes the two subtrees canonically
different, so ReusedExchange never fires (bm25_scores docstring,
round 10). Variants:

  a) current      — duplicated tokenize subtree (baseline)
  b) barrier      — put a no-shuffle ``barrier`` ABOVE the tf aggregate
                    and derive both branches from it: ColumnPruning
                    cannot push a narrower Project below the
                    Repartition(shuffle=false) node, so the two
                    subtrees stay byte-identical below the exchange and
                    ReusedExchange fires → ONE tokenize pass, the stats
                    branch pays only a second reduce-side read.
  c) persist      — CacheScope-persist tf (round-10 measurement said
                    slower at sf1: 2.14 s vs 1.97 s; re-check here).

Equivalence: all variants compute identical rows (same aggregate, same
expressions) — asserted below by full-row comparison before timing.

Usage: python scripts/exp_r15_bm25_stats.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_with_dask_spark.operators.caching import CacheScope
from dwh_with_dask_spark.operators.curation import (
    _bm25_postings,
    _bm25_score_col,
    bm25_scores,
)
from dwh_with_dask_spark.operators.partitioning import barrier
from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.session import get_spark


def bm25_scores_barrier(docs, id_col="doc_id", text_col="text"):
    tf = barrier(_bm25_postings(docs, id_col, text_col))
    doclens = tf.groupBy(id_col).agg(F.sum("tf").alias("__ntf"))
    stats = doclens.select(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("__ntf").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    joined = tf.crossJoin(F.broadcast(stats))
    score = _bm25_score_col(1.2, 0.75, False)
    return joined.select(id_col, "term", "tf", "df", score.alias("score"))


def bm25_scores_persist(docs, id_col="doc_id", text_col="text"):
    scope = CacheScope()
    tf = scope.persist(_bm25_postings(docs, id_col, text_col))
    doclens = tf.groupBy(id_col).agg(F.sum("tf").alias("__ntf"))
    stats = doclens.select(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("__ntf").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    joined = tf.crossJoin(F.broadcast(stats))
    score = _bm25_score_col(1.2, 0.75, False)
    out = joined.select(id_col, "term", "tf", "df", score.alias("score"))
    out.cache_scope = scope
    return out


def top_terms(scored, k=3):
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("doc_id", "term", "tf", "df", "score", F.col("__rn").alias("rank"))
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp_r15_bm25")
    docs = load_table(spark, sf_dir, "documents")

    variants = {
        "a_current": lambda: top_terms(bm25_scores(docs)),
        "b_barrier": lambda: top_terms(bm25_scores_barrier(docs)),
        "c_persist": lambda: top_terms(bm25_scores_persist(docs)),
    }

    # Equivalence gate: identical sorted rows (IEEE-exact scores).
    base = variants["a_current"]().orderBy("doc_id", "rank").collect()
    for name in ("b_barrier", "c_persist"):
        df = variants[name]()
        got = df.orderBy("doc_id", "rank").collect()
        assert got == base, f"{name} rows differ!"
        if hasattr(df, "cache_scope"):
            df.cache_scope.release()
    print(f"equivalence OK over {len(base)} rows", flush=True)

    for name, make in variants.items():
        df = make()
        noop(df)  # warmup
        if hasattr(df, "cache_scope"):
            df.cache_scope.release()
        spark.sparkContext._jvm.System.gc()
        xs = []
        for _ in range(runs):
            df = make()
            t0 = time.perf_counter()
            noop(df)
            xs.append(time.perf_counter() - t0)
            if hasattr(df, "cache_scope"):
                df.cache_scope.release()
        print(
            f"{name}: median={statistics.median(xs):.3f}s "
            f"min={min(xs):.3f} max={max(xs):.3f}",
            flush=True,
        )
        spark.sparkContext._jvm.System.gc()

    # plan shape: count scans in each
    for name, make in variants.items():
        df = make()
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        print(
            f"{name}: scans={p.count('Scan parquet')} "
            f"exchanges={p.count(') Exchange')} "
            f"reused={p.count('ReusedExchange')}"
        )
        if hasattr(df, "cache_scope"):
            df.cache_scope.release()
    spark.stop()


if __name__ == "__main__":
    main()

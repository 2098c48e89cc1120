"""Round-15 A/B: duplicated subtrees in the shingle-pair operators.

The before plans (plans/r15/dedup_ngram_jaccard{,_capped}_before.txt)
show the ``sizes`` aggregate (groupBy(id).count over the persisted
shingle table) materialized TWICE (once per join side, Exchanges 46/55)
and — in the capped plan — the hot-shingle aggregate TWICE as well
(Exchanges 15/29): each alias-renamed consumer re-runs a full pass +
shuffle over the cached shingle table. Variants persist the tiny
aggregates (doc-count-sized / hot-set-sized) so each is computed once.

Usage: python scripts/exp_r15_jaccard_dup.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.caching import CacheScope, attach, scoped
from dwh_with_dask_spark.operators.dedup import _doc_shingles, ngram_jaccard_pairs
from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.session import get_spark


def jaccard_persist_small(
    df,
    id_col="doc_id",
    text_col="text",
    n=3,
    threshold=0.1,
    max_shingle_freq=None,
    scope=None,
):
    """ngram_jaccard_pairs with sizes (and the hot set) persisted."""
    scope, created = scoped(scope)
    sh = scope.persist(_doc_shingles(df, id_col, text_col, n))
    sizes = scope.persist(
        sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    )

    joinable = sh
    if max_shingle_freq is not None:
        hot = scope.persist(
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_freq)
            .select("shingle")
        )
        joinable = sh.join(F.broadcast(hot), "shingle", "left_anti")

    a = joinable.select(F.col("id").alias("id_a"), "shingle")
    b = joinable.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )
    return attach(out, scope, created)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def release(df):
    if hasattr(df, "cache_scope"):
        df.cache_scope.release()


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp_r15_jaccard")
    docs = load_table(spark, sf_dir, "documents")

    cases = {
        "uncapped_current": lambda: ngram_jaccard_pairs(docs, n=3, threshold=0.30),
        "uncapped_persist": lambda: jaccard_persist_small(
            docs, n=3, threshold=0.30
        ),
        "capped_current": lambda: ngram_jaccard_pairs(
            docs, n=3, threshold=0.30, max_shingle_freq=50
        ),
        "capped_persist": lambda: jaccard_persist_small(
            docs, n=3, threshold=0.30, max_shingle_freq=50
        ),
    }

    # Equivalence
    for pair in (("uncapped_current", "uncapped_persist"),
                 ("capped_current", "capped_persist")):
        a = cases[pair[0]]()
        b = cases[pair[1]]()
        ra = a.orderBy("id_a", "id_b").collect()
        rb = b.orderBy("id_a", "id_b").collect()
        assert ra == rb, f"{pair} rows differ"
        print(f"equivalence OK {pair[0]} vs {pair[1]} ({len(ra)} rows)")
        release(a)
        release(b)

    for name, make in cases.items():
        df = make()
        noop(df)
        release(df)
        spark.sparkContext._jvm.System.gc()
        xs = []
        for _ in range(runs):
            df = make()
            t0 = time.perf_counter()
            noop(df)
            xs.append(time.perf_counter() - t0)
            release(df)
        print(
            f"{name}: median={statistics.median(xs):.3f}s "
            f"min={min(xs):.3f} max={max(xs):.3f}",
            flush=True,
        )
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()

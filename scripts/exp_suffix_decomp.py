"""Fine-grained decomposition of the dedup_suffix_spans lazy phase at
sf1 — VERDICT r12 ask #1's evidence step. Breaks the 17.4 s lump
(pairs + rep agg + spans agg) into: pair materialization (forced
checkpoint), rep aggregate, span window+agg. Also prints corpus shape
(positions, docs, max_dl vs base) so the tail/no-tail branch is known.

Run: python scripts/exp_suffix_decomp.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dwh_with_dask_spark.catalog import load_table  # noqa: E402
from dwh_with_dask_spark.session import get_spark  # noqa: E402
from dwh_with_dask_spark.operators import suffix as SX  # noqa: E402

SF1_DIR = os.path.join(REPO, ".localdata", "sf1")


def main() -> None:
    spark = get_spark(app_name="exp_suffix_decomp")
    docs = load_table(spark, SF1_DIR, "documents")

    SX.TIMINGS = []
    t0 = time.perf_counter()
    scope, created = SX.scoped(None)
    sa, pairs = SX._sa_pairs(docs, "text", "doc_id", scope, min_rep=8)
    pairs_ck = pairs.localCheckpoint(eager=True)
    n_pairs_kept = pairs_ck.count()
    t_pairs = time.perf_counter() - t0
    print(f"[decomp] pairs materialized: {t_pairs:.2f}s "
          f"(kept={n_pairs_kept}, n_sa={getattr(sa, '_sa_count', '?')})")
    for lbl, sec in SX.TIMINGS:
        print(f"  [phase] {lbl}: {sec:.2f}s")
    SX.TIMINGS = None

    t0 = time.perf_counter()
    member = F.explode(
        F.array(
            F.struct(F.col("ida").alias("id"), F.col("posa").alias("pos"),
                     F.col("dla").alias("dl")),
            F.struct(F.col("idb").alias("id"), F.col("posb").alias("pos"),
                     F.col("dlb").alias("dl")),
        )
    )
    lcp_cl = F.least(
        F.col("lcp"), F.col("dla") - F.col("posa"), F.col("dlb") - F.col("posb")
    )
    rep = (
        pairs_ck.withColumn("lcp", lcp_cl)
        .select(member.alias("m"), "lcp")
        .groupBy("m.id", "m.pos", "m.dl")
        .agg(F.max("lcp").alias("rep"))
        .filter(F.col("rep") >= 8)
    )
    rep_ck = rep.localCheckpoint(eager=True)
    n_rep = rep_ck.count()
    t_rep = time.perf_counter() - t0
    print(f"[decomp] rep aggregate: {t_rep:.2f}s (rows={n_rep})")

    from pyspark.sql import Window
    t0 = time.perf_counter()
    prev = (
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("pos") + F.col("rep")
    contrib = F.greatest(
        F.lit(0).cast("long"),
        end - F.greatest(F.col("pos"), F.coalesce(F.max(end).over(prev), F.lit(0))),
    )
    out = (
        rep_ck.withColumn("__c", contrib)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"),
             F.sum("__c").alias("dup_tokens"))
    )
    n_out = out.count()
    t_span = time.perf_counter() - t0
    print(f"[decomp] span window+agg: {t_span:.2f}s (docs={n_out})")
    print(f"[decomp] TOTAL lazy-equivalent: {t_pairs + t_rep + t_span:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()

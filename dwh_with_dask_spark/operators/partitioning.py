"""Scale-conditional repartitioning (round-6, VERDICT r5 ask #5).

The text operators historically opened with an unconditional
``repartition(defaultParallelism)``: locally load-bearing (a
single-file corpus scans as 2 partitions on 32 cores; the exchange
also acted as a projection barrier against higher-order-lambda
re-inlining), but on a real cluster whose scan already yields
thousands of splits it is an extra full shuffle of document text —
the most expensive bytes in the pipeline.

``widen`` keeps the local fix and drops the cluster cost: it only
repartitions when the incoming partition count is BELOW the session's
default parallelism. When the source is already wide, the exchange's
OTHER measured role — a projection barrier that stops Catalyst from
re-inlining the expensive tokenize expression into per-element lambdas
(O(len²)) or into the post-Generate projection (re-tokenize per
emitted token) — is covered by ``barrier``: a narrow same-count
``coalesce``, which leaves a Repartition(shuffle=false) node in the
logical plan that Project collapsing cannot cross, at zero runtime
cost (CoalesceExec with n >= child partitions passes partitions
through unchanged).

Cost note: ``df.rdd.getNumPartitions()`` converts the logical plan to
an RDD to read its partitioning — planning-time work only (no job
runs), a few ms per query on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def widen(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` (hash-partitioned on
    ``cols`` when given) ONLY if it currently has fewer partitions;
    otherwise a free no-shuffle ``barrier`` (see module docstring).

    The drop-in replacement for the old unconditional
    ``repartition(defaultParallelism, ...)`` barriers: identical plan
    on narrow local scans, no text shuffle on a cluster whose scan is
    already thousands of splits (asserted by tests/test_plans.py)."""
    if df.isStreaming:
        # a stream has no inspectable partitioning (df.rdd throws);
        # micro-batch parallelism is the source's concern
        return df
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    if n >= par:
        return barrier(df, n)
    keys = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.repartition(par, *keys) if keys else df.repartition(par)


def barrier(df: DataFrame, n: int | None = None) -> DataFrame:
    """No-shuffle projection barrier: narrow coalesce to the current
    partition count. Blocks CollapseProject/ColumnPruning from inlining
    expressions bound below it into lambdas or post-Generate projects
    above it; adds no exchange and moves no rows. Streaming frames pass
    through untouched (no inspectable partitioning)."""
    if df.isStreaming:
        return df
    return df.coalesce(n if n is not None else df.rdd.getNumPartitions())

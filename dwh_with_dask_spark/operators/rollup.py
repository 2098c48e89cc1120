"""Hypertable-style multi-resolution time rollup.

North-star addition (SURVEY.md §2B): the continuous-aggregate /
hypertable-rollup pattern of time-series stores, re-expressed for
Spark's execution model.

The scale-correct shape is CASCADED re-aggregation, not grouping sets:
an expand-based GROUPING SETS over (minute, hour, day) replicates every
input row once per granularity before the shuffle (3x the scan exiting
the map side), while sum/count/min/max are re-aggregable, so only the
finest level ever needs to see raw rows. We aggregate to minute once
(the single data-sized shuffle), then fold minute partials into hour
and hour into day — each a shuffle over bucket-cardinality rows,
negligible at any corpus size. Catalyst's ReuseExchange recognizes the
shared minute-level aggregate across the union branches, so the fact
table is scanned and shuffled exactly once.

Sums are carried as DECIMAL partials (exact, order-independent — the
repo's dsum idiom) and cast to double only on output, so cascaded
re-aggregation is bit-identical to a direct group-by at every level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Finest-to-coarsest; each level folds from the previous one.
LEVELS = ("minute", "hour", "day")


def minute_partials(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    level: str = LEVELS[0],
) -> DataFrame:
    """The finest-level re-aggregable partials: (bucket, *keys, __n,
    __sdec, __mn, __mx). The ONLY data-sized aggregation of the rollup;
    also the exact shape the streaming leg appends per finalized window
    (streaming/events.py:minute_rollup_stream)."""
    keys = [F.col(k) for k in key_cols]
    return df.groupBy(
        F.date_trunc(level, F.col(ts_col)).alias("bucket"), *keys
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(23,6)")).alias("__sdec"),
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
    )


def cascade_from_partials(
    finest: DataFrame,
    key_cols: tuple[str, ...] = ("event_type",),
    levels: tuple[str, ...] = LEVELS,
) -> DataFrame:
    """Fold finest-level partials into every granularity in ``levels``
    (finest first). Works identically over a freshly computed aggregate
    (hypertable_rollup) or a streamed/stored minute-partials table —
    the continuous-aggregate read path."""
    keys = [F.col(k) for k in key_cols]

    def out(level_df: DataFrame, level: str) -> DataFrame:
        return level_df.select(
            F.lit(level).alias("level"),
            "bucket",
            *key_cols,
            F.col("__n").cast("long").alias("n_events"),
            F.col("__sdec").cast("double").alias("sum_value"),
            F.col("__mn").alias("min_value"),
            F.col("__mx").alias("max_value"),
        )

    result = out(finest, levels[0])
    prev = finest
    for level in levels[1:]:
        folded = (
            prev.groupBy(
                F.date_trunc(level, F.col("bucket")).alias("bucket"), *keys
            ).agg(
                F.sum("__n").alias("__n"),
                F.sum("__sdec").alias("__sdec"),
                F.min("__mn").alias("__mn"),
                F.max("__mx").alias("__mx"),
            )
        )
        result = result.unionByName(out(folded, level))
        prev = folded
    return result


def hypertable_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    levels: tuple[str, ...] = LEVELS,
) -> DataFrame:
    """(level, bucket, *key_cols, n_events, sum_value, min_value,
    max_value) for every granularity in ``levels`` (finest first).

    ``date_trunc`` is closed under coarsening (trunc('hour', minute
    bucket) == trunc('hour', ts)), which is what makes the cascade
    exact; count/min/max/decimal-sum are the re-aggregable partials.
    """
    finest = minute_partials(df, ts_col, key_cols, value_col, levels[0])
    return cascade_from_partials(finest, key_cols, levels)


def merge_aggregate_state(
    stored: DataFrame,
    batch: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: merge a stored
    partial-aggregate table with a new batch's partials, producing the
    state a full recompute over (old input + batch) would — without
    touching the old input again. The batch-side twin of the streaming
    rollup legs, and the standard warehouse pattern for keeping a
    100 TB fact's rollup fresh from day-sized increments.

    Contract: both inputs carry the SAME re-aggregable state columns —
    ``n`` (count), per-measure ``sum_*`` as exact DECIMAL partials
    (the repo's dsum idiom: order-independent, so merge order can't
    change a bit), ``min_*`` / ``max_*``. Derived values (avg) are
    computed by the READER from the state, never stored — merging a
    stored avg is the classic wrong-answer.

    Plan: unionByName + one groupBy over the key cardinality —
    bucket-sized rows, never fact rows.
    """
    state_cols = [c for c in stored.columns if c not in keys]
    aggs = []
    for c in state_cols:
        if c == "n" or c.startswith("n_") or c.startswith("sum_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(
                f"column {c!r} is not re-aggregable state "
                "(expected n/n_*/sum_*/min_*/max_*)"
            )
    return stored.unionByName(batch).groupBy(*keys).agg(*aggs)

"""Time-series gap filling and interpolation (hypertable companions).

ABSENT-IN-REFERENCE (SURVEY.md §2B north-star): the continuous-aggregate
rollup (operators/rollup.py) leaves holes where a bucket saw no rows;
these operators densify the series — the ``time_bucket_gapfill`` /
``locf`` / ``interpolate`` surface of a time-series warehouse, built
from Spark primitives:

- one aggregation buckets the series; ONE window (``lead``) finds each
  observation's successor; gap rows then explode row-locally from
  ``sequence(0, n-1)`` — no dense-spine self-join, no second input
  scan, no second window. The dense frame is never shuffled at all;
- LOCF is the carried base value of the generating observation — free;
  linear interpolation is row-local arithmetic on (v, next_v, i/n).

At 100 TB the spine is bounded by (n_keys x range/width), not by input
rows — gap-filling a year of minutes for 1M keys is a 526B-row frame;
callers bound the range (or bucket coarser) the same way any gapfill
engine requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_UNIT_INTERVAL = {
    "minute": "INTERVAL 1 MINUTE",
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
}


def bucketed(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    agg: str = "avg",
    value_decimals: int | None = None,
) -> DataFrame:
    """Per (key, truncated-bucket) aggregate — the sparse series.

    ``value_decimals`` (with ``agg='avg'``): run the partial sums in
    exact DECIMAL(25, d) and divide once — order-independent across
    partitionings and engines (the q1 idiom) for fixed-scale measures.
    """
    key = F.col(key_col).alias("key")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    if agg == "avg" and value_decimals is not None:
        val = (
            F.sum(F.col(value_col).cast(f"decimal(25,{value_decimals})")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("value")
    else:
        val = getattr(F, agg)(value_col).alias("value")
    return df.groupBy(key, bucket).agg(val)


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    agg: str = "avg",
    method: str = "locf",
    value_decimals: int | None = None,
) -> DataFrame:
    """Densify a per-key time series and fill the holes.

    Output: (key, bucket, value, filled) — one row per key per ``unit``
    between that key's first and last observed bucket; ``filled`` marks
    rows the spine invented. ``method``:

    - ``'locf'``  — last observation carried forward;
    - ``'linear'`` — linear interpolation between the neighboring
      observations (leading/trailing holes fall back to the single
      available neighbor, i.e. LOCF/NOCB at the edges).

    Caveat shared with any gapfill engine: one pathological key whose
    neighboring observations sit years apart at minute granularity
    generates that many rows FROM ONE SOURCE ROW (here as one
    ``sequence`` array before its explode) — bound the series span
    upstream or bucket coarser; the operator intentionally does not
    silently cap the fill.
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}")
    if method not in ("locf", "linear"):
        raise ValueError("method must be 'locf' or 'linear'")

    sparse = bucketed(df, key_col, ts_col, value_col, unit, agg, value_decimals)

    # Gap rows generate from each observation's distance to the NEXT
    # observation: row (b, v) with successor at b+n units explodes to
    # offsets 0..n-1. No dense-spine self-join, no second scan of the
    # input, and no second window: `lead` is the only window, and both
    # fill methods become row-local arithmetic on (v, next_v, i/n) —
    # LOCF is literally the carried base value. Holes sit strictly
    # between two observations (the spine spans min..max per key), so
    # linear needs no edge fallback.
    uname = unit.upper()
    w = Window.partitionBy("key").orderBy("bucket")
    nxt_b = F.lead("bucket").over(w)
    nxt_v = F.lead("value").over(w)
    led = sparse.select(
        "key",
        "bucket",
        "value",
        F.coalesce(F.timestamp_diff(uname, F.col("bucket"), nxt_b), F.lit(1))
        .alias("__n"),
        nxt_v.alias("__nv"),
    )
    exploded = led.select(
        "key",
        "bucket",
        "value",
        "__n",
        "__nv",
        F.explode(F.sequence(F.lit(0), F.col("__n") - F.lit(1))).alias("__i"),
    )
    out_bucket = F.timestamp_add(uname, F.col("__i"), F.col("bucket"))
    if method == "locf":
        out_value = F.col("value")
    else:
        ratio = F.col("__i").cast("double") / F.col("__n").cast("double")
        out_value = F.when(F.col("__i") == 0, F.col("value")).otherwise(
            F.col("value") + (F.col("__nv") - F.col("value")) * ratio
        )
    return exploded.select(
        "key",
        out_bucket.alias("bucket"),
        out_value.alias("value"),
        (F.col("__i") > 0).alias("filled"),
    )


def cusum_alarm(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    threshold: float,
    drift: float | None = None,
    unit: str = "day",
    value_decimals: int | None = None,
) -> DataFrame:
    """One-sided (upper) CUSUM change-point detection per key — the
    classic sequential drift alarm (Page 1954) over a bucketed series:
    ``C_t = max(0, C_{t-1} + (x_t − k))`` flags sustained upward shifts
    long before any single point trips an outlier rule. Returns
    (key, bucket, value, cusum, alarm).

    The recursion is NOT expressed recursively (no UDF, no iteration):
    with prefix sums ``P_t = Σ_{j≤t}(x_j − k)``, the floored CUSUM is
    identically ``C_t = P_t − min(0, min_{j≤t} P_j)`` — two ordered
    windows over one key shuffle, fully whole-stage-codegen, the same
    trick as the repo's running-total shapes. Determinism: the window
    order (key, bucket) is total, so both engines fold the same doubles
    in the same sequence; ``cusum`` is rounded to 6 dp and the alarm
    compares the ROUNDED value, so the flag can never disagree
    cross-engine on a last-ulp tie.

    ``drift`` (the reference level k) defaults to the RAW value mean,
    computed in-plan as an exact DECIMAL sum / count (order-independent
    — the bucketed series' own mean would be a double sum, which is
    not) and broadcast. ``value_decimals`` keeps the per-bucket avg
    exact (the q1 idiom, see ``bucketed``).

    Scale shape: one groupBy shuffle (the bucketing), one window sort
    per key, one broadcast 1-row join for the default drift. State is
    the series, not the input — at 100 TB this is the rollup's cost
    plus a window.
    """
    s = bucketed(
        df, key_col, ts_col, value_col, unit=unit,
        value_decimals=value_decimals,
    )
    if drift is None:
        dec = f"decimal(25,{value_decimals if value_decimals is not None else 6})"
        mean = df.agg(
            (
                F.sum(F.col(value_col).cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("__drift")
        )
        s = s.crossJoin(F.broadcast(mean))
        k = F.col("__drift")
    else:
        k = F.lit(float(drift))
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col("value") - k).over(w)
    out = s.withColumn("__p", p)
    cusum = F.round(
        F.col("__p") - F.least(F.lit(0.0), F.min("__p").over(w)), 6
    )
    return out.select(
        "key",
        "bucket",
        "value",
        cusum.alias("cusum"),
        (cusum > F.lit(float(threshold))).alias("alarm"),
    )

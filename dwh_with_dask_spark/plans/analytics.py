"""Event/series analytics + data-quality queries (north-star additions).

ABSENT-IN-REFERENCE (SURVEY.md §2B): time-series gap filling, funnel
conversion, blocked fuzzy join, one-pass table profiling, winsorized
aggregation, and n-gram LM outlier scoring — the analytics layer a
warehouse serves once the reference's ETL (project-dask.py,
dask-with-dataframe.py) has landed the tables. Every query has an exact
DuckDB oracle; float results follow the repo's determinism idioms
(exact DECIMAL partial sums / round-to-6dp for order-dependent sums).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.operators.funnel import funnel_counts
from dwh_with_dask_spark.operators.joins import fuzzy_join
from dwh_with_dask_spark.operators.profile import profile_table, winsorize_agg
from dwh_with_dask_spark.operators.textstats import bigram_logprob_scores
from dwh_with_dask_spark.operators.timeseries import gap_fill

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Shared oracle CTE: hourly per-event-type series, densified. The avg
# runs as exact DECIMAL sums + one double division (bucketed()'s
# value_decimals idiom) so both engines compute identical doubles.
_GAPFILL_CTE = """
    sparse AS (
      SELECT event_type AS key, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
                 AS value
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT key, min(bucket) AS lo, max(bucket) AS hi
      FROM sparse GROUP BY key),
    spine AS (
      SELECT key,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds),
    dense AS (
      SELECT s.key, s.bucket, sp.value AS v
      FROM spine s LEFT JOIN sparse sp
        ON s.key = sp.key AND s.bucket = sp.bucket)
"""


@query(
    "timeseries_gap_fill_locf",
    f"""
    WITH {_GAPFILL_CTE}
    SELECT key, bucket,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY key ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           (v IS NULL) AS filled
    FROM dense
    """,
)
def timeseries_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type value series, holes filled by LOCF.

    Spine = per-key ``sequence(min,max,1h)`` exploded distributedly;
    one spine-vs-sparse left join (co-shuffled on the key), one window
    pass (operators/timeseries.py)."""
    e = load_table(spark, sf_dir, "events")
    return gap_fill(
        e, "event_type", "ts", "value", unit="hour", method="locf",
        value_decimals=2,
    )


@query(
    "timeseries_interpolate_linear",
    f"""
    WITH {_GAPFILL_CTE},
    nb AS (
      SELECT key, bucket, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             last_value(CASE WHEN v IS NOT NULL THEN bucket END
                        IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(CASE WHEN v IS NOT NULL THEN bucket END
                         IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM dense)
    SELECT key, bucket,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv) *
                     (CAST(date_diff('second', pt, bucket) AS DOUBLE) /
                      CAST(date_diff('second', pt, nt) AS DOUBLE))
           END AS value,
           (v IS NULL) AS filled
    FROM nb
    """,
)
def timeseries_interpolate_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same dense series with linear interpolation between neighboring
    observations (LOCF/NOCB at the edges). Both directional windows run
    over one per-key sort — a single shuffle."""
    e = load_table(spark, sf_dir, "events")
    return gap_fill(
        e, "event_type", "ts", "value", unit="hour", method="linear",
        value_decimals=2,
    )


_FUNNEL_STEPS = ["view", "click", "purchase"]

@query(
    "funnel_view_click_purchase",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)
    SELECT CAST(1 AS INTEGER) AS step_no, 'view' AS step,
           (SELECT count(*) FROM s1) AS n_keys
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase ordered-conversion funnel: one key
    shuffle + a codegen'd array fold per user (operators/funnel.py) vs
    the oracle's per-step min-scan joins."""
    e = load_table(spark, sf_dir, "events")
    return funnel_counts(e, _FUNNEL_STEPS, "user_id", "ts", "event_type")


@query(
    "funnel_within_12h",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts >= s1.t
        AND e.ts <= s1.t + INTERVAL 12 HOUR GROUP BY 1),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t
        AND e.ts <= s2.t + INTERVAL 12 HOUR GROUP BY 1)
    SELECT CAST(1 AS INTEGER) AS step_no, 'view' AS step,
           (SELECT count(*) FROM s1) AS n_keys
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
)
def funnel_within_12h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same funnel with a 12-hour conversion window per step: a step
    only counts within 12h of the previous step's first reach —
    first-touch anchoring, identical in the fold and the oracle's
    bounded min-scan."""
    e = load_table(spark, sf_dir, "events")
    return funnel_counts(
        e, _FUNNEL_STEPS, "user_id", "ts", "event_type", within="12 HOURS"
    )


@query(
    "fuzzy_join_part_names",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    probe AS (
      SELECT DISTINCT substr(p_name, 1, length(p_name) - 1) AS dirty_name
      FROM names)
    SELECT p.dirty_name, t.p_name,
           CAST(levenshtein(p.dirty_name, t.p_name) AS INTEGER) AS dist
    FROM probe p, names t
    WHERE abs(length(p.dirty_name) - length(t.p_name)) <= 2
      AND levenshtein(p.dirty_name, t.p_name) <= 2
    """,
)
def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-neighborhood (FastSS) fuzzy join, levenshtein ≤ 2:
    a deterministically-corrupted probe (last char dropped) resolves
    back to the clean p_name dimension — entity resolution on product
    names. The oracle is the ALL-PAIRS product, so the differential
    proves the deletion-index blocking's complete-recall property
    (operators/joins.py:fuzzy_join)."""
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    probe = names.select(
        F.expr("substr(p_name, 1, length(p_name) - 1)").alias("dirty_name")
    ).distinct()
    out = fuzzy_join(probe, names, "dirty_name", "p_name", max_dist=2)
    return out.select(
        "dirty_name", "p_name", F.col("dist").cast("int").alias("dist")
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS "column", count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_val,
           CAST(max({c}) AS VARCHAR) AS max_val
    FROM orders
    """
    for c in _PROFILE_COLS
)


@query("profile_orders_columns", _PROFILE_ORACLE)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profile of orders (one Expand-backed wide
    aggregate → long frame, operators/profile.py). The oracle pays one
    scan per column; the Spark plan pays one total."""
    return profile_table(load_table(spark, sf_dir, "orders"), _PROFILE_COLS)


@query(
    "winsorized_order_prices",
    """
    WITH b AS (
      SELECT o_orderpriority AS g,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY 1)
    SELECT o.o_orderpriority AS grp, count(*) AS n,
           min(b.lo) AS lo, min(b.hi) AS hi,
           CAST(SUM(CAST(least(greatest(o.o_totalprice, b.lo), b.hi)
                         AS DECIMAL(25,8))) AS DOUBLE) / count(*)
               AS mean_winsorized,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,8))) AS DOUBLE)
               / count(*) AS mean_raw
    FROM orders o JOIN b ON o.o_orderpriority = b.g
    GROUP BY 1
    """,
)
def winsorized_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust mean order price per priority: exact [p05, p95]
    winsorization — tiny per-group bound table broadcast back, decimal
    partial sums (operators/profile.py:winsorize_agg)."""
    o = load_table(spark, sf_dir, "orders")
    return winsorize_agg(o, "o_orderpriority", "o_totalprice", 0.05, 0.95)


@query(
    "timeseries_rolling_zscore",
    """
    WITH sparse AS (
      SELECT event_type AS key, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
                 AS value
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT key, bucket, value,
             avg(value) OVER win AS mu,
             stddev_samp(value) OVER win AS sigma,
             count(*) OVER win AS n
      FROM sparse
      WINDOW win AS (PARTITION BY key ORDER BY bucket
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT key, bucket, value,
           CASE WHEN n >= 2 AND sigma > 0
                THEN round((value - mu) / sigma, 6) END AS zscore
    FROM w
    """,
)
def timeseries_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour z-score per series — the monitoring/anomaly
    companion of the hypertable rollup: one key shuffle, one window
    frame computing trailing mean/stddev, row-local score (rounded to
    6 dp — stddev accumulation order differs across engines)."""
    from dwh_with_dask_spark.operators.timeseries import bucketed

    e = load_table(spark, sf_dir, "events")
    sparse = bucketed(e, "event_type", "ts", "value", "hour", "avg", 2)
    from pyspark.sql.window import Window

    win = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-23, Window.currentRow)
    )
    mu = F.avg("value").over(win)
    sigma = F.stddev_samp("value").over(win)
    n = F.count(F.lit(1)).over(win)
    return sparse.select(
        "key",
        "bucket",
        "value",
        F.when(
            (n >= 2) & (sigma > 0), F.round((F.col("value") - mu) / sigma, 6)
        ).alias("zscore"),
    )


@query(
    "cohort_retention_weekly",
    """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INTEGER)
               AS week_offset,
           count(*) AS n_users
    FROM active a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    counted in each later activity week. Two aggregations + one
    user-key join; both date_trunc('week') are ISO Monday-start so the
    day-difference is always a whole number of weeks."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    offset = (
        F.datediff(F.col("week"), F.col("cohort_week")) / F.lit(7)
    ).cast("int")
    return (
        active.join(firsts, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "mad_outlier_orders",
    """
    WITH m AS (
      SELECT o_orderpriority AS g,
             quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY 1),
    d AS (
      SELECT o.o_orderpriority AS g, o.o_orderkey, o.o_totalprice, m.med,
             abs(o.o_totalprice - m.med) AS adev
      FROM orders o JOIN m ON o.o_orderpriority = m.g),
    s AS (
      SELECT g, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY g)
    SELECT d.g AS grp, count(*) AS n,
           min(s.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * s.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN s ON d.g = s.g
    GROUP BY 1
    """,
)
def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier count per order priority —
    the robust companion to the z-score (unaffected by the outliers it
    hunts). Two exact-median aggregations over group-cardinality-sized
    frames broadcast back; the 3-sigma-equivalent cut uses the standard
    1.4826 normal-consistency constant."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy(F.col("o_orderpriority").alias("__g")).agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("med")
    )
    d = o.join(
        F.broadcast(med), F.col("o_orderpriority") == F.col("__g")
    ).withColumn("adev", F.abs(F.col("o_totalprice") - F.col("med")))
    mad = d.groupBy(F.col("__g").alias("__g2")).agg(
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad")
    )
    return (
        d.join(F.broadcast(mad), F.col("__g") == F.col("__g2"))
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("mad").alias("mad"),
            F.sum(
                (F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
    )


@query(
    "session_path_counts",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, session_id)
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path HAVING count(*) >= 5
    """,
)
def session_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the event-type sequence of every 5-minute session,
    counted across the corpus (paths seen ≥5 times). Reuses the gap
    sessionizer; the path string assembles row-locally from the sorted
    per-session collect_list — sessions are bounded, the corpus is not."""
    from dwh_with_dask_spark.operators.sessionize import sessionize_by_gap

    e = load_table(spark, sf_dir, "events")
    s = sessionize_by_gap(
        e, "user_id", "ts", "5 minutes", order_cols=("event_id",)
    )
    paths = s.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", "event_type")
                    )
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
    )


@query(
    "event_transition_matrix",
    """
    WITH t AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events),
    c AS (
      SELECT src, dst, count(*) AS n FROM t
      WHERE dst IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, n,
           CAST(n AS DOUBLE) /
           CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next type | type). One key-ordered lead window, one
    count aggregation, probabilities from a type-cardinality-sized
    window — the behavioral-model companion of session_path_counts."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = t.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("src")
    return c.select(
        "src",
        "dst",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(tot).cast("double")
        ).alias("p"),
    )


@query(
    "timeseries_rolling_median",
    """
    WITH sparse AS (
      SELECT event_type AS key, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
                 AS value
      FROM events GROUP BY 1, 2)
    SELECT key, bucket, value,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY key ORDER BY bucket
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS med24
    FROM sparse
    """,
)
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-bucket rolling MEDIAN per series — the robust twin
    of the rolling z-score (one outlier cannot drag it). Same single
    key shuffle; the exact percentile runs as a window aggregate over
    the bounded frame."""
    from pyspark.sql.window import Window

    from dwh_with_dask_spark.operators.timeseries import bucketed

    e = load_table(spark, sf_dir, "events")
    sparse = bucketed(e, "event_type", "ts", "value", "hour", "avg", 2)
    win = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-23, Window.currentRow)
    )
    return sparse.select(
        "key",
        "bucket",
        "value",
        F.percentile(F.col("value"), F.lit(0.5)).over(win).alias("med24"),
    )


@query(
    "rolling_7d_distinct_users",
    """
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events)
    SELECT d.day,
           (SELECT count(DISTINCT e.user_id) FROM events e
            WHERE CAST(date_trunc('day', e.ts) AS DATE)
                  BETWEEN d.day - 6 AND d.day) AS n_users
    FROM days d
    """,
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct users per day WITHOUT rescanning
    events per window: the raw log compresses once into per-(day,
    bucket) bitmap partials (kilobyte blobs, the bitmap_distinct
    pattern), the grid densifies so quiet buckets still contribute
    history, and a RANGE window OR-merges each day's trailing week of
    partials — ``bitmap_or_agg`` over 7 blobs per bucket, then
    popcounts. The production shape for rolling exact-distinct at
    warehouse scale: the window moves over PARTIALS, never over events.
    The oracle recomputes each day from the raw log."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    grid = (
        daily.select("day").distinct()
        .crossJoin(F.broadcast(daily.select("bucket").distinct()))
        .join(daily, ["day", "bucket"], "left")
        .withColumn("dn", F.datediff("day", F.lit("1970-01-01").cast("date")))
    )
    win = (
        Window.partitionBy("bucket").orderBy("dn").rangeBetween(-6, 0)
    )
    merged = grid.select(
        "day", F.expr("bitmap_or_agg(bm)").over(win).alias("wbm")
    )
    return merged.groupBy("day").agg(
        F.sum(F.expr("bitmap_count(wbm)")).cast("long").alias("n_users")
    )


@query(
    "asof_join_tolerance_30d",
    """
    WITH o1 AS (
      SELECT o_custkey, o_orderdate,
             MAX(o_orderkey) AS last_orderkey,
             MAX_BY(o_totalprice, o_orderkey) AS last_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate),
    a AS (
      SELECT e.event_id, e.user_id, e.ts, o1.o_orderdate,
             o1.last_orderkey, o1.last_totalprice
      FROM events e
      ASOF LEFT JOIN o1
        ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate)
    SELECT event_id, user_id, ts,
           CASE WHEN ts <= o_orderdate + INTERVAL 30 DAY
                THEN last_orderkey END AS last_orderkey,
           CASE WHEN ts <= o_orderdate + INTERVAL 30 DAY
                THEN last_totalprice END AS last_totalprice
    FROM a
    """,
)
def asof_join_tolerance_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 30-day staleness cap: each event picks the
    most recent same-customer order, but a match older than 30 days
    nulls out — the tolerance parameter of operators.joins.asof_join,
    a row-local post-filter on the carried match time (no extra
    shuffle vs the uncapped as-of)."""
    from dwh_with_dask_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("last_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_totalprice"),
        )
    )
    out = asof_join(
        e, o, on="user_id", left_time="ts", right_time="o_orderdate",
        tolerance="30 DAYS",
    )
    return out.select(
        "event_id", "user_id", "ts", "last_orderkey", "last_totalprice"
    )


_QSK_PS = (0.25, 0.5, 0.75, 0.95)
_QSK_ORACLE = (
    """
    WITH s AS (
      SELECT o_totalprice AS value FROM orders
      ORDER BY md5(CAST(o_orderkey AS VARCHAR) || 'qsk'),
               value ASC NULLS FIRST
      LIMIT 500),
    agg AS (
      SELECT """
    + ", ".join(
        f"quantile_cont(value, {p}) AS q{i}" for i, p in enumerate(_QSK_PS)
    )
    + """, count(*) AS n FROM s)
    """
    + "\nUNION ALL\n".join(
        f"SELECT CAST({p} AS DOUBLE) AS p, q{i} AS est, n AS n_sample FROM agg"
        for i, p in enumerate(_QSK_PS)
    )
)


@query("quantile_sketch_prices", _QSK_ORACLE)
def quantile_sketch_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price quantiles from the deterministic bottom-k sample
    sketch (k=500, md5 priorities): per-partition TakeOrderedAndProject
    partials, no full sort or shuffle of the column — the mergeable
    quantile path next to percentile_approx
    (operators/sketches.py:quantile_sketch). The oracle draws the SAME
    sample, so estimates hash-match."""
    from dwh_with_dask_spark.operators.sketches import quantile_sketch

    o = load_table(spark, sf_dir, "orders")
    return quantile_sketch(
        o, "o_totalprice", "o_orderkey", k=500, quantiles=_QSK_PS
    )


@query(
    "text_bigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' '), t -> t <> '') AS t
      FROM documents),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i)
      WHERE len(t) >= 2),
    cnt AS (
      SELECT doc_id,
             count(*) OVER (PARTITION BY w1, w2) AS c12,
             count(*) OVER (PARTITION BY w1) AS c1
      FROM big),
    v AS (SELECT count(DISTINCT w1) AS v FROM big)
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(ln((c12 + 1.0) / (c1 + v.v))), 6) AS avg_logprob
    FROM cnt, v
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean add-one-smoothed bigram log-probability per document under
    the corpus's own bigram model — the SQL-expressible KenLM/CCNet
    quality-filter analog (operators/textstats.py:
    bigram_logprob_scores): one tokenize pass, window counts over the
    exploded bigram frame, no count-table join-back."""
    d = load_table(spark, sf_dir, "documents")
    return bigram_logprob_scores(d, "doc_id", "text")


_PR_ITERS = 5


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    """Unrolled power-iteration CTE chain — one c{i}/r{i} pair per
    iteration, the exact SQL twin of operators/graph.py:pagerank."""
    sql = """
    WITH e0 AS (
      SELECT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
             's:' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    und AS (SELECT src, dst, w FROM e0
            UNION ALL SELECT dst, src, w FROM e0),
    outw AS (SELECT src, SUM(w) AS tw FROM und GROUP BY src),
    norm AS (SELECT und.src, und.dst, und.w / outw.tw AS p
             FROM und JOIN outw ON und.src = outw.src),
    nodes AS (SELECT DISTINCT src AS node FROM und),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
    c{i} AS (SELECT norm.dst, SUM(r{i - 1}.pr * norm.p) AS c
             FROM r{i - 1} JOIN norm ON r{i - 1}.node = norm.src
             GROUP BY norm.dst),
    r{i} AS (SELECT nodes.node,
                    0.15 / (SELECT n FROM nn)
                      + 0.85 * COALESCE(c{i}.c, 0.0) AS pr
             FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.dst)"""
    sql += f"""
    SELECT node, round(pr, 6) AS pr
    FROM r{iters}
    ORDER BY round(pr, 6) DESC, node
    LIMIT 50
    """
    return sql


@query("pagerank_customer_supplier", _pagerank_oracle())
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (5 power iterations, d=0.85) over the
    customer<->supplier affinity graph mined from lineitem x orders —
    top 50 nodes. Edge derivation is one fact-table join + count; the
    iterations then shuffle only the node-count-sized rank vector
    against the persisted normalized edge table
    (operators/graph.py:pagerank). round(,6) absorbs summation-order
    float drift; ties at the cut break by node id."""
    from dwh_with_dask_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .count()
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
            F.col("count").alias("w"),
        )
    )
    ranks = pagerank(edges, weight="w", iters=_PR_ITERS, damping=0.85)
    return (
        ranks.select("node", F.round("rank", 6).alias("pr"))
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(50)
    )


@query(
    "market_basket_part_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, n_orders
    FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def market_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top part pairs bought in the same
    order. The within-group self-join is quadratic ONLY in basket size
    (TPC-H orders hold ~4 line items, so pairs-per-order is a small
    constant — the same bounded-group contract as the session-path and
    funnel operators); the join co-partitions on l_orderkey, one
    shuffle, and the pair aggregation map-side combines. For
    pathological baskets cap items per basket first (the shingle-cap
    idiom). Deterministic: integer counts, full tie-break ordering."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return pairs.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)


def _part_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw multi-edge rows of the part co-occurrence graph: one
    (src, dst) row per order in which the pair co-occurs (src < dst) —
    the operator-side ``min_count`` guard thresholds the multiplicity."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )


@query(
    "triangle_count_part_graph",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
    SELECT ab.lo AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e ab
    JOIN e bc ON bc.lo = ab.hi
    JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi
    GROUP BY ab.lo
    ORDER BY n_triangles DESC, node ASC
    LIMIT 50
    """,
)
def triangle_count_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting (operators/graph.py:triangle_count) over
    the part co-occurrence graph: top-50 apex nodes by triangles. The
    DENSITY guard — keep pairs co-ordered in >= 2 orders — is the
    operator's ``min_count`` parameter (round 9; previously a
    per-query HAVING): an unweighted co-occurrence graph's wedge count
    grows ~deg² per node (measured 35 s at sf1 vs ~1 s thresholded;
    random one-shot co-occurrences carry no signal anyway), the same
    cap-the-hot-keys contract as the shingle/df caps. The a<b<c
    orientation counts each triangle exactly once in two equi-join
    shuffles; the oracle recomputes the identical closed wedges."""
    from dwh_with_dask_spark.operators.graph import triangle_count

    edges = _part_cooccurrence_pairs(spark, sf_dir)
    return (
        triangle_count(edges, per_node=True, min_count=2)
        .orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(50)
    )


@query(
    "clustering_coeff_parts",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT lo AS node FROM e UNION ALL SELECT hi AS node FROM e)
      GROUP BY node),
    tri AS (
      SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
      FROM e ab
      JOIN e bc ON bc.lo = ab.hi
      JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
    pv AS (
      SELECT node, COUNT(*) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b AS node FROM tri
        UNION ALL SELECT c AS node FROM tri)
      GROUP BY node)
    SELECT deg.node,
           CAST(COALESCE(pv.t, 0) AS BIGINT) AS n_triangles,
           CAST(deg.d AS BIGINT) AS degree,
           2.0 * COALESCE(pv.t, 0) / (deg.d * (deg.d - 1)) AS clustering_coeff
    FROM deg LEFT JOIN pv ON pv.node = deg.node
    WHERE deg.d >= 5
    ORDER BY clustering_coeff DESC, n_triangles DESC, deg.node ASC
    LIMIT 50
    """,
)
def clustering_coeff_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient
    (operators/graph.py:clustering_coefficient) over the guarded part
    co-occurrence graph: top-50 best-triangulated parts among those
    with degree >= 5 (VERDICT r8 ask #5 — the true per-VERTEX triangle
    counts the apex-only driver row cannot provide). The coefficient is
    one IEEE division over exact integers, so it hash-matches the
    oracle with no rounding idiom."""
    from dwh_with_dask_spark.operators.graph import clustering_coefficient

    edges = _part_cooccurrence_pairs(spark, sf_dir)
    return (
        clustering_coefficient(edges, min_count=2)
        .filter(F.col("degree") >= 5)
        .orderBy(
            F.desc("clustering_coeff"), F.desc("n_triangles"), F.asc("node")
        )
        .limit(50)
    )


@query(
    "link_prediction_parts",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS lo, b.l_partkey AS hi
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    adj AS (
      SELECT lo AS node, hi AS nbr FROM e
      UNION ALL SELECT hi AS node, lo AS nbr FROM e),
    deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
    cand AS (
      SELECT x.node AS a, y.nbr AS c, x.nbr AS b
      FROM adj x JOIN adj y ON y.node = x.nbr
      WHERE x.node < y.nbr),
    miss AS (
      SELECT a, c, b FROM cand
      WHERE NOT EXISTS (
        SELECT 1 FROM e WHERE e.lo = cand.a AND e.hi = cand.c))
    SELECT a AS node_a, c AS node_b,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           ROUND(SUM(1.0 / d.d), 6) AS score
    FROM miss JOIN deg d ON d.node = miss.b
    GROUP BY a, c
    ORDER BY score DESC, node_a ASC, node_b ASC
    LIMIT 50
    """,
)
def link_prediction_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction (operators/graph.py:link_prediction, resource-
    allocation index): the top-50 NON-adjacent part pairs most likely
    to co-occur next, scored Σ 1/deg over their common co-occurrence
    neighbors — the recommendation primitive over the same guarded
    graph as the triangle family. RA (Zhou, Lü & Zhang 2009) is chosen
    over Adamic-Adar for the driver row because its arithmetic is pure
    rational: the round(,6) sum idiom makes it hash-match the oracle
    exactly, no ``ln``."""
    from dwh_with_dask_spark.operators.graph import link_prediction

    edges = _part_cooccurrence_pairs(spark, sf_dir)
    return (
        link_prediction(edges, method="ra", min_count=2)
        .orderBy(F.desc("score"), F.asc("node_a"), F.asc("node_b"))
        .limit(50)
    )


# DuckDB twin of the 52-bit md5 priority: digit-sum the first 13 hex
# chars (no conv() in DuckDB; 16^12 * 15 < 2^52, all exact in BIGINT).
_KMV_H_SQL = "(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(l_partkey AS VARCHAR) || 'kmv'), {i}, 1)) - 1) * {16 ** (13 - i)}"
    for i in range(1, 14)
) + ")"


@query(
    "kmv_distinct_parts",
    f"""
    WITH d AS (
      SELECT DISTINCT l_returnflag, {_KMV_H_SQL} AS h FROM lineitem),
    r AS (
      SELECT l_returnflag, h,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM d),
    kept AS (SELECT * FROM r WHERE rn <= 64)
    SELECT l_returnflag,
           COUNT(*) AS n_sketch,
           CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                ELSE 63.0 / (CAST(MAX(h) AS DOUBLE) / {float(16 ** 13)})
           END AS kmv_distinct
    FROM kept GROUP BY l_returnflag
    """,
)
def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct sketch (operators/sketches.py:kmv_distinct,
    k=64): the deterministic companion to approx_distinct_parts — the
    md5-priority estimate is a pure function of the data, so the DuckDB
    oracle reproduces it bit-for-bit where HLL has no cross-engine
    oracle at all. Accuracy vs exact is property-tested
    (~1/sqrt(k-2) relative error); mergeability of the bottom-k state
    is property-tested in tests/test_sketches.py."""
    from dwh_with_dask_spark.operators.sketches import kmv_distinct

    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct(li, ["l_returnflag"], "l_partkey", k=64)


@query(
    "kmv_setops_parts",
    f"""
    WITH d AS (
      SELECT DISTINCT l_returnflag AS g, {_KMV_H_SQL} AS h FROM lineitem),
    r AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM d),
    kept AS (SELECT g, h FROM r WHERE rn <= 64),
    sk AS (SELECT g, list(h ORDER BY h) AS hs, COUNT(*) AS n_sk
           FROM kept GROUP BY g),
    pairs AS (
      SELECT a.g AS g_a, b.g AS g_b, a.hs AS hs_a, b.hs AS hs_b,
             a.n_sk AS n_a_sketch, b.n_sk AS n_b_sketch
      FROM sk a JOIN sk b ON a.g < b.g),
    m AS (
      SELECT *, list_sort(list_distinct(list_concat(hs_a, hs_b))) AS merged,
             list_intersect(hs_a, hs_b) AS shared
      FROM pairs),
    c AS (SELECT *, len(merged) AS n_merged, merged[1:64] AS mk FROM m),
    c2 AS (
      SELECT *, len(list_intersect(mk, shared)) AS k_shared,
             CASE WHEN n_merged < 64 THEN CAST(n_merged AS DOUBLE)
                  ELSE 63.0 / (CAST(mk[64] AS DOUBLE) / {float(16 ** 13)})
             END AS union_est
      FROM c)
    SELECT g_a, g_b, n_a_sketch, n_b_sketch, union_est,
           CASE WHEN n_merged < 64 THEN CAST(len(shared) AS DOUBLE)
                ELSE (CAST(k_shared AS DOUBLE) / 64.0) * union_est
           END AS intersect_est
    FROM c2
    """,
)
def kmv_setops_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-set union/intersection estimates between
    l_returnflag segments from MERGED KMV sketches
    (operators/sketches.py:kmv_set_ops, k=64) — the mergeability
    payoff: cross-segment overlap computed by folding two k-sized
    sorted arrays, never by a distinct-join over the raw rows. Same
    deterministic md5 priority as kmv_distinct_parts, so the DuckDB
    oracle rebuilds every estimate bit-for-bit (both engines evaluate
    the identical two-operation IEEE expression trees)."""
    from dwh_with_dask_spark.operators.sketches import kmv_set_ops

    li = load_table(spark, sf_dir, "lineitem")
    return kmv_set_ops(li, "l_returnflag", "l_partkey", k=64)


@query(
    "entity_resolution_parts",
    """
    WITH RECURSIVE recs AS (
      SELECT p_partkey AS rec_id, p_name AS name FROM part
      UNION ALL
      SELECT p_partkey + 10000000, substr(p_name, 1, length(p_name) - 1)
      FROM part WHERE p_partkey % 3 = 0),
    names AS (SELECT DISTINCT name FROM recs),
    npairs AS (
      SELECT a.name AS name_a, b.name AS name_b
      FROM names a, names b
      WHERE a.name < b.name
        AND abs(length(a.name) - length(b.name)) <= 1
        AND levenshtein(a.name, b.name) <= 1),
    edges AS (
      SELECT ra.rec_id AS id_a, rb.rec_id AS id_b
      FROM npairs p
      JOIN recs ra ON ra.name = p.name_a
      JOIN recs rb ON rb.name = p.name_b
      UNION
      SELECT ra.rec_id, rb.rec_id
      FROM recs ra JOIN recs rb
        ON ra.name = rb.name AND ra.rec_id < rb.rec_id),
    bidir AS (
      SELECT id_a AS a, id_b AS b FROM edges
      UNION SELECT id_b, id_a FROM edges),
    reach(node, lab) AS (
      SELECT rec_id, rec_id FROM recs
      UNION
      SELECT e.b, r.lab FROM reach r JOIN bidir e ON e.a = r.node),
    comp AS (SELECT node AS rec_id, MIN(lab) AS entity_id
             FROM reach GROUP BY node)
    SELECT c.entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           arg_min(r.name, r.rec_id) AS canonical_name
    FROM comp c JOIN recs r ON r.rec_id = c.rec_id
    GROUP BY c.entity_id
    """,
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution — the composition a master-data /
    training-metadata pipeline runs: (1) records = clean part names +
    deterministically corrupted variants (last char dropped for every
    3rd key, offset ids); (2) candidate pairs via the FastSS
    deletion-neighborhood fuzzy self-join (levenshtein <= 1, complete
    recall — no all-pairs product) plus exact-name matches; (3)
    transitive closure via distributed min-label connected components;
    (4) golden record per entity: smallest rec_id's name (min_by,
    deterministic). The DuckDB oracle recomputes the identical
    pipeline with an all-pairs filtered product and a recursive CTE."""
    from dwh_with_dask_spark.operators.dedup import connected_components
    from dwh_with_dask_spark.operators.joins import fuzzy_join

    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    clean = part.select(k.alias("rec_id"), F.col("p_name").alias("name"))
    # Offset 10_000_000, far past part's key domain (SF x 200_000, so
    # 2M at the sf10 bench ceiling): a colliding rec_id would silently
    # bridge unrelated entities' components and make min_by tie-breaking
    # nondeterministic — the old +100_000 collided from sf >= 0.5
    # (ADVICE r7).
    dirty = part.filter(k % 3 == 0).select(
        (k + 10000000).alias("rec_id"),
        F.expr("substr(p_name, 1, length(p_name) - 1)").alias("name"),
    )
    recs = clean.unionByName(dirty)

    # Scale-critical edge reduction: records sharing a name form a
    # CLIQUE, but connectivity only needs a STAR to the name's min
    # rec_id (components identical, edges O(records) instead of
    # O(records^2) per name — at sf1 this corpus has 200k records over
    # 64 names, i.e. ~370M clique edges vs 200k star edges, measured
    # as the difference between a >400 s DNF and ~15 s). Fuzzy name
    # pairs likewise connect the two names' REPRESENTATIVES — any
    # member reaches its rep through the star, so components match
    # the all-pairs formulation the oracle uses.
    name_rep = recs.groupBy("name").agg(F.min("rec_id").alias("rep"))
    star = (
        recs.join(name_rep, "name")
        .filter(F.col("rec_id") != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col("rec_id").alias("id_b"))
    )
    names = name_rep.select("name")
    names_b = names.select(F.col("name").alias("name_b"))
    npairs = fuzzy_join(names, names_b, "name", "name_b", max_dist=1).filter(
        F.col("name") < F.col("name_b")
    )
    rep_a = name_rep.select("name", F.col("rep").alias("id_a"))
    rep_b = name_rep.select(
        F.col("name").alias("name_b"), F.col("rep").alias("id_b")
    )
    fuzzy_edges = (
        npairs.join(rep_a, "name").join(rep_b, "name_b").select("id_a", "id_b")
    )
    edges = star.unionByName(fuzzy_edges).distinct()

    comp = connected_components(
        edges, nodes=recs.select("rec_id"), node_col="rec_id"
    )
    return (
        comp.join(recs, comp["node"] == recs["rec_id"])
        .groupBy(F.col("component").alias("entity_id"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min_by("name", "rec_id").alias("canonical_name"),
        )
    )


@query(
    "ab_test_purchase_events",
    """
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id),
    a AS (
      SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR) || 'exp1'),
                                 1, 4) < '8000'
                  THEN 'treatment' ELSE 'control' END AS arm,
             converted
      FROM u),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_control,
        CAST(SUM(CASE WHEN arm = 'control' THEN converted ELSE 0 END)
          AS BIGINT) AS x_control,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_treatment,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END)
          AS BIGINT) AS x_treatment
      FROM a)
    SELECT n_control, x_control,
           CASE WHEN n_control > 0
                THEN CAST(x_control AS DOUBLE) / CAST(n_control AS DOUBLE)
           END AS rate_control,
           n_treatment, x_treatment,
           CASE WHEN n_treatment > 0
                THEN CAST(x_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
           END AS rate_treatment,
           CASE WHEN n_control > 0 AND n_treatment > 0
                 AND (CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
                     / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)) > 0
                 AND (CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
                     / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)) < 1
                THEN CAST(x_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
                   - CAST(x_control AS DOUBLE) / CAST(n_control AS DOUBLE)
           END AS abs_lift,
           CASE WHEN n_control > 0 AND n_treatment > 0
                 AND (CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
                     / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)) > 0
                 AND (CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
                     / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)) < 1
                THEN (CAST(x_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
                      - CAST(x_control AS DOUBLE) / CAST(n_control AS DOUBLE))
                     / sqrt(((CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
                             / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)))
                            * (1.0 - (CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
                                     / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)))
                            * (1.0 / CAST(n_control AS DOUBLE)
                               + 1.0 / CAST(n_treatment AS DOUBLE)))
           END AS z_score
    FROM s
    """,
)
def ab_test_purchase_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout (operators/experiment.py): users are
    deterministically md5-split 50/50 into control/treatment (salt =
    the experiment id — stable across re-runs, the anti-RNG contract),
    conversion = the user ever fired a 'purchase' event, and the
    statistic is the pooled two-proportion z-test. Every op in the z
    expression is IEEE correctly-rounded (+,-,*,/,sqrt) in the same
    fixed tree as the oracle, so the row hash-matches with NO rounding
    idiom. Null-hypothesis data (assignment is independent of
    behavior), so |z| should be small — the plumbing and the statistic
    are what's under test."""
    from dwh_with_dask_spark.operators.experiment import (
        ab_assign,
        two_proportion_ztest,
    )

    e = load_table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "converted"
        )
    )
    units = units.withColumn("arm", ab_assign("user_id", salt="exp1"))
    return two_proportion_ztest(units)


@query(
    "drift_orders_price_psi",
    """
    WITH old AS (
      SELECT o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-07-01'),
    new AS (
      SELECT o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-07-01'),
    ob AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((CAST(o_totalprice AS DOUBLE) - 0.0)
                                        / 50000.0) AS BIGINT), 0), 11) AS bin
      FROM old WHERE o_totalprice IS NOT NULL),
    nb AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((CAST(o_totalprice AS DOUBLE) - 0.0)
                                        / 50000.0) AS BIGINT), 0), 11) AS bin
      FROM new WHERE o_totalprice IS NOT NULL),
    oc AS (SELECT bin, COUNT(*) AS n_old FROM ob GROUP BY bin),
    nc AS (SELECT bin, COUNT(*) AS n_new FROM nb GROUP BY bin),
    j AS (
      SELECT COALESCE(oc.bin, nc.bin) AS bin,
             CAST(COALESCE(n_old, 0) AS BIGINT) AS n_old,
             CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new
      FROM oc FULL OUTER JOIN nc ON oc.bin = nc.bin),
    t AS (SELECT (SELECT CAST(SUM(n_old) AS DOUBLE) FROM j) AS t_old,
                 (SELECT CAST(SUM(n_new) AS DOUBLE) FROM j) AS t_new),
    -- textbook PSI epsilon: ONLY empty cells take the floor; occupied
    -- bins keep their true proportion however small
    p AS (
      SELECT bin, n_old, n_new,
             CASE WHEN n_old = 0 THEN 0.0001
                  ELSE CAST(n_old AS DOUBLE) / t_old END AS po,
             CASE WHEN n_new = 0 THEN 0.0001
                  ELSE CAST(n_new AS DOUBLE) / t_new END AS pn
      FROM j CROSS JOIN t)
    SELECT CAST(bin AS INTEGER) AS bin, n_old, n_new,
           ROUND(po, 6) AS p_old,
           ROUND(pn, 6) AS p_new,
           ROUND((pn - po) * ln(pn / po), 6) AS psi_term
    FROM p
    ORDER BY bin
    """,
)
def drift_orders_price_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift alarm (operators/profile.py:
    population_stability): PSI of o_totalprice between the pre- and
    post-1998-07 eras over 12 fixed equi-width bins on [0, 600000).
    Fixed edges (not quantiles) keep the binning deterministic and the
    oracle exact; the synthetic corpus is stationary, so SUM(psi_term)
    should read ~0 ("stable") — the operator's discrimination is pinned
    on genuinely shifted fixtures in tests/test_analytics.py."""
    from dwh_with_dask_spark.operators.profile import population_stability

    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-07-01").cast("timestamp")
    return population_stability(
        o.filter(F.col("o_orderdate") < cut),
        o.filter(F.col("o_orderdate") >= cut),
        "o_totalprice",
        lo=0.0,
        hi=600000.0,
        bins=12,
    ).orderBy("bin")


@query(
    "cusum_daily_event_values",
    """
    WITH m AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
               AS k
      FROM events),
    s AS (
      SELECT event_type AS key, date_trunc('day', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) / COUNT(*)
               AS value
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT key, bucket, value,
             SUM(value - m.k) OVER (
               PARTITION BY key ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
      FROM s CROSS JOIN m),
    c AS (
      SELECT key, bucket, value,
             ROUND(pp - LEAST(0.0, MIN(pp) OVER (
               PARTITION BY key ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
               AS cusum
      FROM p)
    SELECT key, CAST(bucket AS DATE) AS bucket, value, cusum,
           cusum > 10.0 AS alarm
    FROM c
    """,
)
def cusum_daily_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point alarm (operators/timeseries.py:cusum_alarm):
    per-event-type daily value series, drift = the exact raw mean,
    threshold 10 — flags sustained above-average stretches the rolling
    z-score misses. The floored recursion is two ordered windows over
    prefix sums (no UDF, no iteration); the alarm compares the ROUNDED
    cusum so the flag is engine-stable even though each engine may
    associate the windowed double sum differently (round(,6) absorbs
    the last-ulp spread)."""
    from dwh_with_dask_spark.operators.timeseries import cusum_alarm

    e = load_table(spark, sf_dir, "events")
    out = cusum_alarm(
        e, "event_type", "ts", "value",
        threshold=10.0, unit="day", value_decimals=2,
    )
    return out.select(
        "key", F.col("bucket").cast("date").alias("bucket"),
        "value", "cusum", "alarm",
    )


# Welch pieces shared by the two variants of the CUPED oracle. The
# formulas are the operator's fixed double trees verbatim; {m} is the
# per-unit metric column ('y' for raw, 'a' for adjusted).
def _welch_sql(m: str) -> dict[str, str]:
    nc = "CAST(nc AS DOUBLE)"
    nt = "CAST(nt AS DOUBLE)"
    s1c, s2c = f"CAST(s{m}c AS DOUBLE)", f"CAST(s{m}{m}c AS DOUBLE)"
    s1t, s2t = f"CAST(s{m}t AS DOUBLE)", f"CAST(s{m}{m}t AS DOUBLE)"
    mc, mt = f"({s1c} / {nc})", f"({s1t} / {nt})"
    vc = f"(({s2c} - {s1c} * {s1c} / {nc}) / ({nc} - 1.0))"
    vt = f"(({s2t} - {s1t} * {s1t} / {nt}) / ({nt} - 1.0))"
    se2 = f"({vc} / {nc} + {vt} / {nt})"
    ok = f"(nc > 1 AND nt > 1 AND {se2} > 0)"
    t = f"CASE WHEN {ok} THEN ({mt} - {mc}) / sqrt({se2}) END"
    dof = (
        f"CASE WHEN {ok} THEN {se2} * {se2} / "
        f"(({vc} / {nc}) * ({vc} / {nc}) / ({nc} - 1.0) + "
        f"({vt} / {nt}) * ({vt} / {nt}) / ({nt} - 1.0)) END"
    )
    return {
        "mc": mc, "mt": mt, "t": t, "dof": dof, "se2": se2, "ok": ok,
    }


_W_RAW, _W_ADJ = _welch_sql("y"), _welch_sql("a")

_CUPED_ORACLE = f"""
    WITH pre AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-07-01' GROUP BY 1),
    post AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01' GROUP BY 1),
    u0 AS (
      SELECT c_custkey AS cust,
             CAST(COALESCE(post.y, 0) AS DECIMAL(25,2)) AS y,
             CAST(COALESCE(pre.x, 0) AS DECIMAL(25,2)) AS x
      FROM customer
      LEFT JOIN pre ON pre.o_custkey = c_custkey
      LEFT JOIN post ON post.o_custkey = c_custkey),
    u AS (
      SELECT CASE WHEN substring(md5(CAST(cust AS VARCHAR) || 'spend'),
                                 1, 4) < '8000'
                  THEN 'treatment' ELSE 'control' END AS arm,
             y, x
      FROM u0),
    st AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM u),
    th AS (
      SELECT CASE WHEN (CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                          / CAST(n AS DOUBLE)) > 0
                  THEN (CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       / (CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n AS DOUBLE))
             END AS theta,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x
      FROM st),
    ua AS (
      SELECT arm, y,
             CAST(ROUND(CASE WHEN theta IS NOT NULL
                             THEN CAST(y AS DOUBLE)
                                  - theta * (CAST(x AS DOUBLE) - mean_x)
                             ELSE CAST(y AS DOUBLE) END, 2)
                  AS DECIMAL(25,2)) AS a
      FROM u CROSS JOIN th),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
          AS nc,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
          AS nt,
        SUM(CASE WHEN arm = 'control' THEN y END) AS syc,
        SUM(CASE WHEN arm = 'treatment' THEN y END) AS syt,
        SUM(CASE WHEN arm = 'control' THEN y * y END) AS syyc,
        SUM(CASE WHEN arm = 'treatment' THEN y * y END) AS syyt,
        SUM(CASE WHEN arm = 'control' THEN a END) AS sac,
        SUM(CASE WHEN arm = 'treatment' THEN a END) AS sat,
        SUM(CASE WHEN arm = 'control' THEN a * a END) AS saac,
        SUM(CASE WHEN arm = 'treatment' THEN a * a END) AS saat
      FROM ua)
    SELECT 'raw' AS variant, nc AS n_control, nt AS n_treatment,
           ROUND({_W_RAW["mc"]}, 6) AS mean_control,
           ROUND({_W_RAW["mt"]}, 6) AS mean_treatment,
           ROUND({_W_RAW["mt"]} - {_W_RAW["mc"]}, 6) AS lift,
           ROUND({_W_RAW["t"]}, 6) AS t_stat,
           ROUND({_W_RAW["dof"]}, 6) AS dof,
           CAST(NULL AS DOUBLE) AS theta,
           CAST(NULL AS DOUBLE) AS var_reduction
    FROM s
    UNION ALL
    SELECT 'cuped', nc, nt,
           ROUND({_W_ADJ["mc"]}, 6),
           ROUND({_W_ADJ["mt"]}, 6),
           ROUND({_W_ADJ["mt"]} - {_W_ADJ["mc"]}, 6),
           ROUND({_W_ADJ["t"]}, 6),
           ROUND({_W_ADJ["dof"]}, 6),
           ROUND((SELECT theta FROM th), 6),
           ROUND(CASE WHEN {_W_RAW["ok"]} AND {_W_ADJ["ok"]}
                      THEN 1.0 - {_W_ADJ["se2"]} / {_W_RAW["se2"]} END, 6)
    FROM s
    ORDER BY variant
"""


@query("cuped_ab_test_customer_spend", _CUPED_ORACLE)
def cuped_ab_test_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (operators/experiment.py:
    cuped_welch_report, Deng et al. 2013): per-customer POST-period
    spend under a deterministic md5 A/B split, Welch-tested raw and
    CUPED-adjusted with PRE-period spend as the covariate. The
    synthetic corpus assigns orders to customers uniformly, so pre and
    post spend are nearly independent and the driver row HONESTLY
    reads theta ~ 0.02 / var_reduction ~ 0.0005 — the degenerate-but-
    correct regime; the 95% reduction CUPED delivers on a correlated
    population is pinned in
    tests/test_analytics.py::test_cuped_variance_reduction. Every
    sum is exact DECIMAL and every statistic a fixed IEEE tree +
    round(,6), so both rows hash-match the oracle."""
    from dwh_with_dask_spark.operators.experiment import (
        ab_assign,
        cuped_welch_report,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cut = F.lit("1998-07-01").cast("timestamp")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    pre = (
        o.filter(F.col("o_orderdate") < cut)
        .groupBy("o_custkey")
        .agg(F.sum(dec).alias("x"))
    )
    post = (
        o.filter(F.col("o_orderdate") >= cut)
        .groupBy("o_custkey")
        .agg(F.sum(dec).alias("y"))
    )
    units = (
        c.select(F.col("c_custkey").alias("cust"))
        .join(pre, pre.o_custkey == F.col("cust"), "left")
        .drop("o_custkey")
        .join(post, post.o_custkey == F.col("cust"), "left")
        .drop("o_custkey")
        .select(
            ab_assign("cust", salt="spend").alias("arm"),
            F.coalesce("y", F.lit(0)).cast("decimal(18,2)").alias("metric"),
            F.coalesce("x", F.lit(0)).cast("decimal(18,2)").alias("covariate"),
        )
    )
    return cuped_welch_report(units).orderBy("variant")


@query(
    "mwu_customer_spend",
    """
    WITH post AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-07-01' GROUP BY 1),
    u0 AS (
      SELECT c_custkey AS cust,
             CAST(COALESCE(post.y, 0) AS DECIMAL(25,2)) AS y
      FROM customer LEFT JOIN post ON post.o_custkey = c_custkey),
    u AS (
      SELECT CASE WHEN substring(md5(CAST(cust AS VARCHAR) || 'spend'),
                                 1, 4) < '8000'
                  THEN 'treatment' ELSE 'control' END AS arm,
             CAST(y AS DOUBLE) AS v
      FROM u0),
    pv AS (
      SELECT v, COUNT(*) AS cnt,
             CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cnt_t
      FROM u GROUP BY v),
    r AS (
      SELECT v, cnt, cnt_t,
             SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS below
      FROM pv),
    a AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_all,
             CAST(SUM(cnt_t) AS BIGINT) AS n_t,
             SUM(CAST(cnt_t AS DOUBLE)
                 * (CAST(below AS DOUBLE)
                    + (CAST(cnt AS DOUBLE) + 1.0) / 2.0)) AS rank_sum_t,
             SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_term
      FROM r)
    SELECT n_all - n_t AS n_control,
           n_t AS n_treatment,
           rank_sum_t
             - CAST(n_t AS DOUBLE) * (CAST(n_t AS DOUBLE) + 1.0) / 2.0
             AS u_stat,
           (CAST(n_all AS DOUBLE) - CAST(n_t AS DOUBLE))
             * CAST(n_t AS DOUBLE) / 2.0 AS mu,
           ROUND(CASE WHEN n_t > 0 AND n_all - n_t > 0
                       AND ((CAST(n_all AS DOUBLE) - CAST(n_t AS DOUBLE))
                            * CAST(n_t AS DOUBLE)
                            * (CAST(n_all AS DOUBLE) + 1.0) / 12.0
                            - (CAST(n_all AS DOUBLE) - CAST(n_t AS DOUBLE))
                              * CAST(n_t AS DOUBLE)
                              * CAST(tie_term AS DOUBLE)
                              / (12.0 * CAST(n_all AS DOUBLE)
                                 * (CAST(n_all AS DOUBLE) - 1.0))) > 0
                 THEN (rank_sum_t
                       - CAST(n_t AS DOUBLE) * (CAST(n_t AS DOUBLE) + 1.0)
                         / 2.0
                       - (CAST(n_all AS DOUBLE) - CAST(n_t AS DOUBLE))
                         * CAST(n_t AS DOUBLE) / 2.0)
                      / sqrt((CAST(n_all AS DOUBLE) - CAST(n_t AS DOUBLE))
                             * CAST(n_t AS DOUBLE)
                             * (CAST(n_all AS DOUBLE) + 1.0) / 12.0
                             - (CAST(n_all AS DOUBLE) - CAST(n_t AS DOUBLE))
                               * CAST(n_t AS DOUBLE)
                               * CAST(tie_term AS DOUBLE)
                               / (12.0 * CAST(n_all AS DOUBLE)
                                  * (CAST(n_all AS DOUBLE) - 1.0)))
            END, 6) AS z_score
    FROM a
    """,
)
def mwu_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U robust A/B readout (operators/experiment.py:
    mann_whitney_u) on the same per-customer post-period spend units as
    the CUPED query — the rank-based test a heavy-tailed revenue metric
    calls for. Ranks come from value-group counts (no global row
    window — the ordered window runs over DISTINCT spend values only),
    rank sums are exact multiples of 0.5, the tie term is exact
    integer arithmetic, and z is one fixed IEEE tree — the row
    hash-matches the oracle."""
    from dwh_with_dask_spark.operators.experiment import (
        ab_assign,
        mann_whitney_u,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cut = F.lit("1998-07-01").cast("timestamp")
    post = (
        o.filter(F.col("o_orderdate") >= cut)
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
    )
    units = (
        c.select(F.col("c_custkey").alias("cust"))
        .join(post, post.o_custkey == F.col("cust"), "left")
        .select(
            ab_assign("cust", salt="spend").alias("arm"),
            F.coalesce("y", F.lit(0)).cast("decimal(25,2)").alias("metric"),
        )
    )
    return mann_whitney_u(units)


@query(
    "srm_check_events_users",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    a AS (
      SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR) || 'exp1'),
                                 1, 4) < '8000'
                  THEN 'treatment' ELSE 'control' END AS arm
      FROM u),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_control,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_treatment
      FROM a)
    SELECT n_control, n_treatment,
           CAST(0.5 AS DOUBLE) AS expected_treat_frac,
           ROUND((CAST(n_treatment AS DOUBLE)
                  - (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE))
                    * 0.5)
                 / sqrt((CAST(n_control AS DOUBLE)
                         + CAST(n_treatment AS DOUBLE))
                        * 0.5 * (1.0 - 0.5)), 6) AS srm_z,
           abs(ROUND((CAST(n_treatment AS DOUBLE)
                  - (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE))
                    * 0.5)
                 / sqrt((CAST(n_control AS DOUBLE)
                         + CAST(n_treatment AS DOUBLE))
                        * 0.5 * (1.0 - 0.5)), 6)) > 3.0 AS srm_alarm
    FROM s
    """,
)
def srm_check_events_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail (operators/experiment.py:
    srm_check) over the same md5 user split as ab_test_purchase_events:
    a healthy deterministic 50/50 assignment must NOT alarm (|z| stays
    within randomization noise) — the check that invalidates every
    other experiment readout when it fires."""
    from dwh_with_dask_spark.operators.experiment import ab_assign, srm_check

    e = load_table(spark, sf_dir, "events")
    units = e.select("user_id").distinct().select(
        ab_assign("user_id", salt="exp1").alias("arm")
    )
    return srm_check(units, expected_treat_frac=0.5)


# the method-specific p_adj CTE bodies for _bh_oracle — each reads the
# ranked CTE `r` (real p-values only, p_rank, m) and adds p_adj
_CORRECTION_ADJ = {
    "bh": """SELECT *, LEAST(1.0, MIN(p_value * m / CAST(p_rank AS DOUBLE))
                           OVER (ORDER BY p_rank DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS p_adj
      FROM r""",
    "by": """SELECT *, LEAST(1.0,
                      MIN(p_value * m * cm / CAST(p_rank AS DOUBLE))
                           OVER (ORDER BY p_rank DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS p_adj
      FROM (SELECT *,
                   ROUND(SUM(1.0 / CAST(p_rank AS DOUBLE)) OVER (), 9)
                     AS cm
            FROM r)""",
    "holm": """SELECT *, LEAST(1.0,
                      MAX(p_value * (m - CAST(p_rank AS DOUBLE) + 1.0))
                           OVER (ORDER BY p_rank ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS p_adj
      FROM r""",
}


def _bh_oracle(method: str = "bh") -> str:
    """Oracle for the multi-metric correction readout: the
    two_proportion_ztest tree per metric (GROUPed), the
    normal_two_sided_p_sql twin for the p-value, then the selected
    correction as windows — ROW_NUMBER over (p, metric) plus

    - ``bh``: an EXACT running MIN of p·m/rank from the bottom rank up
      (no addition, so no rounding idiom beyond p's own 9 dp);
    - ``by``: the same step-up with the factor inflated by the
      harmonic sum c(m) = Σ 1/i, ROUND(,9) in both engines (the one
      ordered double fold — engines' fold orders cannot disagree past
      1e-9 at report sizes);
    - ``holm``: an EXACT running MAX of p·(m−rank+1) from the top
      rank down (step-down, familywise control)."""
    from dwh_with_dask_spark.operators.experiment import (
        normal_two_sided_p_sql,
    )

    types = ["click", "error", "purchase", "signup", "view"]
    # conversion = "ever fired a HIGH-VALUE event of this type" — the
    # value threshold keeps rates interior at every SF (plain "ever
    # fired the type" saturates to 100% on small corpora, degenerating
    # every z to NULL)
    maxes = ",\n             ".join(
        f"MAX(CASE WHEN event_type = '{t}' AND value > 150.0"
        f" THEN 1 ELSE 0 END) AS m_{t}"
        for t in types
    )
    legs = "\n      UNION ALL\n      ".join(
        f"SELECT arm, '{t}' AS metric, m_{t} AS conv FROM a" for t in types
    )
    pool = (
        "(CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))"
        " / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE))"
    )
    zx = (
        "(CAST(x_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)"
        " - CAST(x_control AS DOUBLE) / CAST(n_control AS DOUBLE))"
        f" / sqrt({pool} * (1.0 - {pool})"
        " * (1.0 / CAST(n_control AS DOUBLE)"
        " + 1.0 / CAST(n_treatment AS DOUBLE)))"
    )
    return f"""
    WITH u AS (
      SELECT user_id,
             {maxes}
      FROM events GROUP BY user_id),
    a AS (
      SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR) || 'exp1'),
                                 1, 4) < '8000'
                  THEN 'treatment' ELSE 'control' END AS arm, *
      FROM u),
    l AS (
      {legs}),
    s AS (
      SELECT metric,
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_control,
        CAST(SUM(CASE WHEN arm = 'control' THEN conv ELSE 0 END) AS BIGINT)
          AS x_control,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_treatment,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN conv ELSE 0 END) AS BIGINT)
          AS x_treatment
      FROM l GROUP BY metric),
    z AS (
      SELECT *, CASE WHEN n_control > 0 AND n_treatment > 0
                      AND {pool} > 0 AND {pool} < 1
                     THEN {zx} END AS z_score
      FROM s),
    p AS (SELECT *, {normal_two_sided_p_sql('z_score')} AS p_value FROM z),
    -- the operator's NULL-p contract: only real p-values are ranked
    -- (m counts them alone); degenerate tests pass through unranked
    r AS (
      SELECT *,
             CAST(ROW_NUMBER() OVER (ORDER BY p_value ASC, metric ASC)
                  AS BIGINT) AS p_rank,
             CAST(COUNT(*) OVER () AS DOUBLE) AS m
      FROM p WHERE p_value IS NOT NULL),
    adj AS (
      {_CORRECTION_ADJ[method]})
    SELECT metric, n_control, x_control, n_treatment, x_treatment,
           z_score, p_value, p_rank, p_adj,
           p_adj <= 0.05 AS reject
    FROM adj
    UNION ALL
    SELECT metric, n_control, x_control, n_treatment, x_treatment,
           z_score, p_value, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           FALSE
    FROM p WHERE p_value IS NULL
    ORDER BY p_rank
    """


def _multi_metric_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared front half of the three correction readouts: ONE md5
    user split, FIVE conversion metrics (did the user ever fire a
    high-value event of each type), a pooled two-proportion z per
    metric (two_proportion_ztest's ``by=`` grouping), two-sided normal
    p (normal_two_sided_p — A&S 26.2.17 polynomial, round(,9) absorbs
    ``exp``'s last-ulp variance). Scale shape: the 100 TB work is the
    per-user rollup (one shuffle) + a 5-way explode of unit rows + one
    metric-keyed aggregate; every correction's windows then run on a
    5-row frame."""
    from dwh_with_dask_spark.operators.experiment import (
        ab_assign,
        normal_two_sided_p,
        two_proportion_ztest,
    )

    types = ["click", "error", "purchase", "signup", "view"]
    e = load_table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        *[
            F.max(
                (
                    (F.col("event_type") == t) & (F.col("value") > 150.0)
                ).cast("int")
            ).alias(f"m_{t}")
            for t in types
        ]
    ).withColumn("arm", ab_assign("user_id", salt="exp1"))
    long = units.select(
        "arm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("metric"),
                        F.col(f"m_{t}").alias("conv"),
                    )
                    for t in types
                ]
            )
        ).alias("r"),
    ).select("arm", "r.*")
    z = two_proportion_ztest(long, converted_col="conv", by=["metric"])
    return z.select(
        "metric", "n_control", "x_control", "n_treatment", "x_treatment",
        "z_score", normal_two_sided_p(F.col("z_score")).alias("p_value"),
    )


@query("bh_multi_metric_readout", _bh_oracle("bh"))
def bh_multi_metric_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing-corrected experiment readout (VERDICT r9 ask
    #9; operators/experiment.py:benjamini_hochberg, Benjamini &
    Hochberg 1995): _multi_metric_scored's five per-metric z/p rows,
    then BH: p_adj = step-up min of p·m/rank, reject at FDR 0.05.
    Null-hypothesis data, so rejects should be none — the plumbing,
    the p calibration, and the step-up monotonization are what the
    oracle pins. The per-metric z is bit-exact (IEEE tree over exact
    counts); rank ties break on metric name in both engines."""
    from dwh_with_dask_spark.operators.experiment import benjamini_hochberg

    return benjamini_hochberg(
        _multi_metric_scored(spark, sf_dir),
        p_col="p_value", alpha=0.05, tie_cols=["metric"],
    ).orderBy("p_rank")


@query("by_multi_metric_readout", _bh_oracle("by"))
def by_multi_metric_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli variant of the multi-metric readout
    (VERDICT r10 ask #2 — ``method='by'`` had never been oracle-hashed
    end-to-end): the BH step-up with the factor inflated by the
    harmonic sum c(m) = Σ 1/i (FDR control under ARBITRARY metric
    dependence — the conservative choice for correlated experiment
    metrics, Benjamini & Yekutieli 2001). The harmonic sum is the one
    ordered double fold in the family, rounded to 9 dp in both engines
    before use."""
    from dwh_with_dask_spark.operators.experiment import benjamini_hochberg

    return benjamini_hochberg(
        _multi_metric_scored(spark, sf_dir),
        p_col="p_value", alpha=0.05, tie_cols=["metric"], method="by",
    ).orderBy("p_rank")


@query("holm_multi_metric_readout", _bh_oracle("holm"))
def holm_multi_metric_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-DOWN variant of the multi-metric readout (VERDICT r10
    ask #2 — ``method='holm'`` had never been oracle-hashed
    end-to-end): p_adj = running max of p·(m−rank+1) capped at 1,
    controlling the stricter FAMILYWISE error rate (Holm 1979,
    uniformly more powerful than plain Bonferroni). The running max is
    exact (no addition), so the oracle needs no rounding idiom beyond
    the p input's own."""
    from dwh_with_dask_spark.operators.experiment import benjamini_hochberg

    return benjamini_hochberg(
        _multi_metric_scored(spark, sf_dir),
        p_col="p_value", alpha=0.05, tie_cols=["metric"], method="holm",
    ).orderBy("p_rank")


def _msprt_oracle(tau: float = 0.1, alpha: float = 0.05) -> str:
    """Oracle for the always-valid readout: same counters as the
    z-test oracle, then the mixture-likelihood tree with tau^2 inlined
    as the exact Python double repr (string->double parse is correctly
    rounded, so both engines compute over the identical literal);
    lambda and p round to 9 dp (exp's last-ulp idiom)."""
    t2 = repr(float(tau) * float(tau))
    return f"""
    WITH u AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted
      FROM events GROUP BY user_id),
    a AS (
      SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR) || 'exp1'),
                                 1, 4) < '8000'
                  THEN 'treatment' ELSE 'control' END AS arm,
             converted
      FROM u),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_control,
        CAST(SUM(CASE WHEN arm = 'control' THEN converted ELSE 0 END)
          AS BIGINT) AS x_control,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_treatment,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END)
          AS BIGINT) AS x_treatment
      FROM a),
    c AS (
      SELECT *,
        CAST(x_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
          - CAST(x_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS theta,
        (CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
          / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)) AS pool,
        n_control > 0 AND n_treatment > 0
          AND (CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
              / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)) > 0
          AND (CAST(x_control AS DOUBLE) + CAST(x_treatment AS DOUBLE))
              / (CAST(n_control AS DOUBLE) + CAST(n_treatment AS DOUBLE)) < 1
          AS ok
      FROM s),
    v AS (
      SELECT *,
        pool * (1.0 - pool) * (1.0 / CAST(n_control AS DOUBLE)
                               + 1.0 / CAST(n_treatment AS DOUBLE)) AS vv
      FROM c),
    l AS (
      SELECT *,
        sqrt(vv / (vv + {t2}))
          * exp(theta * theta * {t2} / (2.0 * vv * (vv + {t2}))) AS lam
      FROM v)
    SELECT n_control, x_control, n_treatment, x_treatment,
           CASE WHEN ok THEN theta END AS abs_lift,
           ROUND(CASE WHEN ok THEN lam END, 9) AS lambda_stat,
           ROUND(CASE WHEN ok THEN LEAST(1.0, 1.0 / lam) END, 9)
             AS p_always_valid,
           COALESCE(ROUND(CASE WHEN ok THEN LEAST(1.0, 1.0 / lam) END, 9)
                    <= {alpha}, FALSE) AS reject
    FROM l
    """


@query("msprt_purchase_events", _msprt_oracle())
def msprt_purchase_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid (peeking-safe) A/B readout
    (operators/experiment.py:msprt_always_valid — Johari et al.'s
    mixture SPRT, the continuous-monitoring construction): same units
    and md5 split as ab_test_purchase_events, but the p-value may be
    read after every new unit without alpha inflation. Null-hypothesis
    data, so p_always_valid should sit near 1 and reject=false — the
    statistic's plumbing and the exp-rounding idiom are what the
    oracle pins (lambda and p hash-match at 9 dp)."""
    from dwh_with_dask_spark.operators.experiment import (
        ab_assign,
        msprt_always_valid,
    )

    e = load_table(spark, sf_dir, "events")
    units = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "converted"
        )
    )
    units = units.withColumn("arm", ab_assign("user_id", salt="exp1"))
    return msprt_always_valid(units, tau=0.1, alpha=0.05)


def _ks_counts_exact() -> str:
    """Per-distinct-value count CTEs for the exact KS oracle."""
    return """
    co AS (SELECT v, COUNT(*) AS c FROM old_v GROUP BY v),
    cn AS (SELECT v, COUNT(*) AS c FROM new_v GROUP BY v),"""


def _ks_counts_binned(lo: float, hi: float, bins: int) -> str:
    """Fixed-bin count CTEs — the psi_bin expression's SQL twin
    (floor of one double division, clamped to [0, bins-1]; identical
    IEEE ops in both engines)."""
    width = (hi - lo) / bins
    b = (
        f"LEAST(GREATEST(CAST(floor((v - {lo!r}) / {width!r}) AS BIGINT),"
        f" 0), {bins - 1})"
    )
    return f"""
    co AS (SELECT {b} AS v, COUNT(*) AS c FROM old_v GROUP BY 1),
    cn AS (SELECT {b} AS v, COUNT(*) AS c FROM new_v GROUP BY 1),"""


def _ks_oracle(counts_cte: str) -> str:
    return f"""
    WITH old_v AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-07-01'
        AND o_totalprice IS NOT NULL),
    new_v AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-07-01'
        AND o_totalprice IS NOT NULL),{counts_cte}"""


_KS_ORACLE_TAIL = """
    m AS (
      SELECT COALESCE(co.v, cn.v) AS v,
             COALESCE(co.c, 0) AS c_old, COALESCE(cn.c, 0) AS c_new
      FROM co FULL OUTER JOIN cn ON co.v = cn.v),
    cum AS (
      SELECT v,
             SUM(c_old) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS ao,
             SUM(c_new) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS an
      FROM m),
    tot AS (SELECT CAST(COALESCE(MAX(ao), 0) AS BIGINT) AS n_old,
                   CAST(COALESCE(MAX(an), 0) AS BIGINT) AS n_new
            FROM cum),
    d AS (
      SELECT MAX(ABS(CAST(ao AS DOUBLE)
                       / CASE WHEN n_old > 0 THEN CAST(n_old AS DOUBLE) END
                     - CAST(an AS DOUBLE)
                       / CASE WHEN n_new > 0 THEN CAST(n_new AS DOUBLE) END))
               AS ks_d
      FROM cum CROSS JOIN tot),
    l AS (
      SELECT n_old, n_new, ks_d,
             CASE WHEN n_old > 0 AND n_new > 0
                  THEN ks_d * sqrt(CAST(n_old AS DOUBLE)
                                   * CAST(n_new AS DOUBLE)
                                   / (CAST(n_old AS DOUBLE)
                                      + CAST(n_new AS DOUBLE))) END AS lam
      FROM tot CROSS JOIN d),
    q AS (
      SELECT l.*,
             2.0 * SUM(power(-1.0, CAST(k - 1 AS DOUBLE))
                       * exp(-2.0 * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
                             * lam * lam)) AS series
      FROM l CROSS JOIN (SELECT unnest(range(1, 101)) AS k)
      GROUP BY ALL)
    SELECT n_old, n_new,
           CASE WHEN n_old > 0 AND n_new > 0 THEN ks_d END AS ks_d,
           ROUND(lam, 9) AS ks_lambda,
           ROUND(CASE WHEN lam IS NULL THEN NULL
                      WHEN lam < 0.18 THEN 1.0
                      ELSE LEAST(1.0, GREATEST(0.0, series)) END, 9)
             AS p_value,
           COALESCE(ROUND(CASE WHEN lam IS NULL THEN NULL
                               WHEN lam < 0.18 THEN 1.0
                               ELSE LEAST(1.0, GREATEST(0.0, series)) END, 9)
                    <= 0.05, FALSE) AS reject
    FROM q
"""


@query("ks_drift_orders_price", _ks_oracle(_ks_counts_exact()) + _KS_ORACLE_TAIL)
def ks_drift_orders_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test
    (operators/profile.py:ks_two_sample) of o_totalprice between the
    pre- and post-1998-07 eras — the DISTRIBUTION-FREE companion to
    drift_orders_price_psi (no bins, no [lo, hi) prior): exact integer
    ECDFs over distinct values, D bit-exact with no rounding idiom,
    Kolmogorov's asymptotic p (truncated series + the small-lambda
    clamp) rounded to 9 dp. The synthetic corpus is stationary, so D
    should be small and reject=false; discrimination is pinned on a
    shifted fixture in tests/test_analytics.py."""
    from dwh_with_dask_spark.operators.profile import ks_two_sample

    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-07-01").cast("timestamp")
    return ks_two_sample(
        o.filter(F.col("o_orderdate") < cut),
        o.filter(F.col("o_orderdate") >= cut),
        "o_totalprice",
    )


@query(
    "ks_binned_orders_price",
    _ks_oracle(_ks_counts_binned(0.0, 600000.0, 16)) + _KS_ORACLE_TAIL,
)
def ks_binned_orders_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINNED two-sample KS (operators/profile.py:ks_two_sample_binned
    — VERDICT r10 ask #4): the same era split as ks_drift_orders_price
    but over 16 fixed psi_bin counters instead of exact distinct-value
    ECDFs — the bounded-state variant an always-on streaming monitor
    holds exactly (its counter leg is pinned bit-equal to this batch
    operator in tests/test_streaming.py). The oracle shares the exact
    test's scoring SQL with the bin expression swapped in; D_binned
    <= D_exact with the documented one-bin-mass resolution bound."""
    from dwh_with_dask_spark.operators.profile import ks_two_sample_binned

    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-07-01").cast("timestamp")
    return ks_two_sample_binned(
        o.filter(F.col("o_orderdate") < cut),
        o.filter(F.col("o_orderdate") >= cut),
        "o_totalprice",
        lo=0.0,
        hi=600000.0,
        bins=16,
    )

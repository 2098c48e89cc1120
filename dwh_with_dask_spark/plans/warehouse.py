"""Warehouse-maintenance queries (north-star additions, SURVEY.md §2B).

SCD2 dimension versioning and Z-order clustering — the maintenance
operations around the reference's flat replace/append MySQL loads
(`project-dask.py:94`, `dask-with-dataframe.py:105`) that a versioned,
prunable warehouse needs. Each query has an exact DuckDB oracle: change
detection is null-safe (``eqNullSafe`` ⇔ ``IS DISTINCT FROM``) and the
Z-curve is pure integer bit arithmetic, identical in any engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.operators.scd import (
    scd2_from_changelog,
    scd2_merge,
    snapshot_diff,
)
from dwh_with_dask_spark.operators.zorder import zvalue

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@query(
    "scd2_user_event_history",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    chg AS (
      SELECT user_id, event_type, ts, event_id FROM o
      WHERE event_type IS DISTINCT FROM prev)
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL) AS is_current,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS BIGINT) AS version
    FROM chg
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history built from a changelog: each user's event_type
    stream compacts into versioned validity intervals — one key-shuffle,
    two bounded windows (operators/scd.py)."""
    e = load_table(spark, sf_dir, "events")
    return scd2_from_changelog(
        e, "user_id", "ts", ["event_type"], tiebreak_col="event_id"
    )


# Deterministic update batch derived from the customer table itself (no
# synthesized inputs): every 7th key is in the batch; every 14th is a
# no-op update (exercises the unchanged-values branch), the rest change
# segment and balance.
_SCD2_DIM_SQL = """
    dim AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '2020-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM customer),
    u AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 14 = 0 THEN c_mktsegment
                  ELSE 'SEG_' || CAST(c_custkey % 3 AS VARCHAR)
             END AS c_mktsegment,
             CASE WHEN c_custkey % 14 = 0 THEN c_acctbal
                  ELSE c_acctbal + 100.0
             END AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0),
    chg AS (
      SELECT d.c_custkey FROM dim d JOIN u ON d.c_custkey = u.c_custkey
      WHERE d.c_mktsegment IS DISTINCT FROM u.c_mktsegment
         OR d.c_acctbal IS DISTINCT FROM u.c_acctbal)
"""


@query(
    "scd2_merge_customers",
    f"""
    WITH {_SCD2_DIM_SQL}
    SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
           d.valid_from, d.valid_to, d.is_current
    FROM dim d
    WHERE d.c_custkey NOT IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
           d.valid_from, TIMESTAMP '2024-01-01', FALSE
    FROM dim d WHERE d.c_custkey IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
           TIMESTAMP '2024-01-01', CAST(NULL AS TIMESTAMP), TRUE
    FROM u WHERE u.c_custkey IN (SELECT c_custkey FROM chg)
    """,
)
def scd2_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE of a derived update batch into the customer dimension:
    unchanged keys pass through open, changed keys close at the load
    timestamp and re-open — one full-outer join + row-local generator
    (operators/scd.py); the oracle enumerates the same three branches."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = c.filter(k % 7 == 0).select(
        "c_custkey",
        F.when(k % 14 == 0, F.col("c_mktsegment"))
        .otherwise(F.concat(F.lit("SEG_"), (k % 3).cast("string")))
        .alias("c_mktsegment"),
        F.when(k % 14 == 0, F.col("c_acctbal"))
        .otherwise(F.col("c_acctbal") + F.lit(100.0))
        .alias("c_acctbal"),
    )
    return scd2_merge(
        dim,
        upd,
        "c_custkey",
        ["c_mktsegment", "c_acctbal"],
        F.lit("2024-01-01 00:00:00").cast("timestamp"),
    )


# Two deterministic snapshots derived from the orders table itself:
# keys % 11 = 3 are absent from the OLD snapshot (-> inserts), keys
# % 13 = 5 absent from the NEW one (-> deletes), keys % 9 = 0 change
# status+price between the snapshots (-> updates); everything else is
# identical and must NOT appear in the diff.
_SNAPDIFF_SQL = """
    old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 11 <> 3),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 9 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 5)
"""


@query(
    "snapshot_diff_orders",
    f"""
    WITH {_SNAPDIFF_SQL}
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.o_orderstatus AS old_o_orderstatus,
           o.o_totalprice AS old_o_totalprice,
           n.o_orderstatus AS new_o_orderstatus,
           n.o_totalprice AS new_o_totalprice
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC by snapshot comparison (operators/scd.py:snapshot_diff):
    classify every key across two nightly dumps as insert/delete/update
    via one full-outer key join with null-safe struct comparison — the
    operator that turns the reference's replace-style full loads
    (`project-dask.py:94`) into a changelog. Both snapshots derive
    deterministically from orders, so the DuckDB oracle enumerates the
    identical three branches."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    old = o.filter(k % 11 != 3).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(k % 13 != 5).select(
        "o_orderkey",
        F.when(k % 9 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(k % 9 == 0, F.col("o_totalprice") + F.lit(10.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


@query(
    "incremental_agg_orders",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total_sales,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_totalprice,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) / COUNT(*)
               AS avg_totalprice
    FROM orders GROUP BY 1
    """,
)
def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance
    (operators/rollup.py:merge_aggregate_state): the stored monthly
    state (orders with o_orderkey % 3 <> 0) merges with a new batch's
    partials (the % 3 = 0 rows) WITHOUT re-reading the old input, and
    the reader derives avg from (sum, n) state. The oracle is the full
    recompute over all orders — the merge must be indistinguishable
    from it, bit-for-bit: sums are exact DECIMAL partials, so merge
    order cannot change the result."""
    from dwh_with_dask_spark.operators.rollup import merge_aggregate_state

    o = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(23,2)")).alias(
                "sum_totalprice"
            ),
            F.min("o_totalprice").alias("min_totalprice"),
            F.max("o_totalprice").alias("max_totalprice"),
        )

    stored = partial(o.filter(F.col("o_orderkey") % 3 != 0))
    batch = partial(o.filter(F.col("o_orderkey") % 3 == 0))
    merged = merge_aggregate_state(stored, batch, ["order_month"])
    return merged.select(
        "order_month",
        "n_orders",
        F.col("sum_totalprice").cast("double").alias("total_sales"),
        F.col("min_totalprice").cast("double").alias("min_totalprice"),
        F.col("max_totalprice").cast("double").alias("max_totalprice"),
        (F.col("sum_totalprice").cast("double") / F.col("n_orders")).alias(
            "avg_totalprice"
        ),
    )


@query(
    "merge_into_orders",
    """
    WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    s AS (
      SELECT o_orderkey, 'U' AS op, 'U' AS o_orderstatus,
             o_totalprice + 5.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 'D', o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 11 = 3 AND o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000000, 'I', 'N', 1.0
      FROM orders WHERE o_orderkey % 13 = 1)
    SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
    FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
    WHERE s.op IS NULL
    UNION ALL
    SELECT t.o_orderkey, s.o_orderstatus, s.o_totalprice
    FROM t JOIN s ON t.o_orderkey = s.o_orderkey
    WHERE s.op = 'U'
    UNION ALL
    SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
    FROM s LEFT JOIN t ON t.o_orderkey = s.o_orderkey
    WHERE t.o_orderkey IS NULL
    """,
)
def merge_into_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General MERGE INTO (operators/scd.py:merge_into) — the third
    warehouse load mode beside the reference's replace/append: one
    deterministic source batch carries updates (op='U': every 7th key,
    price +5), deletes (op='D': every 11th ≡ 3, minus the update
    overlap) and inserts (op='I': fresh keys past the domain). ONE
    full-outer key join, row-local CASE emit, in-plan source-key
    uniqueness assertion. The oracle recomputes the same merge as
    three relational branches (kept / updated / inserted)."""
    from dwh_with_dask_spark.operators.scd import merge_into

    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    target = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = o.filter(k % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("__op"),
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 5.0).alias("o_totalprice"),
    )
    deletes = o.filter((k % 11 == 3) & (k % 7 != 0)).select(
        "o_orderkey",
        F.lit("D").alias("__op"),
        "o_orderstatus",
        "o_totalprice",
    )
    inserts = o.filter(k % 13 == 1).select(
        # 1e9 offset: orders keys reach 6M x SF (60M at the sf10 bench
        # ceiling) — a colliding synthetic insert key would either trip
        # the cardinality guard or silently diverge from the oracle
        # (the entity-resolution offset lesson, ADVICE r7).
        (k + 1000000000).alias("o_orderkey"),
        F.lit("I").alias("__op"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    source = updates.unionByName(deletes).unionByName(inserts)
    return merge_into(
        target,
        source,
        ["o_orderkey"],
        update_condition=F.col("src.__op") == "U",
        delete_condition=F.col("src.__op") == "D",
    )


@query(
    "pit_join_user_events",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    chg AS (
      SELECT user_id, event_type, ts, event_id FROM o
      WHERE event_type IS DISTINCT FROM prev),
    dim AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS valid_to
      FROM chg)
    SELECT f.event_id, f.user_id, f.ts, f.event_type,
           d.event_type AS event_type_asof
    FROM events f
    JOIN dim d ON d.user_id = f.user_id
      AND f.ts >= d.valid_from
      AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def pit_join_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (operators/joins.py:point_in_time_join): each
    event joins the SCD2 event_type version valid at its own timestamp
    — the consumer pattern SCD2 history exists for ("attribute AS OF
    the fact's time", the feature-engineering leakage guard). The dim
    is scd2_from_changelog over the same events; the join leads with
    user_id equality so it plans as a key equi-join with the interval
    as residual filter, never a nested-loop over the fact."""
    from dwh_with_dask_spark.operators.joins import point_in_time_join

    e = load_table(spark, sf_dir, "events")
    dim = scd2_from_changelog(
        e, "user_id", "ts", ["event_type"], tiebreak_col="event_id"
    ).select(
        "user_id",
        F.col("event_type").alias("event_type_asof"),
        "valid_from",
        "valid_to",
    )
    fact = e.select("event_id", "user_id", "ts", "event_type")
    return point_in_time_join(fact, dim, ["user_id"], "ts", how="inner")


@query(
    "versioned_prune_orders",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= DATE '2000-01-01'
    GROUP BY o_orderpriority
    """,
)
def versioned_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end manifest-stats data skipping (VERDICT r8 ask #6):
    orders committed as FOUR date-ordered append batches into a
    versioned table with ``stats_cols=['o_orderdate']`` (built once per
    corpus into the content-keyed cache, plans/artifacts.py), then read
    back with ``read_version(prune={'o_orderdate': (2000-01-01,
    None)})`` — the manifest's per-dir min/max drops the three
    earlier-era directories BEFORE Spark lists a single file (pruning
    to 1 of 4 dirs is asserted on inputFiles in
    tests/test_sources.py::test_versioned_prune_orders_query_skips_dirs)
    — and aggregated under the same row filter. The oracle is the
    identical filter+aggregate over the RAW table: pruning may only
    shrink the scan, never the answer. Sums are exact DECIMAL partials
    (the q1 idiom)."""
    import datetime as _dt

    from dwh_with_dask_spark.versioned import read_version

    snap = read_version(
        spark,
        _versioned_orders_table(spark, sf_dir),
        prune={"o_orderdate": (_dt.date(2000, 1, 1), None)},
    )
    return (
        snap.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(23,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def _versioned_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the date-ordered versioned orders table
    the data-skipping queries read: four append commits split on
    o_orderdate era boundaries (the synthetic corpus spans 1995..2001), each carrying o_orderdate min/max into
    its manifest. Published via staging + rename so a crashed build is
    never half-visible."""
    import os

    from dwh_with_dask_spark.fsutil import staged_publish
    from dwh_with_dask_spark.plans.artifacts import artifact_path
    from dwh_with_dask_spark.versioned import versioned_commit

    path = artifact_path(
        "vorders_skip", sf_dir, "orders",
        {"cuts": "1997/1999/2000", "stats": "o_orderdate"},
    )
    if not os.path.exists(path):

        def build(staging: str) -> None:
            o = load_table(spark, sf_dir, "orders")
            d = F.col("o_orderdate")
            cuts = ["1997-01-01", "1999-01-01", "2000-01-01"]
            batches = [
                o.filter(d < cuts[0]),
                o.filter((d >= cuts[0]) & (d < cuts[1])),
                o.filter((d >= cuts[1]) & (d < cuts[2])),
                o.filter(d >= cuts[2]),
            ]
            for i, b in enumerate(batches):
                versioned_commit(
                    b,
                    staging,
                    mode="append" if i else "overwrite",
                    stats_cols=["o_orderdate"],
                )

        staged_publish(path, build)
    return path


def _zvalue_sql(exprs: list[str], bits: int) -> str:
    """DuckDB twin of operators/zorder.zvalue — same shift/mask terms."""
    ncols = len(exprs)
    masked = [f"(CAST({e} AS BIGINT) & {(1 << bits) - 1})" for e in exprs]
    terms = [
        f"((({m} >> {b}) & 1) << {b * ncols + i})"
        for i, m in enumerate(masked)
        for b in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


_Z_SQL = _zvalue_sql(
    [
        "o_custkey",
        "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
    ],
    16,
)


@query(
    "zorder_orders_bucket",
    f"""
    SELECT o_orderkey,
           CAST({_Z_SQL} AS BIGINT) AS zval,
           CAST(({_Z_SQL} >> 26) AS BIGINT) AS bucket
    FROM orders
    """,
)
def zorder_orders_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value of (customer key, order day) per order plus its
    64-way curve bucket — the clustering key ``write_zordered`` sorts
    files by so min/max stats prune on BOTH dimensions. Pure codegen'd
    integer arithmetic, zero shuffle."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit("1992-01-01"))
    )
    z = zvalue([F.col("o_custkey"), day], 16)
    return o.select(
        "o_orderkey",
        z.alias("zval"),
        F.shiftright(z, 26).cast("long").alias("bucket"),
    )


_DQ_ORACLE = """
    SELECT 'unique:o_orderkey' AS rule, 'o_orderkey' AS "column",
           count(o_orderkey) - count(DISTINCT o_orderkey) AS violations,
           count(*) AS n_rows,
           (count(o_orderkey) - count(DISTINCT o_orderkey)) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'not_null:o_custkey', 'o_custkey',
           count(*) - count(o_custkey), count(*),
           (count(*) - count(o_custkey)) = 0
    FROM orders
    UNION ALL
    SELECT 'in_set:o_orderstatus', 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL
                      OR o_orderstatus NOT IN ('F', 'O', 'P')
                    THEN 1 ELSE 0 END) AS BIGINT),
           count(*),
           SUM(CASE WHEN o_orderstatus IS NULL
                      OR o_orderstatus NOT IN ('F', 'O', 'P')
                    THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'in_range:o_totalprice', 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                      OR o_totalprice > 10000000 THEN 1 ELSE 0 END) AS BIGINT),
           count(*),
           SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                      OR o_totalprice > 10000000 THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'predicate:priority_when_open', 'o_orderpriority',
           CAST(SUM(CASE WHEN NOT coalesce(
                      o_orderstatus <> 'O' OR o_orderpriority IS NOT NULL,
                      FALSE) THEN 1 ELSE 0 END) AS BIGINT),
           count(*),
           CAST(SUM(CASE WHEN NOT coalesce(
                      o_orderstatus <> 'O' OR o_orderpriority IS NOT NULL,
                      FALSE) THEN 1 ELSE 0 END) AS BIGINT) = 0
    FROM orders
    UNION ALL
    SELECT 'fk:o_custkey->customer', 'o_custkey',
           (SELECT count(*) FROM orders o
            LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
              ON o.o_custkey = c.c_custkey
            WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL),
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
              ON o.o_custkey = c.c_custkey
            WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) = 0
"""


@query("dq_orders_suite", _DQ_ORACLE)
def dq_orders_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over the orders load (Deequ/dbt
    style, operators/dq.py): uniqueness, completeness, accepted set,
    range, and referential integrity — row-local rules fold into ONE
    scan, uniqueness into one distinct-only aggregate, the FK into one
    left-anti join against the customer dimension."""
    from dwh_with_dask_spark.operators.dq import Rule, dq_checks

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rules = [
        Rule("unique", "o_orderkey"),
        Rule("not_null", "o_custkey"),
        Rule("in_set", "o_orderstatus", values=["F", "O", "P"]),
        Rule("in_range", "o_totalprice", lo=0.0, hi=10_000_000.0),
        Rule(
            "predicate",
            "o_orderpriority",
            name="predicate:priority_when_open",
            predicate=(F.col("o_orderstatus") != "O")
            | F.col("o_orderpriority").isNotNull(),
        ),
        Rule(
            "foreign_key",
            "o_custkey",
            name="fk:o_custkey->customer",
            ref=c,
            ref_col="c_custkey",
        ),
    ]
    return dq_checks(o, rules)


@query(
    "versioned_merge_orders",
    """
    WITH upd AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CASE WHEN o_orderpriority = '5-LOW' AND o_orderkey % 3 = 0
                  THEN o_totalprice + 1000.0 ELSE o_totalprice
             END AS o_totalprice
      FROM orders),
    ins AS (
      SELECT o_orderkey + 100000000 AS o_orderkey, o_orderstatus,
             o_orderpriority, o_totalprice + 1000.0 AS o_totalprice
      FROM orders
      WHERE o_orderpriority = '5-LOW' AND o_orderkey % 3 = 0),
    merged AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total
    FROM merged
    GROUP BY o_orderstatus
    """,
)
def versioned_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-level MERGE INTO (versioned.versioned_merge, row
    semantics from operators.scd.merge_into): orders land in three
    priority-group dirs; the source batch UPDATES the '5-LOW' %3 rows
    (price +1000) and INSERTS the same rows cloned to fresh keys —
    only the one dir containing the matched keys rewrites (asserted in
    the build: dirs_rewritten == 1 under a membership prune), inserts
    land in the rewritten dir, the other two dirs carry by reference.
    Post-merge aggregate hash-matches the oracle restating update +
    insert over the raw table. Sums are exact DECIMAL partials."""
    from dwh_with_dask_spark.versioned import read_version

    snap = read_version(spark, _versioned_merged_orders(spark, sf_dir))
    return snap.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(23,2)"))
        .cast("double")
        .alias("total"),
    )


def _versioned_merged_orders(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the merged-into versioned orders table:
    three priority-group append commits, then one membership-pruned
    dir-granular merge (updates + key-shifted inserts)."""
    import os

    from dwh_with_dask_spark.fsutil import staged_publish
    from dwh_with_dask_spark.plans.artifacts import artifact_path
    from dwh_with_dask_spark.versioned import (
        versioned_commit,
        versioned_merge,
    )

    groups = [
        ("1-URGENT", "3-MEDIUM"),
        ("2-HIGH", "4-NOT SPECIFIED"),
        ("5-LOW",),
    ]
    path = artifact_path(
        "vorders_merged", sf_dir, "orders",
        {"groups": groups, "merge": "5-LOW%3+1000"},
    )
    if not os.path.exists(path):

        def build(staging: str) -> None:
            o = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_orderpriority",
                "o_totalprice",
            )
            for i, g in enumerate(groups):
                versioned_commit(
                    o.filter(F.col("o_orderpriority").isin(list(g))),
                    staging,
                    mode="append" if i else "overwrite",
                    member_cols=["o_orderpriority"],
                )
            hit = o.filter(
                (F.col("o_orderpriority") == "5-LOW")
                & (F.col("o_orderkey") % 3 == 0)
            ).withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
            source = hit.unionByName(
                hit.withColumn(
                    "o_orderkey", F.col("o_orderkey") + 100000000
                )
            )
            rep = versioned_merge(
                spark,
                staging,
                source,
                ["o_orderkey"],
                prune_eq={"o_orderpriority": "5-LOW"},
            )
            if rep["dirs_rewritten"] != 1:  # pragma: no cover
                raise AssertionError(
                    f"expected exactly 1 rewritten dir, got {rep}"
                )

        staged_publish(path, build)
    return path


@query(
    "versioned_delete_orders",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total
    FROM orders
    WHERE NOT (o_orderpriority = '5-LOW' AND o_orderkey % 3 = 0)
    GROUP BY o_orderstatus
    """,
)
def versioned_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE with directory-granular copy-on-write
    (versioned.versioned_delete): orders land in three priority-group
    dirs with membership indexes; the delete targets '5-LOW' rows with
    orderkey % 3 = 0, probing ONLY the dirs the membership index says
    can hold '5-LOW' (prune_eq) and rewriting exactly one dir — the
    build asserts dirs_rewritten == 1, so this query cannot return if
    the delete ever degrades to a full-table rewrite. The post-delete
    aggregate hash-matches the oracle restating the deletion as a
    WHERE NOT on the raw table; time travel to the pre-delete version
    stays intact (asserted in the build). Sums are exact DECIMAL
    partials (the q1 idiom)."""
    from dwh_with_dask_spark.versioned import read_version

    snap = read_version(spark, _versioned_deleted_orders(spark, sf_dir))
    return snap.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(23,2)"))
        .cast("double")
        .alias("total"),
    )


def _versioned_deleted_orders(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the deleted-from versioned orders table:
    three priority-group append commits (membership-indexed), then one
    membership-pruned dir-granular delete. Asserts exactly one dir was
    rewritten and the pre-delete version still reads complete."""
    import os

    from dwh_with_dask_spark.fsutil import staged_publish
    from dwh_with_dask_spark.plans.artifacts import artifact_path
    from dwh_with_dask_spark.versioned import (
        read_version,
        versioned_commit,
        versioned_delete,
    )

    groups = [
        ("1-URGENT", "3-MEDIUM"),
        ("2-HIGH", "4-NOT SPECIFIED"),
        ("5-LOW",),
    ]
    path = artifact_path(
        "vorders_deleted", sf_dir, "orders",
        {"groups": groups, "del": "5-LOW%3"},
    )
    if not os.path.exists(path):

        def build(staging: str) -> None:
            o = load_table(spark, sf_dir, "orders")
            for i, g in enumerate(groups):
                versioned_commit(
                    o.filter(F.col("o_orderpriority").isin(list(g))),
                    staging,
                    mode="append" if i else "overwrite",
                    member_cols=["o_orderpriority"],
                )
            n_before = read_version(spark, staging).count()
            rep = versioned_delete(
                spark,
                staging,
                "o_orderpriority = '5-LOW' AND o_orderkey % 3 = 0",
                prune_eq={"o_orderpriority": "5-LOW"},
            )
            if rep["dirs_rewritten"] != 1:  # pragma: no cover
                raise AssertionError(
                    f"expected exactly 1 rewritten dir, got {rep}"
                )
            if read_version(spark, staging, version=3).count() != n_before:
                raise AssertionError(  # pragma: no cover
                    "pre-delete version no longer reads complete"
                )

        staged_publish(path, build)
    return path


@query(
    "versioned_schema_evolution_orders",
    """
    SELECT o_orderstatus,
           CASE WHEN o_orderkey % 2 = 1 THEN
             (CASE WHEN o_totalprice >= 100000 THEN 'high' ELSE 'low' END)
           END AS o_band,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def versioned_schema_evolution_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema evolution end-to-end (versioned.versioned_commit
    merge_schema, the Delta contract): v1 = even orderkeys WITHOUT the
    o_band column, v2 appends odd orderkeys WITH it under
    merge_schema=True — the read binds the manifest-recorded evolved
    schema, so v1's dir (whose parquet footers lack o_band) reads back
    NULL there, never dropping the column and never failing. The build
    asserts the divergent append is REJECTED without merge_schema
    first, so this query cannot return while enforcement is broken.
    Aggregate over the evolved snapshot hash-matches the same aggregate
    restated on the raw table (band NULL for even keys). Sums are
    exact DECIMAL partials (the q1 idiom)."""
    from dwh_with_dask_spark.versioned import read_version

    snap = read_version(spark, _versioned_evolved_orders(spark, sf_dir))
    return snap.groupBy("o_orderstatus", "o_band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(23,2)"))
        .cast("double")
        .alias("total"),
    )


def _versioned_evolved_orders(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the schema-evolved versioned orders
    table: v1 = even orderkeys (no o_band), v2 = odd orderkeys with
    o_band appended under merge_schema=True, after proving the
    non-merge append raises SchemaEvolutionError."""
    import os

    from dwh_with_dask_spark.fsutil import staged_publish
    from dwh_with_dask_spark.plans.artifacts import artifact_path
    from dwh_with_dask_spark.versioned import (
        SchemaEvolutionError,
        versioned_commit,
    )

    path = artifact_path(
        "vorders_evolved", sf_dir, "orders", {"band_at": 100000}
    )
    if not os.path.exists(path):

        def build(staging: str) -> None:
            o = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
            even = o.filter(F.col("o_orderkey") % 2 == 0)
            odd = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
                "o_band",
                F.when(
                    F.col("o_totalprice") >= 100000, F.lit("high")
                ).otherwise(F.lit("low")),
            )
            versioned_commit(even, staging)
            try:
                versioned_commit(odd, staging, mode="append")
            except SchemaEvolutionError:
                pass
            else:  # pragma: no cover - enforcement regression trip-wire
                raise AssertionError(
                    "divergent append must be rejected without merge_schema"
                )
            versioned_commit(odd, staging, mode="append", merge_schema=True)

        staged_publish(path, build)
    return path


@query(
    "versioned_check_orders",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def versioned_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints end-to-end (VERDICT r10 ask #3;
    versioned.py:versioned_commit(expect=...)): orders committed in two
    halves under manifest-persisted constraints — and between them a
    POISONED batch (prices negated) whose append must be REJECTED on
    the read-back of its written bytes, deleting the staged dir and
    leaving the table at v1 (the build aborts if the rejection does not
    happen, so this query cannot return while enforcement is broken).
    The read-back aggregate over the enforced table hash-matches the
    same aggregate over the RAW table: enforcement admitted exactly the
    clean rows, nothing more, nothing less. Sums are exact DECIMAL
    partials (the q1 idiom)."""
    from dwh_with_dask_spark.versioned import read_version

    snap = read_version(spark, _versioned_checked_orders(spark, sf_dir))
    return snap.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(23,2)"))
        .cast("double")
        .alias("total"),
    )


def _versioned_checked_orders(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the constraint-enforced versioned orders
    table: v1 = even orderkeys committed under {price_pos, key_pos},
    then a poisoned odd-half append (negated prices) that MUST raise —
    enforcement runs on the written bytes, the staged dir is deleted,
    the table stays at v1 — then the clean odd half appends as v2 under
    the v1 manifest's inherited constraints (never re-passed). Final
    content == the raw orders table, which is what lets the driver
    query share the raw table's oracle."""
    import os

    from dwh_with_dask_spark.fsutil import staged_publish
    from dwh_with_dask_spark.plans.artifacts import artifact_path
    from dwh_with_dask_spark.versioned import versioned_commit

    path = artifact_path(
        "vorders_check", sf_dir, "orders",
        {"constraints": "price_pos/key_pos", "halves": "even/odd"},
    )
    if not os.path.exists(path):

        def build(staging: str) -> None:
            o = load_table(spark, sf_dir, "orders")
            even = o.filter(F.col("o_orderkey") % 2 == 0)
            odd = o.filter(F.col("o_orderkey") % 2 == 1)
            versioned_commit(
                even,
                staging,
                expect={
                    "price_pos": "o_totalprice > 0",
                    "key_pos": "o_orderkey >= 0",
                },
            )
            poisoned = odd.withColumn(
                "o_totalprice", -F.abs(F.col("o_totalprice"))
            )
            try:
                versioned_commit(poisoned, staging, mode="append")
            except ValueError:
                pass
            else:
                raise RuntimeError(
                    "CHECK constraint was not enforced on the poisoned "
                    "batch — refusing to publish the artifact"
                )
            versioned_commit(odd, staging, mode="append")

        staged_publish(path, build)
    return path


@query(
    "versioned_member_prune_orders",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderpriority = '2-HIGH'
    GROUP BY o_orderstatus
    """,
)
def versioned_member_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-MEMBERSHIP data skipping (versioned_commit's member_cols +
    read_version(prune_eq=...)): orders committed as three append
    batches holding priority sets {URGENT, MEDIUM} / {HIGH, NOT
    SPECIFIED} / {LOW} — an interleaving a min/max RANGE cannot prune
    for a point lookup ('2-HIGH' sits lexicographically INSIDE the
    first dir's [1-URGENT, 3-MEDIUM] span) but the per-dir crc32
    position set prunes exactly (2 of 3 dirs dropped, pinned on
    inputFiles in tests/test_sources.py). Same filter+aggregate oracle
    over the raw table: pruning shrinks the scan, never the answer."""
    from dwh_with_dask_spark.versioned import read_version

    snap = read_version(
        spark,
        _versioned_member_orders_table(spark, sf_dir),
        prune_eq={"o_orderpriority": "2-HIGH"},
    )
    return (
        snap.filter(F.col("o_orderpriority") == "2-HIGH")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(23,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def _versioned_member_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus) the membership-indexed versioned orders
    table: three append commits whose priority SETS interleave across
    the lexicographic range, so only the membership index — not
    min/max — can prune a point lookup."""
    import os

    from dwh_with_dask_spark.fsutil import staged_publish
    from dwh_with_dask_spark.plans.artifacts import artifact_path
    from dwh_with_dask_spark.versioned import versioned_commit

    groups = [
        ("1-URGENT", "3-MEDIUM"),
        ("2-HIGH", "4-NOT SPECIFIED"),
        ("5-LOW",),
    ]
    path = artifact_path(
        "vorders_member", sf_dir, "orders",
        {"groups": groups, "member": "o_orderpriority"},
    )
    if not os.path.exists(path):

        def build(staging: str) -> None:
            o = load_table(spark, sf_dir, "orders")
            for i, g in enumerate(groups):
                versioned_commit(
                    o.filter(F.col("o_orderpriority").isin(list(g))),
                    staging,
                    mode="append" if i else "overwrite",
                    member_cols=["o_orderpriority"],
                )

        staged_publish(path, build)
    return path


@query(
    "versioned_read_changes_orders",
    """
    WITH hit AS (
      SELECT * FROM orders
      WHERE o_orderpriority = '5-LOW' AND o_orderkey % 3 = 0)
    SELECT o_orderkey, 'update' AS change_type,
           o_orderstatus AS old_o_orderstatus,
           o_orderpriority AS old_o_orderpriority,
           o_totalprice AS old_o_totalprice,
           o_orderstatus AS new_o_orderstatus,
           o_orderpriority AS new_o_orderpriority,
           o_totalprice + 1000.0 AS new_o_totalprice
    FROM hit
    UNION ALL
    SELECT o_orderkey + 100000000, 'insert',
           NULL, NULL, NULL,
           o_orderstatus, o_orderpriority, o_totalprice + 1000.0
    FROM hit
    """,
)
def versioned_read_changes_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed read (versioned.read_changes, VERDICT r14 ask
    #5): the merge commit's changes on the merged-orders fixture,
    reconstructed from the manifest dir diff — only the one rewritten
    5-LOW dir and its replacement are scanned, never the two carried
    dirs. Hash-matches the oracle restating the merge as update +
    insert rows over the raw table (unmodified rows in the rewritten
    dir drop out via the null-safe comparison); equality with the
    full-snapshot snapshot_diff for every version pair is pinned in
    tests/test_sources.py::test_read_changes_equals_snapshot_diff."""
    from dwh_with_dask_spark.versioned import read_changes

    t = _versioned_merged_orders(spark, sf_dir)
    return read_changes(spark, t, 3, 4, ["o_orderkey"])

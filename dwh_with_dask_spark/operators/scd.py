"""Slowly-changing-dimension (SCD type 2) operators.

North-star additions (ABSENT-IN-REFERENCE, SURVEY.md §2B): the
reference's warehouse loads (`project-dask.py:94` ``if_exists='replace'``,
`dask-with-dataframe.py:105` ``if_exists='append'``) only overwrite or
blindly append — a real warehouse dimension needs versioned history.
These operators produce/maintain the standard SCD2 shape
(``valid_from``, ``valid_to``, ``is_current``, ``version``) with pure
DataFrame algebra:

- ``scd2_from_changelog`` compacts an event/CDC stream into version
  history: ONE shuffle on the business key, two bounded per-key windows
  (change detection + interval stitching). No join, no corpus re-scan.
- ``scd2_merge`` applies a daily update batch to an existing dimension:
  ONE full-outer join on the key plus a row-local generator that emits
  0–2 rows per key (close-old / open-new). Historical (already closed)
  rows pass through untouched — at 100 TB the closed majority of the
  dimension is never shuffled, only the current slice joins the batch.

Determinism: change detection is a null-safe struct comparison
(``eqNullSafe``), so NULL attribute values compare stably and the same
semantics express in ANSI SQL as ``IS DISTINCT FROM`` — which is what
makes these oracle-able cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_changelog(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tracked_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Compact a changelog (one row per observation of a key's tracked
    attributes) into SCD2 history: consecutive observations with
    identical tracked values collapse into one version row.

    Output: key, *tracked, ``valid_from`` (first ts of the version),
    ``valid_to`` (next version's valid_from; NULL = open), ``is_current``,
    ``version`` (1-based per key).

    Scale shape: partition by key once; both windows (lag for change
    detection, lead/row_number for interval stitching) reuse that single
    exchange — the second window runs over the already-compacted rows
    (versions per key, not observations per key). Hot keys bound the
    per-task work by their own observation count; there is no global
    order and no driver-side state. Ties on ``ts_col`` are broken by
    ``tiebreak_col`` (pass the event/lsn id) — without it, equal
    timestamps would make version order nondeterministic.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)

    cur = F.struct(*[F.col(c) for c in tracked_cols])
    prev = F.lag(cur).over(w)
    # eqNullSafe: first observation (prev IS NULL) and any NULL attribute
    # compare deterministically — matches SQL `IS DISTINCT FROM`.
    changed = ~cur.eqNullSafe(prev)

    compacted = (
        df.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return compacted.select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull()).withColumn(
        "version",
        F.row_number()
        .over(
            Window.partitionBy(key_col).orderBy(
                F.col("valid_from").asc()
            )
        )
        .cast("long"),
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    load_ts: Column,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension (MERGE semantics):

    - key absent from the batch, or batch values identical → current row
      passes through open;
    - tracked values differ → current row closes at ``load_ts`` and a new
      current row opens at ``load_ts``;
    - brand-new key → one new current row.

    ``dim`` must carry ``valid_from``, ``valid_to``, ``is_current``;
    ``updates`` carries the key + tracked columns (one row per key — the
    caller compacts intra-batch duplicates first, e.g. with
    ``scd2_from_changelog`` on the batch).

    Plan shape: ``is_current`` splits the dimension ONCE (with partition
    or file pruning when the dimension is stored partitioned on it);
    closed history is never joined or shuffled. The current slice
    full-outer-joins the batch on the key — AQE broadcast-joins small
    daily batches on its own (no forced hint; the round-2 lesson) — and a
    row-local array+explode emits the 0–2 output rows per key, so the
    whole merge is one join plus map-side work.
    """
    vt_type = dim.schema["valid_to"].dataType
    hist = dim.filter(~F.col("is_current"))
    cur = dim.filter(F.col("is_current")).withColumn("__has_c", F.lit(True))
    upd = updates.select(
        F.col(key_col),
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
        F.lit(True).alias("__has_u"),
    )
    j = cur.join(upd, key_col, "full_outer")

    cur_vals = F.struct(*[F.col(c).alias(c) for c in tracked_cols])
    upd_vals = F.struct(*[F.col(f"__u_{c}").alias(c) for c in tracked_cols])
    same = cur_vals.eqNullSafe(upd_vals)

    def _row(vals: Column, vfrom: Column, vto: Column, is_cur: Column) -> Column:
        return F.struct(
            vals.alias("vals"),
            vfrom.alias("valid_from"),
            vto.cast(vt_type).alias("valid_to"),
            is_cur.alias("is_current"),
        )

    open_null = F.lit(None).cast(vt_type)
    keep_open = _row(cur_vals, F.col("valid_from"), F.col("valid_to"), F.lit(True))
    closed = _row(cur_vals, F.col("valid_from"), load_ts, F.lit(False))
    fresh = _row(upd_vals, load_ts, open_null, F.lit(True))

    rows = (
        F.when(F.col("__has_u").isNull(), F.array(keep_open))
        .when(F.col("__has_c").isNull(), F.array(fresh))
        .when(same, F.array(keep_open))
        .otherwise(F.array(closed, fresh))
    )
    merged = j.select(F.col(key_col), F.explode(rows).alias("__r")).select(
        F.col(key_col),
        *[F.col(f"__r.vals.{c}").alias(c) for c in tracked_cols],
        F.col("__r.valid_from").alias("valid_from"),
        F.col("__r.valid_to").alias("valid_to"),
        F.col("__r.is_current").alias("is_current"),
    )
    out_cols = [key_col, *tracked_cols, "valid_from", "valid_to", "is_current"]
    return hist.select(*out_cols).unionByName(merged.select(*out_cols))


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    update_condition: Column | None = None,
    delete_condition: Column | None = None,
    insert: bool = True,
    check_unique_source: bool = True,
) -> DataFrame:
    """General MERGE (upsert) — the Delta/Iceberg ``MERGE INTO``
    statement reduced to its deterministic core as pure DataFrame
    algebra over plain tables. The reference's warehouse loads only
    ``replace`` or blindly ``append`` (`project-dask.py:94`); this is
    the third load mode every warehouse needs:

    - target row with no source match → kept as-is;
    - matched and ``delete_condition`` (source cols in scope via
      ``src.<c>``) → dropped;
    - matched and ``update_condition`` (default: always) → target row
      with ``update_cols`` (default: every non-key source column that
      exists in the target) replaced by the source values;
    - source row with no target match → inserted when ``insert``
      (columns aligned by name; target columns the source lacks are
      NULL), like ``WHEN NOT MATCHED THEN INSERT``.

    ``check_unique_source=True`` enforces MERGE's cardinality rule
    in-plan: a source with two rows for one key would make the result
    nondeterministic, so it raises (Delta's "multiple source rows
    matched" error) via a window count + ``assert_true`` — distributed,
    no driver action, and free when the source is key-unique.

    Conditions reference source columns as ``src.<col>`` and target
    columns as ``tgt.<col>`` (both sides are aliased); plain
    ``F.col("x")`` works when unambiguous.

    NULL keys (documented divergence from SQL MERGE): keys match
    NULL-SAFELY (``eqNullSafe`` / IS NOT DISTINCT FROM), the same
    contract as this module's SCD operators — a NULL source key
    UPDATES a NULL target key rather than inserting a second NULL-key
    row, and the cardinality rule groups all NULL-key source rows
    together. Delta/Iceberg ``MERGE ON t.k = s.k`` never matches NULL
    keys (NULL-key source rows always insert). Pre-filter NULL-key
    rows out of the source if you need the SQL behavior; surrogate/
    natural keys are non-NULL in every sane warehouse, so the safe
    default here is the one that avoids silently duplicating rows.

    Scale shape: ONE full-outer join on the key. The closed form
    mirrors ``scd2_merge``: when the target is key-bucketed the join
    co-locates without shuffling the target, and AQE broadcast-joins
    batch-sized sources on its own (no forced hint). Emit is row-local
    (CASE over the joined row) — nothing is re-scanned, no second
    shuffle.
    """
    out_schema = target.columns
    if update_cols is None:
        update_cols = [
            c for c in source.columns if c not in keys and c in out_schema
        ]
    src = source
    if check_unique_source:
        # The assertion must be LOAD-BEARING in the plan: a computed
        # column that is only dropped gets pruned by Catalyst and the
        # check silently disappears. A filter on it cannot be pruned —
        # assert_true returns NULL (isNull = true) when the count is 1
        # and throws otherwise.
        w = Window.partitionBy(*keys)
        src = (
            src.withColumn("__cnt", F.count(F.lit(1)).over(w))
            .filter(
                F.assert_true(
                    F.col("__cnt") == 1,
                    F.lit("merge_into: multiple source rows share a key"),
                ).isNull()
            )
            .drop("__cnt")
        )
    tgt = target.withColumn("__t", F.lit(True)).alias("tgt")
    src = src.withColumn("__s", F.lit(True)).alias("src")
    cond = None
    for k in keys:
        eq = F.col(f"tgt.{k}").eqNullSafe(F.col(f"src.{k}"))
        cond = eq if cond is None else (cond & eq)
    j = tgt.join(src, cond, "full_outer")

    matched = F.col("tgt.__t").isNotNull() & F.col("src.__s").isNotNull()
    tgt_only = F.col("src.__s").isNull()
    src_only = F.col("tgt.__t").isNull()

    upd_cond = (
        F.lit(True) if update_condition is None else update_condition
    )
    del_cond = (
        F.lit(False) if delete_condition is None else delete_condition
    )

    def _emit(getter) -> Column:
        return F.struct(*[getter(c).alias(c) for c in out_schema])

    keep = _emit(lambda c: F.col(f"tgt.{c}"))
    updated = _emit(
        lambda c: F.col(f"src.{c}") if c in update_cols else F.col(f"tgt.{c}")
    )
    inserted = _emit(
        lambda c: F.col(f"src.{c}")
        if c in source.columns
        else F.lit(None).cast(target.schema[c].dataType)
    )

    row = (
        F.when(tgt_only, keep)
        .when(matched & del_cond, F.lit(None))
        .when(matched & upd_cond, updated)
        .when(matched, keep)
        .when(src_only & F.lit(insert), inserted)
    )
    return (
        j.select(row.alias("__r"))
        .filter(F.col("__r").isNotNull())
        .select(*[F.col(f"__r.{c}").alias(c) for c in out_schema])
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC by snapshot comparison: classify every key across two table
    snapshots as ``insert`` (new only), ``delete`` (old only),
    ``update`` (both, any compared column differs null-safely) or drop
    it (both, identical). The operator that turns nightly full dumps —
    the reference's ``if_exists='replace'`` world
    (`project-dask.py:94`) — into a changelog `scd2_from_changelog`
    can consume.

    Output: key cols, ``change_type``, each compared column twice
    (``old_<c>``, ``new_<c>``; one side NULL for inserts/deletes).

    Scale shape: ONE full-outer shuffle join on the key — both sides
    are fact-sized, so there is deliberately no broadcast; on
    key-bucketed storage the join co-locates with zero shuffle. The
    null-safe struct comparison is ``eqNullSafe`` == ANSI ``IS NOT
    DISTINCT FROM``, which is what makes this oracle-able.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__ov"),
    )
    nw = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__nv"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(nw, cond, "full_outer")
    in_old = F.col("__ov").isNotNull()
    in_new = F.col("__nv").isNotNull()
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~F.col("__ov").eqNullSafe(F.col("__nv")), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
                for k in key_cols
            ],
            "change_type",
            *[F.col(f"__ov.{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"__nv.{c}").alias(f"new_{c}") for c in compare_cols],
        )
    )

"""Join operators Spark lacks as single builtins: as-of join, range join.

ABSENT-IN-REFERENCE (SURVEY.md §2B): the reference performs zero joins;
these are capability-surface operators, designed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    suffix: str = "",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    greatest ``right_time <= left_time`` (backward) sharing the key(s).

    ``tolerance`` (e.g. ``'30 days'``) additionally requires the match
    to lie within that interval of the left time — stale matches null
    out, the standard as-of tolerance cap. Row-local post-filter on the
    carried match time: no extra shuffle, no plan change.

    Spark-first implementation — the union trick, ONE shuffle+sort total:
    tag both sides, union them, and for each left row take the running
    ``last(<right col>, ignorenulls=True)`` over a window partitioned by
    key and ordered by (time, side-tag). Right rows sort before left rows
    at equal timestamps, so ties match (<= semantics). This scales as a
    single sort-within-key — no per-key loops, no broadcast of either
    side, no O(n*m) range-join blowup; skewed keys are handled by AQE like
    any other window shuffle.

    ``direction='forward'`` gives the smallest ``right_time >= left_time``
    (implemented by negating the sort order).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)

    left_cols = left.columns
    right_payload = [c for c in right.columns if c not in keys]
    out_names = {c: (c + suffix if c in left_cols else c) for c in right_payload}

    # Common layout: keys, event time, side tag, left payload, right payload.
    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_payload],
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        *[F.col(c).alias(out_names[c]) for c in right_payload],
    )
    unioned = lhs.unionByName(rhs)

    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    filled = unioned.select(
        "*",
        *[
            F.last(out_names[c], ignorenulls=True).over(w).alias("__f_" + out_names[c])
            for c in right_payload
        ],
    )
    def value_of(c: str):
        v = F.col("__f_" + out_names[c])
        if tolerance is None:
            return v
        # match time rides along as the filled right_time column; a
        # match farther than the tolerance (or missing) nulls out.
        mt = F.col("__f_" + out_names[right_time])
        ivl = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            ok = mt.isNotNull() & (F.col("__t") <= mt + ivl)
        else:
            ok = mt.isNotNull() & (mt <= F.col("__t") + ivl)
        return F.when(ok, v)

    result = (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *keys,
            F.col("__t").alias(left_time),
            *[F.col(c) for c in left_cols if c not in keys and c != left_time],
            *[value_of(c).alias(out_names[c]) for c in right_payload],
        )
    )
    return result


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side, replicate
    the right side ``salt`` ways, join on (keys, salt).

    The classic manual remedy when one join key carries a hot fraction of
    the data and a plain shuffle join puts that whole key into one task:
    each left row gets a random salt in [0, salt), the right side is
    exploded across all salt values, and the join key becomes
    (keys…, salt) — the hot key's rows spread over ``salt`` tasks. Cost:
    the right side shuffles ``salt``× its size, so use it when the right
    side is much smaller than the hot key's row count (but too big to
    broadcast — broadcast is always the first choice when it fits).

    Prefer AQE's automatic skew-join splitting
    (spark.sql.adaptive.skewJoin.enabled, on by default in this engine's
    session factory) for sort-merge joins; salting remains the tool when
    the skew is in a hash aggregation upstream, when AQE's split
    thresholds don't trigger (a partition must exceed BOTH
    skewedPartitionThresholdInBytes — 256 MB by default — and
    skewedPartitionFactor x the median partition), or on engines/paths
    AQE doesn't cover. tests/test_plans.py::
    test_aqe_splits_skewed_sort_merge_join demonstrates AQE's runtime
    split on a hot-key sort-merge join and documents the governing
    thresholds; BENCH_SCALE.md carries the measured AQE-vs-salted
    comparison at sf1.
    Semantics: identical row multiset to ``left.join(right, on, how)``
    for 'inner' and 'left' joins (each left row matches exactly its salt
    replica).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    lsalted = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    rsalted = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = lsalted.join(rsalted, [*keys, "__salt"], how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    buckets: DataFrame,
    value: str | Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
    broadcast_buckets: bool = True,
) -> DataFrame:
    """Join rows to interval buckets: ``lo <= value < hi``.

    With a small bucket dimension (the normal case) the bucket side is
    broadcast, so the non-equi condition evaluates as a broadcast
    nested-loop join — no shuffle of the fact side at all. For two LARGE
    interval sets, pre-bucket both sides to a common grid and equi-join on
    the grid cell before applying the residual range predicate.
    """
    v = F.col(value) if isinstance(value, str) else value
    b = F.broadcast(buckets) if broadcast_buckets else buckets
    cond = (v >= b[lo]) & (v < b[hi])
    return left.join(b, cond, how)


def point_in_time_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
    keep_validity: bool = False,
    suffix: str = "_dim",
) -> DataFrame:
    """Temporal (point-in-time) join: each fact row joins the dimension
    VERSION that was valid at the fact's timestamp —
    ``dim.valid_from <= fact.ts < dim.valid_to`` (NULL ``valid_to`` =
    still open). The standard consumer of an SCD2 dimension
    (``scd2_from_changelog`` / ``scd2_merge`` output): point-in-time
    correctness is what SCD2 history exists FOR, e.g. "the customer's
    segment AS OF the order date", and is also the leakage guard in
    feature engineering (never join a feature version from the
    future).

    Scale shape: the join condition leads with the KEY EQUALITY, so
    Spark plans a plain hash/sort-merge equi-join on the keys (ONE key
    shuffle; broadcast when the dim is small) and evaluates the
    interval predicate as the join's residual filter — never a
    BroadcastNestedLoopJoin over the fact. SCD2 dims have few versions
    per key, so per-key match work is bounded by the version count.
    An exclusive upper bound means a fact exactly on a version
    boundary matches ONLY the newer version — versions partition the
    timeline, so an in-range fact row matches exactly one version and
    a ``left`` join preserves fact cardinality (facts before the
    key's first version, or unknown keys, keep NULL dim columns).

    Output columns: every fact column, then the dim's attribute
    columns; a dim column whose name clashes with a fact column is
    renamed with ``suffix`` (never a silent duplicate name — a frame
    with two ``ts`` columns poisons every downstream reference with
    AMBIGUOUS_REFERENCE). ``valid_from``/``valid_to`` are dropped
    unless ``keep_validity`` — consumers want the attribute AS OF the
    fact time, not the version bookkeeping.
    """
    f, d = fact.alias("f"), dim.alias("d")
    cond = None
    for k in keys:
        eq = F.col(f"f.{k}") == F.col(f"d.{k}")
        cond = eq if cond is None else (cond & eq)
    ts = F.col(f"f.{ts_col}")
    cond = (
        cond
        & (ts >= F.col(f"d.{valid_from}"))
        & (F.col(f"d.{valid_to}").isNull() | (ts < F.col(f"d.{valid_to}")))
    )
    skip = set(keys) | (set() if keep_validity else {valid_from, valid_to})
    dim_cols = [c for c in dim.columns if c not in skip]
    taken = set(fact.columns)
    out_names = [c + suffix if c in taken else c for c in dim_cols]
    # The suffix rename can itself collide (ADVICE r8): dim carrying both
    # "ts" and "ts_dim" maps two columns onto "ts_dim", or a suffixed name
    # lands on another fact column — exactly the duplicate-column frame
    # the contract above promises never to emit. Fail loudly here, not
    # with AMBIGUOUS_REFERENCE three operators downstream.
    final = fact.columns + out_names
    if len(set(final)) != len(final):
        dupes = sorted({c for c in final if final.count(c) > 1})
        raise ValueError(
            f"point_in_time_join: suffix {suffix!r} does not disambiguate "
            f"output columns {dupes}; pick a suffix not already used by a "
            "fact or dim column"
        )
    return f.join(d, cond, how).select(
        *[F.col(f"f.{c}") for c in fact.columns],
        *[
            F.col(f"d.{c}").alias(n)
            for c, n in zip(dim_cols, out_names)
        ],
    )


def _deletion_variants(s: Column, max_dist: int) -> Column:
    """Distinct strings reachable from ``s`` by ≤ ``max_dist`` single
    character deletions (including ``s`` itself). O(len^max_dist)
    variants per row — the short-key regime (names, codes, titles) this
    index is for."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")

    def deletes(t: Column) -> Column:
        # all single-deletions of t; [] for the empty string
        return F.when(
            F.length(t) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.length(t)),
                lambda i: F.concat(
                    F.substr(t, F.lit(1), i - F.lit(1)),
                    F.substr(t, i + F.lit(1), F.length(t)),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # Bind s once (the word_ngrams single-element-transform idiom) so
    # lambda re-evaluation can't re-inline an upstream expression.
    def build(t: Column) -> Column:
        d1 = deletes(t)
        out = F.concat(F.array(t), d1)
        if max_dist == 2:
            out = F.concat(out, F.flatten(F.transform(d1, deletes)))
        return F.array_distinct(out)

    return F.flatten(F.transform(F.array(s), build))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """Approximate string join: ALL pairs with ``levenshtein(l, r) <=
    max_dist``, without the |L|x|R| product.

    Blocking is the FastSS / SymSpell deletion-neighborhood index
    (Bocek et al. 2007, public): every string expands to its ≤d-deletion
    variants, both sides explode to (row, variant), and candidates come
    from an ordinary equi-join on the variant string. COMPLETE recall —
    if ``lev(a, b) <= d`` then deleting the edited positions from each
    side yields a common variant, so unlike prefix/suffix/q-gram
    blocking there is no missed-pair regime; the exact ``levenshtein``
    then verifies (deletion-variant collision is necessary, not
    sufficient), with a length-band pre-filter ahead of the O(len²)
    distance.

    Scale shape: the variant index multiplies each side by
    ~len^d (short keys only — names, SKUs, titles; for documents use
    the MinHash path in operators/dedup.py), the join shuffles hashed
    short strings with AQE handling hot variants like any skewed key,
    and pairs dedupe before the verify so each candidate pays
    levenshtein once.

    Output: all left columns + all right columns + ``dist``. Column
    names must not collide across sides. Contract: inputs are treated
    as row-distinct — the variant join necessarily produces one
    candidate row per colliding variant pair, and the dedup that
    collapses those back to one row per (left row, right row) cannot
    distinguish genuinely identical input rows; carry an id column if
    duplicate rows must survive.
    """
    lb = left.select(
        "*",
        F.explode(_deletion_variants(F.col(left_col), max_dist)).alias("__v"),
    )
    rb = right.select(
        "*",
        F.explode(_deletion_variants(F.col(right_col), max_dist)).alias("__v"),
    )
    cand = lb.join(rb, "__v").drop("__v").dropDuplicates()
    lev = F.levenshtein(F.col(left_col), F.col(right_col))
    band = (
        F.abs(F.length(F.col(left_col)) - F.length(F.col(right_col)))
        <= F.lit(max_dist)
    )
    return cand.filter(band).filter(lev <= F.lit(max_dist)).select(
        "*", lev.alias("dist")
    )

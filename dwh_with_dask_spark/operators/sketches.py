"""Frequency sketches: exact heavy hitters + count-min sketch.

North-star additions (ABSENT-IN-REFERENCE, SURVEY.md §2B): frequency
profiling a training-data pipeline runs over token/URL/domain streams.

- ``heavy_hitters`` is the exact path: one map-side-combined count
  aggregation (vocabulary-sized output), then a share filter against the
  broadcast total. At 100 TB this is usually affordable BECAUSE of the
  map-side combine — each task emits its local vocabulary, not its
  token stream.
- ``cms_build`` / ``cms_estimate`` are the bounded-memory path: a
  count-min sketch of ``depth × width`` counters. The build aggregates
  exact per-key counts first (map-side combine again) and then folds
  them into cells — additive, so per-partition sketches merge by cell
  sum, which is exactly the ``groupBy(row, cell).sum`` below. Estimates
  are the classic min-over-rows upper bound: ``est >= true`` always,
  with overestimates bounded by collisions (ε = e/width with the usual
  analysis).

- ``bottomk_sample`` / ``quantile_sketch`` are the mergeable quantile
  path: a deterministic bottom-k sample under md5 priorities (per-
  partition TakeOrderedAndProject partials, no full sort/shuffle) whose
  exact sample percentiles estimate the column's quantiles.

Determinism contract: cell indices and sample priorities derive from
md5 hex, not Spark's xxhash64 or RNG — identical in any engine with
md5, which is what lets the DuckDB oracle rebuild the SAME sketch and
match estimates bit-for-bit (plans/curation.py, plans/analytics.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cell(key: Column, row: int, width: int, salt: str) -> Column:
    h = F.substring(F.md5(F.concat(key, F.lit(f"{salt}{row}"))), 1, 8)
    return (F.conv(h, 16, 10).cast("long") % width).cast("long")


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_share: float,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact heavy hitters: keys carrying at least ``min_share`` of the
    total (row count, or ``weight_col`` mass). Output: key, cnt, share.

    Plan: one count/sum aggregation keyed on ``key_col`` (map-side
    partials — the shuffle moves vocabularies, not occurrences), a
    1-row total broadcast, a filter. The total branch re-references the
    counts aggregation, but it is NOT a second pass over the occurrence
    stream: AQE materializes shuffle stages bottom-up and reuses the
    canonically-identical counts exchange for the broadcast subquery —
    measured at sf1, the whole query costs the counts aggregation alone
    (2.7 s vs 2.6 s for bare counts), and an explicit persist of the
    counts frame changes nothing. The share division happens once per
    surviving key, so the only doubles in play are deterministic.
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1)
    counts = df.groupBy(key_col).agg(F.sum(w).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "share", F.col("cnt").cast("double") / F.col("__total").cast("double")
        )
        .filter(F.col("share") >= min_share)
        .select(key_col, "cnt", "share")
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of the key frequency distribution:
    ``depth × width`` cells as rows (row, cell, total).

    Two aggregations, both with map-side combine: occurrences →
    per-key counts (vocabulary-sized), then per-key counts → cells
    (``depth × width`` rows — constant-sized, broadcastable, storable
    as the persisted sketch). Folding AFTER the exact per-key agg means
    the explode factor ``depth`` applies to the vocabulary, never the
    corpus.
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1)
    counts = df.groupBy(key_col).agg(F.sum(w).alias("__cnt"))
    return cms_build_from_counts(
        counts, key_col, "__cnt", depth=depth, width=width, salt=salt
    )


def cms_build_from_counts(
    counts: DataFrame,
    key_col: str,
    cnt_col: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """Fold an ALREADY-AGGREGATED (key, count) frame into the sketch.

    The entry point for callers that also need the exact counts (e.g.
    estimate-vs-exact comparisons): passing the shared counts frame in
    keeps one logical aggregation of the occurrence stream in the plan,
    which AQE reuses stage-wise across all consumers."""
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _cell(k, r, width, salt).alias("cell")
            )
            for r in range(depth)
        ]
    )
    return (
        counts.select(F.explode(cells).alias("__c"), F.col(cnt_col))
        .groupBy(F.col("__c.row").alias("row"), F.col("__c.cell").alias("cell"))
        .agg(F.sum(cnt_col).alias("total"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """Point estimates for ``keys`` from a built sketch: min over the
    depth rows of the addressed cells — the CMS upper bound.

    The sketch is depth×width rows; the join against it broadcasts the
    sketch, so estimating any number of keys is map-side work.
    """
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _cell(k, r, width, salt).alias("cell")
            )
            for r in range(depth)
        ]
    )
    probes = keys.select(F.col(key_col), F.explode(cells).alias("__c")).select(
        key_col, F.col("__c.row").alias("row"), F.col("__c.cell").alias("cell")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy(key_col)
        .agg(F.min("total").alias("cms_est"))
    )


def bottomk_sample(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int,
    salt: str = "qsk",
) -> DataFrame:
    """Deterministic uniform value sample: the ``k`` rows with the
    smallest ``md5(id || salt)`` priority — the mergeable bottom-k
    sketch behind ``quantile_sketch``.

    Why this shape: a bottom-k set under a FIXED priority function is
    trivially mergeable (``bottomk(A ∪ B) = bottomk(bottomk(A) ∪
    bottomk(B))``), which is exactly how Spark executes it — per-
    partition TakeOrderedAndProject partials merged on the driver-side
    reduce, no full sort, no full shuffle. Per-partition sketches can
    also be persisted and merged later (incremental corpus growth), the
    same lifecycle as the MinHash corpus index. md5 priorities make the
    sample identical in any engine (no RNG), so estimates are oracle-
    reproducible; re-salting draws an independent sample.

    ``id_col`` SHOULD be unique; when it is not, duplicate ids tie on
    the md5 priority, so the sort key falls back to ``value`` (nulls
    first) — deterministic in any engine — instead of letting the
    k-boundary pick among ties nondeterministically (ADVICE r5). A
    cross-engine oracle must mirror that tie order
    (``ORDER BY md5(...), value ASC NULLS FIRST``).
    """
    pri = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return (
        df.select(F.col(value_col).alias("value"), pri.alias("__pri"))
        .orderBy(F.col("__pri").asc(), F.col("value").asc_nulls_first())
        .limit(k)
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 500,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    salt: str = "qsk",
) -> DataFrame:
    """Quantile estimates from the deterministic bottom-k sample:
    one row per requested quantile — (p, est, n_sample).

    The estimate is the EXACT interpolated percentile of the k-row
    sample (sample error ~O(1/sqrt(k)) per the standard bound; k is a
    knob, not a hidden cap). The 100 TB story is the sample, not the
    percentile: the full column never sorts and never shuffles — only
    k rows reach the final aggregation."""
    sample = bottomk_sample(df, value_col, id_col, k, salt)
    aggs = [
        F.percentile(F.col("value"), F.lit(p)).alias(f"__q{i}")
        for i, p in enumerate(quantiles)
    ] + [F.count(F.lit(1)).alias("__n")]
    wide = sample.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"),
                F.col(f"__q{i}").alias("est"),
                F.col("__n").alias("n_sample"),
            )
            for i, p in enumerate(quantiles)
        ]
    )
    return wide.select(F.inline(rows))


def _bottomk_per_group(
    d: DataFrame, group_cols: list[str], k: int, n_buckets: int = 64
) -> DataFrame:
    """The k smallest ``__h`` rows per group, in TWO window phases.

    A single ``Window.partitionBy(group)`` row_number sends EVERY
    distinct value of a group through one task — the straggler shape
    at 100 TB, where one segment can hold billions of distinct keys.
    Bottom-k is mergeable (``bottomk(A ∪ B) = bottomk(bottomk(A) ∪
    bottomk(B))``), so phase 1 prunes within ``(group, __h mod
    n_buckets)`` — n_buckets-way parallel, each bucket keeping its own
    bottom-k, a guaranteed superset of the group bottom-k — and phase
    2 runs the per-group window over at most ``k * n_buckets`` rows
    per group. Bit-identical to the one-phase plan (pinned by the
    hashlib-twin and DuckDB-oracle tests), never a single-task sort
    over a group's full distinct set.

    ``d`` must be distinct over (group, __h) so ``__h`` is a unique,
    deterministic order key within each group."""
    w1 = Window.partitionBy(*group_cols, "__b").orderBy("__h")
    w2 = Window.partitionBy(*group_cols).orderBy("__h")
    pruned = (
        d.withColumn("__b", F.pmod(F.col("__h"), F.lit(n_buckets)))
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
    )
    return (
        pruned.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .select(*group_cols, "__h")
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group — the
    DETERMINISTIC alternative to HLL: where approx_count_distinct's
    sketch is engine-specific (no cross-engine oracle, see
    approx_distinct_parts), KMV under a fixed md5 priority is a pure
    function of the data, so another engine reproduces the ESTIMATE
    bit-for-bit (Bar-Yossef et al. 2002, the classic bottom-k
    estimator).

    h(v) = first 13 hex chars of md5(v || salt) as an integer — 52
    uniform bits, EXACT in a double (the 16^13 divisor is a power of
    two, so u = h / 16^13 is one exact IEEE operation in any engine).
    Per group keep the k smallest distinct h; estimate =
    (k-1) / u_k when the group has >= k distinct values, else the
    sketch IS the exact distinct set (estimate = its size, exact).
    Relative std error ~ 1/sqrt(k-2) (~12.7% at k=64).

    Scale shape: one distinct over (group, 8-byte h) — the value text
    never shuffles twice — then the two-phase per-group bottom-k of
    ``_bottomk_per_group`` (bucket-parallel prune, then a window over
    <= k * n_buckets rows per group; never a single-task sort over a
    group's full distinct set). The bottom-k set is
    mergeable (bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B)),
    property-tested), so per-partition/per-day sketches can be stored
    and folded later — the same lifecycle as the MinHash corpus index.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(value_col).cast("string"), F.lit(salt))),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    d = df.select(*group_cols, h.alias("__h")).distinct()
    kept = _bottomk_per_group(d, group_cols, k)
    return (
        kept.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("__h").alias("__hk"))
        .select(
            *group_cols,
            "n_sketch",
            F.when(
                F.col("n_sketch") < k, F.col("n_sketch").cast("double")
            )
            .otherwise(
                F.lit(float(k - 1))
                / (F.col("__hk").cast("double") / F.lit(float(16**13)))
            )
            .alias("kmv_distinct"),
        )
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Pairwise distinct-set UNION and INTERSECTION estimates between
    groups, from merged KMV sketches — the operation sketches exist
    for: bottom-k sets are mergeable (``bottomk(A ∪ B) =
    bottomk(bottomk(A) ∪ bottomk(B))``), so the cross-group estimates
    below never rescan data; they fold two k-sized arrays. At 100 TB
    this is "distinct-user overlap between any two segments" computed
    from per-segment sketches a prior job stored, not from a
    distinct-join over the raw corpus.

    Estimators (Beyer et al. 2007, on the same deterministic md5
    priority as ``kmv_distinct`` — every value rebuilds bit-for-bit in
    any engine with md5):

    - ``M`` = bottom-k of the merged sketches; if the merged distinct
      union has < k values both sketches were exact, so union/intersect
      are EXACT counts.
    - else ``union_est = (k-1) / u_k`` with ``u_k = M[k] / 16^13``
      (exact IEEE: power-of-two divisor), and
      ``intersect_est = (|M ∩ S_a ∩ S_b| / k) · union_est``.

    Output: (g_a, g_b, n_a_sketch, n_b_sketch, union_est,
    intersect_est) for every ordered pair g_a < g_b. The pair join is
    sketch-sized (|groups| rows of k longs) and broadcast.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(value_col).cast("string"), F.lit(salt))),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    d = df.select(F.col(group_col).alias("g"), h.alias("__h")).distinct()
    kept = _bottomk_per_group(d, ["g"], k)
    sk = kept.groupBy("g").agg(
        F.sort_array(F.collect_list("__h")).alias("hs"),
        F.count(F.lit(1)).alias("n_sk"),
    )
    a = sk.select(
        F.col("g").alias("g_a"),
        F.col("hs").alias("hs_a"),
        F.col("n_sk").alias("n_a_sketch"),
    )
    b = sk.select(
        F.col("g").alias("g_b"),
        F.col("hs").alias("hs_b"),
        F.col("n_sk").alias("n_b_sketch"),
    )
    merged = F.array_sort(F.array_union("hs_a", "hs_b"))
    pairs = (
        a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))
        .withColumn("__merged", merged)
        .withColumn("__n_merged", F.size("__merged"))
        .withColumn("__mk", F.slice("__merged", 1, k))
        .withColumn("__shared", F.array_intersect("hs_a", "hs_b"))
        .withColumn(
            "__k_shared", F.size(F.array_intersect("__mk", "__shared"))
        )
    )
    # F.get is 0-based and null-safe: the estimate branch only runs when
    # the merged sketch has >= k entries, but ANSI mode must never see
    # an out-of-bounds element_at even in a dead branch.
    u_k = F.get(F.col("__mk"), k - 1).cast("double") / F.lit(float(16**13))
    union_est = F.when(
        F.col("__n_merged") < k, F.col("__n_merged").cast("double")
    ).otherwise(F.lit(float(k - 1)) / u_k)
    pairs = pairs.withColumn("union_est", union_est)
    intersect_est = F.when(
        F.col("__n_merged") < k, F.size("__shared").cast("double")
    ).otherwise(
        (F.col("__k_shared").cast("double") / F.lit(float(k)))
        * F.col("union_est")
    )
    return pairs.select(
        "g_a",
        "g_b",
        "n_a_sketch",
        "n_b_sketch",
        "union_est",
        intersect_est.alias("intersect_est"),
    )


def _bloom_positions(key: Column, k: int, m_bits: int, salt: str) -> Column:
    """Array of the k bit positions for ``key`` — md5-derived (the
    engine-neutral determinism contract shared by every sketch here)."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(key, F.lit(f"{salt}{i}"))), 1, 8),
                16,
                10,
            ).cast("long")
            % m_bits
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str | Column,
    m_bits: int = 4096,
    k: int = 4,
    salt: str = "bf",
) -> DataFrame:
    """Bloom filter of the key set as a SPARSE packed bitset:
    (word_idx, word) rows, 63 bits per BIGINT word — the persisted
    "seen-set" membership structure a 100 TB ingest keeps hot (have I
    crawled this URL / indexed this document before) when even the
    compact per-key index is too big to join against.

    63 (not 64) bits per word: bit 63 is the sign bit, and a
    ``1 << 63`` is an overflow error in DuckDB — capping at shift 62
    keeps every word value identical in both engines, which is what
    makes the filter ORACLE-REBUILDABLE bit-for-bit (md5 positions,
    same packing).

    Plan: k positions per key (row-local array), explode → distinct
    (position space is at most ``m_bits`` rows after dedup, and the
    distinct's map-side partial keeps the shuffle position-bounded) →
    one groupBy(word_idx) bit_or. Output is at most ``m_bits/63`` rows
    regardless of corpus size — broadcastable at any scale. Size m_bits
    for the expected distinct-key count n: false-positive rate
    ~ (1 - e^(-k*n/m))^k, the textbook bound (Bloom 1970).
    """
    key = (F.col(key_col) if isinstance(key_col, str) else key_col).cast(
        "string"
    )
    pos = (
        df.select(F.explode(_bloom_positions(key, k, m_bits, salt)).alias("p"))
        .distinct()
    )
    return (
        pos.select(
            F.expr("CAST(p DIV 63 AS BIGINT)").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias("word"))
    )


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str | Column,
    id_col: str = "doc_id",
    m_bits: int = 4096,
    k: int = 4,
    salt: str = "bf",
    out_col: str = "maybe_in_set",
) -> DataFrame:
    """Membership probe against a built ``bloom_build`` table:
    (id_col, out_col) with the classic Bloom contract — False is
    DEFINITE (the key was never inserted), True means "maybe" (false
    positives at the build's sizing rate, never false negatives).
    ``m_bits``/``k``/``salt`` MUST match the build (the same keyed-
    store contract as the BM25/ANN stored indexes — a mismatch
    silently probes the wrong bits).

    Plan: k probe positions per row, one broadcast join of the (at
    most m_bits/63)-row filter onto the position stream, bitwise-AND
    per position, min-fold per id. Probe cost is O(batch * k) rows —
    corpus size never appears.
    """
    key = (F.col(key_col) if isinstance(key_col, str) else key_col).cast(
        "string"
    )
    pr = (
        df.select(F.col(id_col), F.explode(
            _bloom_positions(key, k, m_bits, salt)).alias("p"))
        .select(
            id_col,
            F.expr("CAST(p DIV 63 AS BIGINT)").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias(
                "__m"
            ),
        )
    )
    hit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("__m"))
        == F.col("__m")
    ).cast("int")
    return (
        pr.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(id_col)
        .agg((F.min(hit) == 1).alias(out_col))
    )


def bloom_probe_rowlocal(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str | Column,
    m_bits: int = 4096,
    k: int = 4,
    salt: str = "bf",
    out_col: str = "maybe_in_set",
) -> DataFrame:
    """STREAMING-SAFE ``bloom_probe``: identical membership answer
    (pinned equal by test), computed with NO aggregation — k
    stream-static LEFT joins of the probe row against the
    (at most m_bits/63)-row filter, folded into one boolean
    conjunction. ``bloom_probe``'s per-id min-fold is an unwatermarked
    aggregation, illegal in append-mode streams; each of these joins
    is stream-static (append-legal), and with the filter broadcast the
    whole probe adds zero shuffles to the stream. Same rowlocal-twin
    pattern as ``dedup.minhash_signatures_rowlocal``. Keeps every
    input column and appends ``out_col``."""
    key = (F.col(key_col) if isinstance(key_col, str) else key_col).cast(
        "string"
    )
    out = df
    conds = []
    for i in range(k):
        p = (
            F.conv(
                F.substring(F.md5(F.concat(key, F.lit(f"{salt}{i}"))), 1, 8),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        out = out.withColumn(f"__p{i}", p)
        side = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"__wi{i}"),
                F.col("word").alias(f"__word{i}"),
            )
        )
        out = out.join(
            side,
            F.expr(f"CAST(__p{i} DIV 63 AS BIGINT)") == F.col(f"__wi{i}"),
            "left",
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 63 AS INT))"
        )
        conds.append(
            F.coalesce(F.col(f"__word{i}"), F.lit(0)).bitwiseAND(mask) == mask
        )
    maybe = conds[0]
    for c in conds[1:]:
        maybe = maybe & c
    drop = [f"__p{i}" for i in range(k)]
    drop += [f"__wi{i}" for i in range(k)] + [f"__word{i}" for i in range(k)]
    return out.withColumn(out_col, maybe).drop(*drop)

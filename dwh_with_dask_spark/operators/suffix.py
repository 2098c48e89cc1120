"""Variable-length ExactSubstr: a DISTRIBUTED suffix-array construction
via prefix doubling (Manber & Myers 1993), DataFrame-native.

Closes the one documented approximation in the ExactSubstr family
(``dedup.duplicate_spans`` hashes FIXED-k windows — finds all repeats of
length >= k, but reports k-resolution coverage): this module computes,
for every token position in the corpus, the TRUE length of the longest
substring starting there that also occurs anywhere else (Lee et al.
2022's suffix-array semantics), with no Python in the per-row path and
no text ever riding a shuffle after tokenization.

Method — every step is a standard published algorithm, re-expressed as
DataFrame ops:

1. **Prefix doubling**: ``rank_0`` = dense rank of the single token;
   ``rank_{j+1}`` = dense rank of the pair ``(rank_j[p],
   rank_j[p + 2^j])`` (−1 past the document end — suffixes never cross
   documents, the per-doc sentinel of the concatenated-corpus
   construction). After round j, two positions share ``rank_j`` iff
   their suffixes agree on the first ``2^j`` tokens (or are equal
   complete suffixes — see the clamp below). ``ceil(log2(max_doc_len))``
   rounds, with early stop once every rank is distinct.
   The pair shift is a per-document ``lead`` window (no join), and the
   dense rank is fully distributed: distinct keys → range-sort →
   ``ids.sequential_id`` (JVM stamp + broadcast offsets — NO
   single-partition window anywhere in this module) → hash-join back.
2. **Suffix-array adjacency**: order positions by the final rank
   (ties — equal complete suffixes — break on (id, pos)); adjacency via
   ``sequential_id`` + a self-join on ``sa+1``.
3. **LCP of adjacent suffixes** by descending doubling (the classic
   O(log n) rank-table LCP): for j = J..0, if ``rank_j`` matches at
   both cursors, advance the common prefix by ``2^j``. Each step is two
   expression-keyed equi-joins against the rank table. A final
   ``least(lcp, remaining_a, remaining_b)`` clamp repairs the one
   overcount the shared end-of-document sentinel allows (two EQUAL
   complete suffixes shorter than ``2^j`` match at round j; true LCP is
   their full length).
4. **Longest repeat per position** = max(LCP with SA-predecessor, LCP
   with SA-successor) — the textbook neighbor property.

Scale notes: every shuffle moves fixed-width (id, pos, rank) rows —
O(N) each, O(log max_len) rounds; the LCP pass is O(log max_len)
equi-joins of an (N-1)-row pair table. That is the honest cost of
EXACT variable-length semantics; ``dedup.duplicate_spans`` (one shuffle,
fixed k) remains the data-proportional default and this module the
exact-semantics option — the same default/exact split as
approx_distinct vs count_distinct. The equivalence theorem tested in
tests/test_dedup_similarity.py (coverage at ``min_len=k`` equals the
fixed-k scheme's coverage exactly) is what lets the driver query share
the fixed-k DuckDB oracle.

Reference for parity: the reference repo has no dedup at all; this is
SURVEY.md §2B north-star surface (the training-data-pipeline layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_with_dask_spark.operators.caching import CacheScope, attach, scoped
from dwh_with_dask_spark.operators.dedup import text_tokens
from dwh_with_dask_spark.operators.ids import sequential_id
from dwh_with_dask_spark.operators.partitioning import barrier, widen


def _dense_rank_distributed(
    df: DataFrame, key_cols: list[str], out: str
) -> tuple[DataFrame, int]:
    """Dense rank of ``key_cols`` over the whole frame WITHOUT a global
    window: distinct keys → range-sorted ``sequential_id`` (JVM stamp +
    broadcast offsets) → join back. Rank values are 0-based, contiguous
    over distinct keys, and deterministic (the key order is total).
    Returns (ranked frame, number of distinct keys) — the count comes
    free off the checkpointed keys frame, so callers never re-aggregate
    the full positions table to know the group count."""
    keys = sequential_id(
        df.select(*key_cols).distinct(),
        order_by=[F.col(c).asc() for c in key_cols],
        name=out,
        start=0,
        checkpoint=True,
    )
    return df.join(keys, key_cols), keys.count()


def suffix_ranks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, int]:
    """(positions, J): ``positions`` = one row per token position —
    (id, pos, dl, r0..rJ) where ``r_j`` is the prefix-doubling rank
    after round j — eagerly checkpointed (safe to re-action); ``J`` is
    the last round computed. Suffixes are per-document (repeats never
    span documents). Zero-token documents contribute no positions."""
    src = widen(df.select(id_col, text_col), id_col)
    base = barrier(
        src.select(
            F.col(id_col).alias("id"), text_tokens(text_col).alias("__toks")
        )
    ).filter(F.size("__toks") >= 1)
    pos = base.select(
        "id",
        F.size("__toks").alias("dl"),
        F.posexplode("__toks").alias("pos", "__tok"),
    )
    pos, n_groups = _dense_rank_distributed(pos, ["__tok"], "r0")
    pos = pos.drop("__tok").localCheckpoint(eager=True)
    max_dl = pos.agg(F.max("dl")).first()[0] or 1

    j, k = 0, 1
    densified = True  # r0 is a dense rank
    w_doc = Window.partitionBy("id").orderBy("pos")
    while k < max_dl:
        prev, nxt = f"r{j}", f"r{j + 1}"
        lead2 = F.coalesce(F.lead(prev, k).over(w_doc), F.lit(-1))
        if densified and n_groups < 2 ** 31:
            # COMPOSITE round (measured ~4x cheaper than a densify):
            # when the previous level is a dense rank with m groups,
            # ``r·(m+1) + (lead+1)`` is a single LONG that orders
            # exactly like the (rank, lead-or-−1) pair — rank in
            # [0, m), shifted lead in [0, m] — so the level table is
            # built with ONE per-doc window and no distinct/sort/join.
            # Its values reach ~m², so the NEXT level must densify
            # before composing again (alternation keeps everything in
            # long range; past 2^31 groups — never at any tested scale
            # — every round densifies).
            pos = pos.withColumn(
                nxt,
                F.col(prev).cast("long") * F.lit(int(n_groups) + 1)
                + (lead2.cast("long") + F.lit(1)),
            )
            pos = pos.localCheckpoint(eager=True)
            densified = False
            j, k = j + 1, k * 2
            continue
        # DENSIFY round: dense rank of the (composite, shifted
        # composite) pair — restores [0, n) values for the next
        # composite round
        paired = pos.withColumn("__r2", lead2)
        pos, n_new = _dense_rank_distributed(paired, [prev, "__r2"], nxt)
        pos = pos.drop("__r2")
        # iterative-loop idiom: truncate lineage every round, or the
        # plan grows by two joins per round and re-actions replay the
        # nondeterministic sequential_id stamps
        pos = pos.localCheckpoint(eager=True)
        j, k = j + 1, k * 2
        # Fixpoint stop: refinement only ever SPLITS groups, so an
        # unchanged count across two doublings means the partition is
        # stable (equal prefixes ⟹ equal complete suffixes, which the
        # LCP clamp handles) and every later round is a no-op.
        if n_new == n_groups:
            break
        n_groups = n_new
        densified = True
    return pos, j


def longest_repeats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
) -> DataFrame:
    """(id, pos, dl, rep): for every token position, the EXACT length of
    the longest substring starting there that occurs at least once more
    anywhere in the corpus (0 when the suffix shares no prefix with any
    other). The suffix-array semantics the fixed-k family approximates.
    """
    scope, created = scoped(scope)
    sa = _sa_with_lcp(df, text_col, id_col, scope)
    # rep = max(LCP with predecessor, LCP with successor) — the
    # successor's LCP is the NEXT sa row's lcp_prev: a self-join on the
    # sa index, never an ordered global window
    nxt = sa.select(
        (F.col("__sa") - 1).alias("__sa"), F.col("lcp_prev").alias("__ln")
    )
    rep = (
        sa.join(nxt, "__sa", "left")
        .select(
            "id",
            "pos",
            "dl",
            F.greatest(
                F.coalesce(F.col("lcp_prev"), F.lit(0)),
                F.coalesce(F.col("__ln"), F.lit(0)),
            ).alias("rep"),
        )
    )
    return attach(rep, scope, created)


def suffix_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 8,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Variable-length ExactSubstr coverage: per document, the token
    positions covered by SOME duplicated substring of length >=
    ``min_len`` — computed from TRUE longest-repeat lengths, not fixed
    windows. Output (id_col, n_dup_windows, dup_tokens) is
    column-compatible with ``dedup.duplicate_spans(k=min_len)`` and —
    by the coverage-equivalence theorem — value-IDENTICAL to it:
    a position's k-window is duplicated iff its longest repeat is
    >= k, and the union of [p, p + rep(p)) over rep >= k equals the
    union of the duplicated k-windows (each [p, p+rep) is exactly the
    chain of k-windows starting at p..p+rep-k). What the variable-
    length path ADDS is ``longest_repeats``' exact per-position rep —
    the quantity the fixed-k scheme cannot report — at
    O(log max_len)-shuffle cost instead of one."""
    rep = longest_repeats(df, text_col=text_col, id_col=id_col, scope=scope)
    spans = rep.filter(F.col("rep") >= min_len)
    prev = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("pos") + F.col("rep")
    contrib = F.greatest(
        F.lit(0).cast("long"),
        end - F.greatest(
            F.col("pos"), F.coalesce(F.max(end).over(prev), F.lit(0))
        ),
    )
    out = (
        spans.withColumn("__c", contrib)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum("__c").alias("dup_tokens"),
        )
        .withColumnRenamed("id", id_col)
    )
    return out


def _sa_with_lcp(
    df: DataFrame,
    text_col: str,
    id_col: str,
    scope: CacheScope,
) -> DataFrame:
    """(id, pos, dl, __sa, lcp_prev): every position with its
    suffix-array index and its LCP with the SA-predecessor (NULL at
    __sa = 0). The shared core of ``longest_repeats`` and
    ``suffix_span_removal``.

    The LCP of each adjacent pair is resolved in three tiers, cheapest
    first — the two carried-rank tiers need NO join at all, because
    the pair row already holds both suffixes' full rank columns:

    1. **Equal final rank** ⟹ equal complete suffixes ⟹ lcp is the
       full remaining length. True on BOTH ``suffix_ranks`` exit
       paths: at the natural exit ``2^J >= max_dl`` so rank-J equality
       is whole-(padded-)suffix equality; at the fixpoint break the
       partition is stable under doubling, and a stable prefix-doubling
       partition is exactly the suffix-equality partition (if two
       distinct suffixes shared a 2^J prefix they would share a rank-J
       class with unequal members, and the next doubling would have
       split it). Without this tier the descending walk can accumulate
       at most 2^(J+1)−1 and the end-clamp can only LOWER — exact
       duplicate documents (the most common dedup input) were
       undercounted (ADVICE r10, high).
    2. **Offset-0 walk, one expression**: ranks are hierarchical
       (``r_{j+1}`` equal ⟹ ``r_j`` equal), so the set of levels that
       match at offset 0 is a prefix ``[0, h]``; the descending walk's
       first hit is ``h`` and every level above it is a miss. One
       CASE over the carried columns yields ``h``; ``lcp`` starts at
       ``2^h`` (or 0 — final — when no level matches). Pairs with
       ``h <= 0`` are DONE with zero joins: on diverse corpora that is
       most of the table (adjacent suffixes rarely share >= 2 tokens).
    3. **Join walk for the rest**: levels ``h−1..0`` at moving cursors
       ``pos + lcp``, two expression-keyed equi-joins per level against
       the level's rank table — only the still-active pairs
       (``h > j``) ride the join; a pair with true lcp L joins at most
       ``floor(log2 L)`` levels. An unequal-rank-J pair has
       lcp <= 2^J − 1 (else its 2^J-prefix equality would force
       rank-J equality on either exit path), so levels J−1..0 suffice.

    The final ``least(lcp, remaining)`` clamp is kept as a safety
    invariant (tier 1 already emits exact values)."""
    pos, J = suffix_ranks(df, text_col=text_col, id_col=id_col)
    rcols = [f"r{j}" for j in range(J + 1)]
    ranks = scope.persist(pos)
    sa = sequential_id(
        ranks.select("id", "pos", "dl", *rcols),
        order_by=[
            F.col(f"r{J}").asc(), F.col("id").asc(), F.col("pos").asc()
        ],
        name="__sa",
        start=0,
        checkpoint=True,
    )

    a = sa.select(
        F.col("id").alias("ida"), F.col("pos").alias("posa"),
        F.col("dl").alias("dla"), F.col("__sa").alias("__i"),
        *[F.col(f"r{j}").alias(f"__a{j}") for j in range(J + 1)],
    )
    b = sa.select(
        F.col("id").alias("idb"), F.col("pos").alias("posb"),
        F.col("dl").alias("dlb"), (F.col("__sa") - 1).alias("__i"),
        *[F.col(f"r{j}").alias(f"__b{j}") for j in range(J + 1)],
    )

    def eq(j: int):
        return F.col(f"__a{j}") == F.col(f"__b{j}")

    if J >= 1:
        h = F.when(eq(J - 1), F.lit(J - 1))
        for j in range(J - 2, -1, -1):
            h = h.when(eq(j), F.lit(j))
        h = h.otherwise(F.lit(None).cast("int"))
    else:
        h = F.lit(None).cast("int")
    rem = F.least(
        F.col("dla") - F.col("posa"), F.col("dlb") - F.col("posb")
    )
    pairs = (
        a.join(b, "__i")
        .select(
            "ida", "posa", "dla", "idb", "posb", "dlb",
            eq(J).alias("__eqf"), h.alias("__h"),
        )
        .withColumn(
            "lcp",
            F.when(F.col("__eqf"), rem)
            .when(
                F.col("__h").isNotNull(),
                F.pow(F.lit(2.0), F.col("__h")).cast("long"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    # pairs fully resolved by the carried tiers never enter the walk
    walking_cond = (~F.col("__eqf")) & (F.col("__h") >= 1)
    done = pairs.filter(~walking_cond).drop("__eqf", "__h")
    walk = pairs.filter(walking_cond).drop("__eqf")
    for j in range(J - 2, -1, -1):
        active = F.col("__h") > j
        idle = walk.filter(~active)
        act = walk.filter(active)
        rj = ranks.select(
            F.col("id").alias("__rid"), F.col("pos").alias("__rpos"),
            F.col(f"r{j}").alias("__rv"),
        )
        act = (
            act.join(
                rj,
                (F.col("ida") == F.col("__rid"))
                & (F.col("__rpos") == F.col("posa") + F.col("lcp")),
                "left",
            )
            .withColumnRenamed("__rv", "__ra")
            .drop("__rid", "__rpos")
        )
        act = (
            act.join(
                rj,
                (F.col("idb") == F.col("__rid"))
                & (F.col("__rpos") == F.col("posb") + F.col("lcp")),
                "left",
            )
            .withColumnRenamed("__rv", "__rb")
            .drop("__rid", "__rpos")
        )
        hit = (
            F.col("__ra").isNotNull()
            & F.col("__rb").isNotNull()
            & (F.col("__ra") == F.col("__rb"))
        )
        act = act.withColumn(
            "lcp",
            F.when(hit, F.col("lcp") + F.lit(2 ** j)).otherwise(F.col("lcp")),
        ).drop("__ra", "__rb")
        walk = act.unionByName(idle).localCheckpoint(eager=True)
    pairs = done.unionByName(walk.drop("__h"))
    pairs = pairs.withColumn(
        "lcp",
        F.least(
            F.col("lcp"),
            F.col("dla") - F.col("posa"),
            F.col("dlb") - F.col("posb"),
        ),
    )
    # lcp_prev of position b = the pair's lcp; __sa=0 has no predecessor
    lp = pairs.select(
        F.col("idb").alias("id"), F.col("posb").alias("pos"),
        F.col("lcp").alias("lcp_prev"),
    )
    return sa.select("id", "pos", "dl", "__sa").join(
        lp, ["id", "pos"], "left"
    )


def _running_sum_by_order(
    frame: DataFrame,
    order_col: str,
    flag_col: str,
    out: str,
    scope: CacheScope,
) -> DataFrame:
    """Global inclusive running sum of ``flag_col`` in ``order_col``
    order WITHOUT a single-partition window — the ``sequential_id``
    pattern generalized to sums: range-repartition + in-partition sort,
    per-partition flag totals collected (one row per partition),
    prefix-summed on the driver, broadcast back as offsets, and the
    in-partition running sum is an ordinary per-partition window. The
    persist pins the partition assignment across the two jobs (same
    contract as ``ids.sequential_id``)."""
    p = frame.repartitionByRange(
        max(frame.sparkSession.sparkContext.defaultParallelism, 2), order_col
    ).sortWithinPartitions(order_col)
    stamped = scope.persist(p.withColumn("__pid", F.spark_partition_id()))
    totals = (
        stamped.groupBy("__pid")
        .agg(F.coalesce(F.sum(flag_col), F.lit(0)).alias("__t"))
        .collect()
    )
    running, offs = 0, []
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offs.append((r["__pid"], running))
        running += r["__t"]
    offsets = frame.sparkSession.createDataFrame(
        offs, "__pid int, __off long"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        stamped.join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.sum(flag_col).over(w) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )


def suffix_span_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 8,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Variable-length ExactSubstr REMOVAL (Lee et al. 2022): cut every
    duplicated substring occurrence of length >= ``min_len`` except a
    canonical first copy, using TRUE repeat extents from the suffix
    array — where the fixed-k ``dedup.duplicate_span_removal`` cuts
    k-window unions, this cuts each occurrence's exact shared length.

    Rule (deterministic, published-semantics):

    1. SA positions whose longest repeat is >= ``min_len`` form RUNS —
       maximal SA-consecutive blocks chained by adjacent LCP >=
       ``min_len``. By the range-minimum property of LCP, every two
       members of a run share a >= ``min_len`` prefix pairwise.
    2. The run's canonical instance is its smallest (doc_id, pos) —
       the corpus-wide first occurrence, the fixed-k scheme's rule.
    3. Every OTHER member p cuts ``[pos_p, pos_p + shared_p)`` where
       ``shared_p`` = the exact LCP between p and the canonical (the
       running min of adjacent LCPs along the SA between them) — so
       every cut token provably survives inside the canonical's kept
       span (keep-one holds span-exactly, not just window-exactly),
       up to cuts made by OTHER runs overlapping the canonical (the
       same caveat the fixed-k removal documents).

    Run segmentation uses a distributed prefix-sum (no global window);
    per-run windows are run-sized. Re-assembly shares
    ``dedup._reassemble_after_cuts``. Returns (id_col, n_tokens,
    n_removed, clean_text) for every doc with >= ``min_len`` tokens.

    No SQL oracle (a suffix array is beyond SQL at honest cost) —
    correctness is pinned by the brute-force twin + hand fixtures in
    tests/test_dedup_similarity.py; the spans side carries the full
    DuckDB hash-match (dedup_suffix_spans)."""
    from dwh_with_dask_spark.operators.dedup import _reassemble_after_cuts

    scope, created = scoped(scope)
    sa = _sa_with_lcp(df, text_col, id_col, scope)
    # rep = max(lcp_prev, lcp_next) without any global window: a
    # position's lcp_next is its SA-successor row's lcp_prev — a
    # self-join on the sa index, not an ordered window
    nxt = sa.select(
        (F.col("__sa") - 1).alias("__sa"), F.col("lcp_prev").alias("l")
    )
    rep = (
        sa.select("id", "pos", "dl", "__sa", "lcp_prev")
        .join(nxt, "__sa", "left")
        .withColumn(
            "rep",
            F.greatest(
                F.coalesce(F.col("lcp_prev"), F.lit(0)),
                F.coalesce(F.col("l"), F.lit(0)),
            ),
        )
        .drop("l")
    )
    members = rep.filter(F.col("rep") >= min_len)
    members = _running_sum_by_order(
        members.withColumn(
            "__new",
            (
                F.col("lcp_prev").isNull()
                | (F.col("lcp_prev") < min_len)
            ).cast("int"),
        ),
        "__sa",
        "__new",
        "__run",
        scope,
    )
    # adjacent-lcp toward the successor, computed per run BEFORE any
    # filtering so the backward running min sees the canonical's edge
    w_run = Window.partitionBy("__run").orderBy("__sa")
    members = members.withColumn("lcp_next", F.lead("lcp_prev").over(w_run))
    canon = members.groupBy("__run").agg(
        F.min_by("__sa", F.struct(F.col("id"), F.col("pos"))).alias("__csa")
    )
    m = members.join(F.broadcast(canon), "__run")
    w_fwd = w_run.rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = (
        Window.partitionBy("__run")
        .orderBy(F.col("__sa").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    after = m.filter(F.col("__sa") > F.col("__csa")).withColumn(
        "__cut", F.min("lcp_prev").over(w_fwd)
    )
    before = m.filter(F.col("__sa") < F.col("__csa")).withColumn(
        "__cut", F.min("lcp_next").over(w_bwd)
    )
    cuts = after.unionByName(before).select(
        "id", "pos", (F.col("pos") + F.col("__cut")).alias("__end")
    )
    # merge overlapping variable-length intervals per doc
    prevw = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runw = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = cuts.withColumn(
        "__new",
        (
            F.col("pos") >= F.coalesce(F.max("__end").over(prevw), F.lit(-1))
        ).cast("int"),
    ).withColumn("__seg", F.sum("__new").over(runw))
    ivals = (
        seg.groupBy("id", "__seg")
        .agg(
            F.min("pos").cast("int").alias("__s"),
            F.max("__end").cast("int").alias("__e"),
        )
        .groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__s"), F.col("__e")))
            ).alias("__cuts")
        )
    )
    out = _reassemble_after_cuts(df, ivals, text_col, id_col, min_len)
    return attach(out, scope, created)

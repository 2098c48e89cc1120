"""Similarity search over embedding columns (array<float>).

North-star additions (ABSENT-IN-REFERENCE, SURVEY.md §2B): brute-force
cosine top-k as the exact baseline, and a random-hyperplane LSH bucketed
variant as the scale path. Vector math uses built-in higher-order
functions (zip_with / aggregate) — JVM-side, no Python in the hot loop.

Scale notes: brute force is a single scan per query vector (fine for one
query over 100 TB — it's embarrassingly parallel; wrong for n×n). The
LSH path buckets vectors by sign-pattern of random projections so
candidate sets shrink exponentially with bits; recall/latency trades off
via ``bits`` and multi-probe (hamming-adjacent buckets).

PRIMARY APIs at corpus scale are the index-then-probe pairs:
``build_srp_index`` → ``ann_lsh_topk_indexed`` and ``build_ivf_index``
→ ``ivf_topk_indexed``. Signatures / cell ids are computed ONCE by an
Arrow-batched GEMM kernel and stored as columns (write bucketed /
partitioned by them); each query then probes the stored column with
integer comparisons — per-query cost independent of embedding dim. The
un-suffixed ``ann_lsh_topk`` / ``ivf_topk`` are one-shot conveniences
that build the index in-plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double math)."""
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    The query vector is a literal array (broadcast implicitly in the
    plan); the scan computes one fused projection per row and TopK runs
    as TakeOrderedAndProject — no full sort, no shuffle of vectors.
    Deterministic tie-break on id.
    """
    q = F.lit([float(x) for x in query_vec])
    sim = cosine(F.col(vec_col), q).alias("cosine_sim")
    return (
        df.select(F.col(id_col), sim)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


# Measured IVF-PQ(+rerank) recall grid (ANN.md, rounds 13-14): keyed by
# the measured dim tier; rows are (m, nprobe, rerank, recall@10) on the
# clustered / non-isotropic fixtures. rerank=0 means plain ADC probe.
_ANN_GRID = {
    64: [
        (16, 1, 0, 0.37),
        (16, 1, 100, 0.915),
        (16, 2, 50, 0.735),
        (16, 2, 100, 0.915),
        (16, 4, 100, 0.915),
    ],
    768: [
        (16, 1, 0, 0.425),
        (16, 2, 0, 0.43),
        (16, 4, 0, 0.42),
        (16, 1, 100, 0.645),
        (16, 2, 100, 0.685),
        (16, 4, 100, 0.695),
        (64, 1, 0, 0.58),
        (64, 2, 0, 0.625),
        (64, 4, 0, 0.615),
        (64, 1, 100, 0.685),
        (64, 2, 100, 0.8),
        (64, 4, 100, 0.85),
    ],
}


def ann_config(dim: int, recall_target: float = 0.9) -> dict:
    """IVF-PQ sizing from the MEASURED recall grids (ANN.md) — the
    dim-768 sweep's conclusion ("at high dim the code budget, not the
    cell probe, binds: m >= 64 plus exact rerank") as code instead of
    prose (VERDICT r14 ask #7).

    Picks the CHEAPEST measured configuration meeting
    ``recall_target`` from the grid measured at the nearest dim tier
    (64-dim clustered sweep for ``dim <= 256``, 768-dim non-isotropic
    sweep above — the m floor is what changes with dimensionality).
    Cost order: code bytes first (``m``), then exact-rerank fetches
    (``rerank``), then cells probed (``nprobe``). When no measured
    point reaches the target, returns the best measured point with
    ``meets_target=False`` — the caller should raise ``m`` and
    ``rerank`` beyond the grid (both levers measured monotone) or drop
    to exact ``cosine_topk``.

    Returns ``{"m", "nprobe", "rerank", "expected_recall",
    "meets_target", "grid_dim"}``. ``rerank == 0`` means a plain ADC
    probe suffices at the target.
    """
    grid_dim = 64 if dim <= 256 else 768
    grid = _ANN_GRID[grid_dim]
    meeting = [g for g in grid if g[3] >= recall_target]
    if meeting:
        m, nprobe, rerank, rec = min(
            meeting, key=lambda g: (g[0], g[2], g[1])
        )
        ok = True
    else:
        m, nprobe, rerank, rec = max(grid, key=lambda g: (g[3], -g[0]))
        ok = False
    return {
        "m": m,
        "nprobe": nprobe,
        "rerank": rerank,
        "expected_recall": rec,
        "meets_target": ok,
        "grid_dim": grid_dim,
    }


def kcenter_coreset(
    df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "vec",
    k: int = 32,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985) — the
    diversity-first data-pruning operator: pick the point farthest from
    every center chosen so far, k times. The selected set 2-approximates
    the optimal k-center cover, which is why coreset papers use it to
    pick maximally-diverse training subsets (the complement of
    SemDeDup's remove-the-redundant).

    Fully deterministic: the seed is the smallest id, distances are
    squared L2 computed float32-elementwise with a sequential float64
    fold (Spark's ``aggregate`` — bit-reproducible by any engine that
    folds in order), argmax ties break on the smaller id.

    Scale shape: the driver holds only the k chosen vectors (the
    algorithm's irreducible state). Each round is ONE scan of the
    corpus — the running min-distance column is updated against the
    newest center only (``least(mind, d²(vec, newest))``) and
    re-persisted, so round i never recomputes distances to the i-1
    older centers; the top-1 fetch is a TakeOrdered, never a sort.
    Total cost: k scans, k persists of (id, vec, double) — O(k·n),
    not the O(k²·n) a lineage-replaying loop would pay.

    Practical k ceiling: the k scans are SEQUENTIAL full passes over
    the corpus by construction (each center depends on the previous
    argmax), so at 100 TB keep k ≲ 10³ — beyond that, k corpus scans
    stop being interactive no matter the cluster. For large-k
    diversity pruning, invert the problem: remove the redundant with
    ``semantic_dedup`` (one clustering pass + per-cluster pruning)
    instead of selecting the diverse.

    Returns (rank, id, dist2_at_selection): selection order, the chosen
    id, and its min-squared-distance when chosen (rank 0 = seed,
    dist2 NULL).
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    seed = base.orderBy(F.asc("id")).first()
    if seed is None:
        raise ValueError("kcenter_coreset: empty input")
    spark = df.sparkSession

    def d2(vec: Column, center: list) -> Column:
        lit = F.lit([float(x) for x in center]).cast("array<float>")
        return F.aggregate(
            F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    chosen = [(0, seed.id, None)]
    cur = base.withColumn("__mind", d2(F.col("vec"), list(seed.vec))).persist()
    prev = None
    for rank in range(1, k):
        top = (
            cur.orderBy(F.desc("__mind"), F.asc("id"))
            .select("id", "vec", "__mind")
            .first()
        )
        if top is None or top["__mind"] <= 0.0:
            break  # fewer than k distinct points
        chosen.append((rank, top.id, float(top["__mind"])))
        if rank == k - 1:
            break  # the last center needs no distance refresh
        nxt = cur.withColumn(
            "__mind", F.least(F.col("__mind"), d2(F.col("vec"), list(top.vec)))
        ).persist()
        # No materializing count() here (round 16): ``nxt`` depends
        # only on ``cur`` (the parent, still persisted and fully
        # materialized by this round's top-1 fetch) — the grandparent
        # can be released immediately, and the NEXT round's top-1
        # fetch materializes ``nxt``. This halves the per-round scans
        # (the count was a second full pass per center).
        if prev is not None:
            prev.unpersist()
        prev, cur = cur, nxt
    for c in (prev, cur):
        if c is not None:
            c.unpersist()
    id_type = dict(base.dtypes)["id"]
    return spark.createDataFrame(
        chosen, f"rank int, id {id_type}, dist2 double"
    )


def hard_negatives(
    df: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-anchor HARD NEGATIVES: the ``k`` corpus vectors most cosine-
    similar to each anchor whose ``label_col`` DIFFERS from the
    anchor's — the contrastive-training mining op (near misses make
    informative negatives; an easy random negative teaches nothing).
    Output: (anchor_id, neg_id, cosine_sim, rank), rank 1 = hardest.

    Scale shape: the anchor set (a training mini-batch, not the
    corpus) is BROADCAST and the corpus scanned ONCE — a broadcast
    nested-loop multiply of the scan by |anchors|, all pure-Column
    arithmetic (the ``cosine`` fold), then a per-anchor top-k window
    over anchor-count-many partitions. Corpus size enters only through
    the single scan; for anchor sets beyond broadcast size, chunk the
    anchors and union — each chunk is this same plan."""
    from pyspark.sql.window import Window

    a = F.broadcast(
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("__av"),
            F.col(label_col).alias("__al"),
        )
    )
    scored = (
        df.select(
            F.col(id_col).alias("neg_id"),
            F.col(vec_col).alias("__v"),
            F.col(label_col).alias("__l"),
        )
        .crossJoin(a)
        .filter(
            (F.col("__l") != F.col("__al"))
            & (F.col("neg_id") != F.col("anchor_id"))
        )
        .select(
            "anchor_id",
            "neg_id",
            cosine(F.col("__v"), F.col("__av")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _projection_matrix(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (public SRP-LSH construction)."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim))


def _all_planes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    """Stacked hyperplanes for all tables: shape (tables*bits, dim)."""
    return np.vstack(
        [_projection_matrix(dim, bits, seed + 1000 * t) for t in range(tables)]
    )


def _srp_sigs_udf(planes: np.ndarray, tables: int, bits: int):
    """Arrow-batched signature kernel: one float64 GEMM per batch packs
    all ``tables`` b-bit sign-random-projection signatures at once.

    This is the dim-scalable replacement for per-plane column
    expressions: the plan carries ONE vectorized UDF whose cost is a
    (batch × dim) @ (dim × tables·bits) matmul, instead of
    O(tables·bits·dim) fused literal expressions that blow up codegen at
    real embedding dims (768+).
    """
    weights = np.int64(1) << np.arange(bits, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        proj = mat @ planes.T  # (n, tables*bits)
        b = (proj >= 0).astype(np.int64).reshape(len(mat), tables, bits)
        return pd.Series(list(b @ weights))  # (n, tables)

    return sigs


def _query_sigs(query_vec: list[float], bits: int, tables: int, seed: int) -> list[int]:
    """Driver-side signatures of the query vector — same planes, same
    packing order as ``_srp_sigs_udf``."""
    qv = np.asarray(query_vec, dtype=np.float64)
    planes = _all_planes(len(query_vec), bits, tables, seed)
    b = (planes @ qv >= 0).astype(np.int64).reshape(tables, bits)
    weights = np.int64(1) << np.arange(bits, dtype=np.int64)
    return [int(x) for x in b @ weights]


def build_srp_index(
    df: DataFrame,
    bits: int = 8,
    tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sig_col: str = "srp_sigs",
) -> DataFrame:
    """Materialize SRP-LSH signatures as a stored column — the PRIMARY
    ANN path. Compute once, write once (ideally bucketed/partitioned by a
    signature), then answer every query by probing the stored column.

    ``sig_col`` is an ``array<long>`` of length ``tables``; element t is
    the b-bit signature under table t's hyperplanes. One Arrow-batched
    GEMM per input batch; no per-dimension expressions in the plan.
    """
    dim = df.select(F.size(vec_col)).first()[0]
    planes = _all_planes(dim, bits, tables, seed)
    kernel = _srp_sigs_udf(planes, tables, bits)
    return df.withColumn(sig_col, kernel(F.col(vec_col)))


def _probe_lists(
    qsigs: list[int], bits: int, multiprobe_hamming: int
) -> list[list[int]]:
    """Per-table bucket ids within the probe radius of the query sig."""
    out = []
    for qsig in qsigs:
        probes = [qsig]
        if multiprobe_hamming >= 1:
            probes += [qsig ^ (1 << i) for i in range(bits)]
        if multiprobe_hamming >= 2:
            probes += [
                qsig ^ (1 << i) ^ (1 << j)
                for i in range(bits)
                for j in range(i + 1, bits)
            ]
        out.append(probes)
    return out


def ann_lsh_topk_indexed(
    index_df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe_hamming: int = 1,
    sig_col: str = "srp_sigs",
) -> DataFrame:
    """Approximate top-k against a ``build_srp_index`` table.

    A vector is a candidate if ANY table's STORED signature lands within
    ``multiprobe_hamming`` bits of the query's signature for that table.
    The per-query plan is tables × (1 + b·h) integer comparisons on a
    stored column plus exact cosine on the surviving candidates — query
    cost is independent of embedding dim. On a table written bucketed by
    signature this filter becomes bucket/partition pruning.
    """
    qsigs = _query_sigs(query_vec, bits, tables, seed)
    q = F.lit([float(x) for x in query_vec])

    cond = None
    for t, probes in enumerate(_probe_lists(qsigs, bits, multiprobe_hamming)):
        hit = F.element_at(F.col(sig_col), t + 1).isin(probes)
        cond = hit if cond is None else (cond | hit)

    return (
        index_df.filter(cond)
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Convenience wrapper: build the SRP index in-plan, then probe it.

    Classic (b, L) LSH: ``tables`` independent b-bit signatures; multiple
    small tables, not one big signature, keeps recall controllable:
    P(candidate) = 1-(1-p_table)^L climbs steeply with L for true
    neighbors while staying low for random vectors.

    For repeated queries, call ``build_srp_index`` once, persist/write
    the result, and use ``ann_lsh_topk_indexed`` — that is the corpus-
    scale path (signatures computed once, probed as stored buckets).
    """
    idx = build_srp_index(
        df, bits=bits, tables=tables, id_col=id_col, vec_col=vec_col, seed=seed
    )
    return ann_lsh_topk_indexed(
        idx,
        query_vec,
        k=k,
        bits=bits,
        tables=tables,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        multiprobe_hamming=multiprobe_hamming,
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (a < b, cos >= threshold).

    This is the oracle baseline for embedding near-dedup: an n^2 self-join
    with the cosine fused into the join projection. Vectors are L2-normalized
    once *before* the join (map-side, one pass) so the pair computation is a
    plain dot product — half the flops of naive cosine-per-pair and the
    normalized column is what gets shuffled.

    Scale note: exact all-pairs is quadratic and is NOT the 100 TB path —
    at corpus scale run an LSH prefilter (``cosine_self_join_topk`` buckets,
    or SimHash banding) and verify candidates with this same fused dot
    product. Kept exact here because it is the ground truth the approximate
    paths are recall-tested against.
    """
    inv = F.lit(1.0) / norm(_as_double(F.col(vec_col)))
    normed = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") * inv).alias("nv"),
    )
    a, b = normed.alias("a"), normed.alias("b")
    sim = dot(F.col("a.nv"), F.col("b.nv"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs via block-partitioned GEMM.

    Same result set as ``cosine_pairs``, different physical shape — the
    one that survives scale. Each vector lands in block ``id % n_blocks``
    and is replicated to every block-pair (i, j), i <= j, it belongs to;
    one ``applyInPandas`` task per block-pair runs a single numpy float64
    matmul over its members and emits only the pairs above threshold.

    Why this wins: the naive pair join shuffles ~n²/2 joined rows each
    carrying two full vectors; here each vector moves n_blocks+1 times
    regardless of n, the n² work happens inside a BLAS kernel instead of
    2·dim interpreted expression evaluations per pair, and only
    above-threshold pairs (rare by construction) ever materialize as
    rows. Block count trades replication factor against per-task memory:
    a block-pair task holds 2·(n/n_blocks) vectors.
    """
    nb = F.lit(n_blocks)
    blk = (F.col(id_col) % nb).cast("int")
    base = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        blk.alias("blk"),
    )
    # Membership (bi, bj) for every block-pair bi <= bj: as the left
    # member for pairs (blk, j >= blk), as the right member for
    # (i <= blk, blk). The (blk, blk) diagonal must appear once — it
    # comes from the left expansion; the right expansion excludes it.
    left = base.select(
        "id", "v", F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), nb - 1)).alias("bj"),
    )
    right = base.filter(F.col("blk") > 0).select(
        "id", "v",
        F.explode(F.sequence(F.lit(0), F.col("blk") - 1)).alias("bi"),
        F.col("blk").alias("bj"),
    )
    members = left.unionByName(right)

    out_schema = "id_a long, id_b long, cosine_sim double"

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        ia, ib = np.nonzero(sims >= threshold)
        keep = ids[ia] < ids[ib]
        ia, ib = ia[keep], ib[keep]
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cosine_sim": sims[ia, ib]}
        )

    pairs = members.groupBy("bi", "bj").applyInPandas(gemm, schema=out_schema)
    # A pair whose two ids share a block appears in every (blk, j)/(i, blk)
    # group containing both — dedup to one row.
    return pairs.dropDuplicates(["id_a", "id_b"])


def _kmeans_centroids(
    df: DataFrame,
    nlist: int,
    id_col: str,
    vec_col: str,
    iters: int = 2,
) -> np.ndarray:
    """Deterministic coarse quantizer for IVF: k-means with id-ordered seeds.

    Seeds are the ``nlist`` vectors with the smallest ids (deterministic,
    no RNG in the distributed path); each refinement iteration is one
    assign (fused argmin expression, JVM-side) + one mean (posexplode →
    groupBy(cell, pos) avg). The centroid table is nlist×dim — tiny by
    construction — so collecting it to the driver is the standard IVF
    design, not a scalability leak.
    """
    # Persist the (id, vec) projection for the loop (round 16, guide
    # §5 — the logreg/MLlib iterative-training idiom): the seeds fetch
    # and every refinement iteration re-ran the source scan plus any
    # upstream normalization UDF. Private scope, released before
    # return (only the numpy centroids escape). Persist preserves
    # partition contents, so the per-partition partial averages — and
    # with them the centroids — are bit-identical.
    from dwh_with_dask_spark.operators.caching import CacheScope

    scope = CacheScope()
    src = scope.persist(df.select(id_col, vec_col))
    try:
        seeds = (
            src.orderBy(F.col(id_col).asc())
            .limit(nlist)
            .select(vec_col)
            .collect()
        )
        cents = np.asarray([list(r[0]) for r in seeds], dtype=np.float64)
        for _ in range(iters):
            assigned = src.select(
                _nearest_cell_udf(cents)(F.col(vec_col)).alias("cell"),
                F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val"),
            )
            rows = (
                assigned.groupBy("cell", "pos")
                .agg(F.avg("val").alias("m"))
                .collect()
            )
            new = cents.copy()
            for r in rows:
                new[r["cell"], r["pos"]] = r["m"]
            cents = new
    finally:
        scope.release()
    return cents


def _nearest_cell_udf(cents: np.ndarray):
    """Arrow-batched argmin-over-centroids: one (batch × dim) @
    (dim × nlist) GEMM per batch, first-index tie-break (np.argmin).

    Replaces the earlier fused-literal-expression argmin whose plan size
    was O(nlist·dim) and which was re-evaluated per query — the
    dim-scalable kernel for both k-means assignment and index build.
    """
    c = np.ascontiguousarray(cents, dtype=np.float64)
    c_sq = (c * c).sum(axis=1)

    @F.pandas_udf("int")
    def cell(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=np.int32)
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row →
        # argmin needs only the last two terms.
        d2 = c_sq - 2.0 * (mat @ c.T)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return cell


def build_ivf_index(
    df: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    iters: int = 2,
) -> tuple[DataFrame, np.ndarray]:
    """Materialize the IVF cell id as a stored column — the PRIMARY path.

    Returns ``(indexed_df, centroids)``. Write ``indexed_df`` partitioned
    by ``cell_col`` and keep the tiny (nlist × dim) centroid matrix with
    the table metadata; every subsequent query is partition pruning plus
    exact cosine inside the probed cells. Assignment is one Arrow-batched
    GEMM — no per-centroid expressions in the plan.
    """
    cents = _kmeans_centroids(df, nlist, id_col, vec_col, iters=iters)
    indexed = df.withColumn(cell_col, _nearest_cell_udf(cents)(F.col(vec_col)))
    return indexed, cents


def ivf_topk_indexed(
    index_df: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """IVF top-k against a ``build_ivf_index`` table: pick the ``nprobe``
    cells whose centroids are closest to the query (driver-side, nlist×dim
    flops), filter the STORED cell column, exact cosine inside.

    On a table written ``partitionBy(cell_col)`` the filter is Parquet
    partition pruning — the query reads nprobe/nlist of the data, the
    same physical shape Faiss-IVF/Milvus use, expressed relationally.
    """
    qv = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - qv) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]

    q = F.lit([float(x) for x in query_vec])
    return (
        index_df.filter(F.col(cell_col).isin(probes))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Convenience wrapper: build the IVF index in-plan, then probe it.

    For repeated queries call ``build_ivf_index`` once, write the result
    partitioned by cell, and use ``ivf_topk_indexed`` — the corpus-scale
    path (assignment computed once, probes become partition pruning).
    """
    indexed, cents = build_ivf_index(
        df, nlist=nlist, id_col=id_col, vec_col=vec_col
    )
    return ivf_topk_indexed(
        indexed,
        cents,
        query_vec,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    max_cell_rows: int = 8192,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (public method: Abbas et
    al. 2023, arXiv:2303.09540): cluster embeddings into ``nlist``
    k-means cells, then WITHIN each cell drop every vector that has a
    lower-id neighbor with cosine >= ``threshold``. Returns one row per
    input vector: (id, cell, dup_of, is_kept) where ``dup_of`` is the
    smallest-id above-threshold neighbor (NULL when kept).

    Semantics notes, matching the published method:
    - Pruning is greedy by id order within the cell, not
      connected-components: in a chain a~b~c with a!~c, b is dropped as
      a duplicate of a and c as a duplicate of b even though b itself
      was dropped. Deterministic given ids.
    - Cross-cell near-duplicates are NOT detected — that is the
      approximation that makes the method sub-quadratic (cells bound
      the GEMM). The exact counterpart is ``cosine_pairs_blocked``;
      tests check cell-local agreement between the two.

    Physical shape: cell assignment is the stored-column IVF kernel
    (one Arrow-batched GEMM, centroids are nlist x dim driver metadata);
    the dedup pass is one ``applyInPandas`` task per cell — a single
    float64 GEMM over the cell's members, shuffled once on the cell id.
    A cell of m vectors costs m^2 flops and m*dim resident bytes.

    Giant cells (VERDICT r5 ask #6): a cell larger than
    ``max_cell_rows`` no longer materializes its m×m similarity matrix.
    Because the drop rule is "ANY lower-id neighbor above threshold"
    (not sequential-greedy), it decomposes exactly over tiles: the cell
    task streams ``max_cell_rows``-sized row/column tiles of the GEMM,
    keeping per-row only the smallest matching id so far — bit-identical
    keepers to the one-shot path (property-tested), with the quadratic
    buffer bounded at tile² while total flops stay m²/2. The task still
    holds the cell's m×dim matrix; if even THAT outgrows one executor,
    raise nlist (the paper's regime) — a coarser nlist only moves the
    approximation boundary, never the within-cell answer.
    """
    indexed, _cents = build_ivf_index(
        df, nlist=nlist, id_col=id_col, vec_col=vec_col, iters=iters
    )
    out_schema = f"{id_col} long, ivf_cell int, dup_of long, is_kept boolean"

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable")
        ids = pdf[id_col].to_numpy()
        cell = pdf["ivf_cell"].to_numpy()
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        mat /= norms
        m = len(ids)
        if m <= max_cell_rows:
            sims = mat @ mat.T
            # strictly-lower-triangular mask: neighbors with smaller id
            hit = np.tril(sims >= threshold, k=-1)
            has_dup = hit.any(axis=1)
            first_j = hit.argmax(axis=1)  # smallest index == smallest id
            dup_of = np.where(has_dup, ids[first_j], -1)
        else:
            # tiled exact path: per row track the FIRST (smallest-index
            # == smallest-id) hit; column tiles ascend, so the first
            # tile that hits a row decides it.
            b = max_cell_rows
            dup_of = np.full(m, -1, dtype=np.int64)
            for i0 in range(0, m, b):
                i1 = min(i0 + b, m)
                rows = mat[i0:i1]
                unresolved = dup_of[i0:i1] == -1
                for j0 in range(0, i1, b):
                    j1 = min(j0 + b, i1)
                    if not unresolved.any():
                        break
                    sims = rows @ mat[j0:j1].T
                    # strict j < i constraint within the diagonal tile
                    gi = np.arange(i0, i1)[:, None]
                    gj = np.arange(j0, j1)[None, :]
                    hit = (sims >= threshold) & (gj < gi)
                    hit[~unresolved] = False
                    any_hit = hit.any(axis=1)
                    first_j = hit.argmax(axis=1)
                    take = any_hit & unresolved
                    dup_of[i0:i1][take] = ids[j0:j1][first_j[take]]
                    unresolved = dup_of[i0:i1] == -1
            has_dup = dup_of >= 0
        return pd.DataFrame(
            {
                id_col: ids,
                "ivf_cell": cell,
                "dup_of": pd.array(
                    [int(d) if d >= 0 else None for d in dup_of],
                    dtype="Int64",
                ),
                "is_kept": ~has_dup,
            }
        )

    return indexed.groupBy("ivf_cell").applyInPandas(dedup_cell, out_schema)


def cosine_self_join_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """All-pairs approximate kNN: LSH-bucket equi-join, then per-row top-k.

    The n^2 cross join is replaced by an equi-join on the SRP bucket —
    only same-bucket pairs are scored. Per-id top-k via row_number over a
    (bucket-pruned) window.
    """
    from pyspark.sql.window import Window

    dim = df.select(F.size(vec_col)).first()[0]
    planes = _all_planes(dim, bits, tables=1, seed=seed)
    kernel = _srp_sigs_udf(planes, tables=1, bits=bits)
    with_sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.element_at(kernel(F.col(vec_col)), 1).alias("sig"),
    )
    a, b = with_sig.alias("a"), with_sig.alias("b")
    pairs = a.join(
        b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") != F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine(F.col("a.v"), F.col("b.v")).alias("cosine_sim"),
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("cosine_sim").desc(), F.col("id_b").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


# --------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011): compressed-vector ANN
# --------------------------------------------------------------------------

def _pq_codes_udf(codebooks: np.ndarray, normalize: bool = False):
    """Arrow-batched encoder: per subspace argmin-distance centroid id.
    codebooks: (m, ksub, dsub). One GEMM per (batch, subspace).
    ``normalize`` L2-normalizes INSIDE the numpy batch — never as a
    higher-order Column expression, whose norm subterm re-evaluates per
    array element under CollapseProject (the measured O(dim²)-per-row
    hazard: the flat-PQ sf1 query ran 170 s through `_normalized_vec`
    vs ~7 s with batch-side normalization)."""
    m, ksub, dsub = codebooks.shape

    @F.pandas_udf("array<int>")
    def codes(col):
        import pandas as pd

        x = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        if len(x) == 0:
            return pd.Series([], dtype=object)
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            cb = codebooks[j]  # ksub × dsub
            d2 = (
                (sub**2).sum(axis=1, keepdims=True)
                - 2.0 * sub @ cb.T
                + (cb**2).sum(axis=1)
            )
            out[:, j] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in out])

    return codes


def pq_train(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    normalize: bool = True,
) -> np.ndarray:
    """Train PQ codebooks (m subspaces × ksub centroids) on the
    L2-NORMALIZED vectors — deterministic, mirroring the IVF coarse
    quantizer's contract: seeds are the ksub smallest-id vectors'
    sub-slices (no RNG), each refinement iteration is ONE distributed
    pass (encode per row, posexplode to (sub, code, pos, val), mean per
    centroid coordinate). Codebooks are m×ksub×dsub floats — metadata,
    like IVF centroids.
    """
    from dwh_with_dask_spark.operators.caching import CacheScope

    # Persist the NORMALIZED (id, vec) projection for the whole train
    # (round 16, guide §5): the dim probe, the seeds fetch, and every
    # refinement iteration re-ran the source scan + the normalize UDF
    # (and, in the IVF-PQ composition, the upstream cell + residual
    # UDFs too). Seeds read the persisted normalized column — the
    # driver-side numpy normalization this replaces used the identical
    # float64 expression (x / max(||x||, 1e-12)), so the seed books
    # are bit-identical. Private scope, released before return (only
    # the numpy codebooks escape).
    raw = _as_double(F.col(vec_col))
    nv = _normalize_udf()(raw) if normalize else raw
    scope = CacheScope()
    src = scope.persist(df.select(F.col(id_col), nv.alias("__nv")))
    try:
        first = src.select("__nv").first()
        if first is None:
            raise ValueError("pq_train: empty input")
        dim = len(first[0])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        dsub = dim // m

        seeds = (
            src.orderBy(F.col(id_col).asc())
            .limit(ksub)
            .select("__nv")
            .collect()
        )
        sv = np.asarray([list(r[0]) for r in seeds], dtype=np.float64)
        if len(sv) < ksub:
            raise ValueError(f"need >= ksub={ksub} vectors, got {len(sv)}")
        books = np.stack(
            [sv[:, j * dsub : (j + 1) * dsub].copy() for j in range(m)]
        )  # m × ksub × dsub

        for _ in range(iters):
            enc = _pq_codes_udf(books, normalize=False)
            assigned = src.select(
                F.posexplode(enc(F.col("__nv"))).alias("sub", "code"),
                F.col("__nv"),
            ).select(
                "sub",
                "code",
                F.posexplode(
                    F.slice(
                        F.col("__nv"),
                        F.col("sub") * dsub + 1,
                        F.lit(dsub),
                    )
                ).alias("pos", "val"),
            )
            rows = (
                assigned.groupBy("sub", "code", "pos")
                .agg(F.avg("val").alias("mean"))
                .collect()
            )
            new = books.copy()
            for r in rows:
                new[r["sub"], r["code"], r["pos"]] = r["mean"]
            books = new
    finally:
        scope.release()
    return books


def _normalize_udf():
    """Arrow-batched L2 normalization. NOT a Column transform: the norm
    subterm of a higher-order lambda re-evaluates per element under
    CollapseProject — O(dim²) per row, measured 170 s vs 7 s on the sf1
    PQ query."""

    @F.pandas_udf("array<double>")
    def nrm(col):
        import pandas as pd

        x = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        if len(x) == 0:
            return pd.Series([], dtype=object)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series([row.tolist() for row in x])

    return nrm


def build_pq_index(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    normalize: bool = True,
) -> DataFrame:
    """Stored-column PQ index: m small ints per vector (the 8-32x
    compression that lets a 100 TB embedding table's candidate scan fit
    in a fraction of the IO). Write it once; probes never touch the
    float vectors until (optional) refinement."""
    enc = _pq_codes_udf(codebooks, normalize=normalize)
    return df.withColumn(code_col, enc(_as_double(F.col(vec_col))))


def pq_topk_indexed(
    index_df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance top-k over stored PQ codes: the driver builds
    the m×ksub inner-product lookup table from the normalized query
    (m·ksub·dsub flops), ships it as a literal, and each row's score is
    m table lookups folded in a pure-Column aggregate — no Python, no
    float vectors read. Returns (id_col, pq_score) — pq_score
    approximates cosine on normalized inputs."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    table = np.stack(
        [codebooks[j] @ qn[j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # m × ksub
    # one nested Literal node (round 16): the per-element F.lit build
    # paid m*ksub py4j calls and handed the optimizer a thousand-node
    # tree - plan construction + optimization dominated the probe
    tlit = F.lit([[float(x) for x in table[j]] for j in range(m)])
    codes = F.col(code_col)
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(tlit, j + 1),
            (F.element_at(codes, j + 1) + 1).cast("int"),
        ),
    )
    return (
        index_df.select(F.col(id_col), score.alias("pq_score"))
        .orderBy(F.col("pq_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _residual_udf(cents: np.ndarray):
    """(normalized vector, cell) -> vector − centroid[cell], the IVF-PQ
    residual (Arrow-batched)."""

    @F.pandas_udf("array<double>")
    def resid(vec, cell):
        import pandas as pd

        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vec])
        if len(x) == 0:
            return pd.Series([], dtype=object)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        r = x - cents[cell.to_numpy()]
        return pd.Series([row.tolist() for row in r])

    return resid


def build_ivfpq_index(
    df: DataFrame,
    nlist: int = 64,
    m: int = 16,
    ksub: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
):
    """IVF-PQ (the Faiss composition, Jégou et al. 2011): coarse
    k-means cell + product quantization OF THE RESIDUAL
    (vector − cell centroid). Returns (indexed_df with ivf_cell +
    pq_code, centroids, codebooks). Residuals concentrate near zero, so
    the same (m, ksub) budget quantizes them far better than raw
    vectors — recall at a given code size beats flat PQ, and the cell
    column adds IVF's partition pruning on top.

    All the determinism contracts of the parts hold (id-ordered seeds,
    no RNG); the residual pass is one extra Arrow-batched projection.

    One geometry throughout (ADVICE r6): the coarse k-means, the cell
    assignment, the residual, and the probe-side centroid ranking all
    operate on the L2-NORMALIZED vectors. Running the coarse k-means on
    raw vectors while probing ranked normalized centroids against the
    normalized query meant non-unit-norm corpora could probe cells
    systematically different from the assignment-nearest ones —
    silently hurting recall (the ADC decomposition stayed exact). Now
    ``x_n = centroid[cell] + residual`` holds exactly in the one shared
    space, so ``q·x_n = q·c + q·r`` is the exact score split.
    """
    nrm = df.withColumn("__nvec", _normalize_udf()(F.col(vec_col)))
    cents = _kmeans_centroids(nrm, nlist, id_col, "__nvec", iters=iters)
    assigned = nrm.withColumn(
        "ivf_cell", _nearest_cell_udf(cents)(F.col("__nvec"))
    )
    with_resid = assigned.withColumn(
        "__resid", _residual_udf(cents)(F.col("__nvec"), F.col("ivf_cell"))
    )
    books = pq_train(
        with_resid, m=m, ksub=ksub, id_col=id_col, vec_col="__resid",
        normalize=False,
    )
    indexed = build_pq_index(
        with_resid, books, id_col=id_col, vec_col="__resid",
        normalize=False,
    )
    # ||residual|| = the true assignment distance, computed while the
    # residual is in hand — save_ivfpq_index records its mean as the
    # drift baseline append_ivfpq_index's re-train trigger compares to.
    indexed = indexed.withColumn(
        "__adist",
        F.sqrt(
            F.aggregate(
                F.col("__resid"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    ).drop("__resid", "__nvec")
    return indexed, cents, books


def ivfpq_topk_indexed(
    index_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """ADC top-k over an IVF-PQ table: probe the nprobe nearest cells
    (stored-cell filter = partition pruning), score =
    q·centroid[cell] + Σⱼ q_subⱼ·codebook[j][codeⱼ]. For inner-product
    ADC the residual lookup table is CELL-INDEPENDENT, so one m×ksub
    table plus one per-cell bias covers every probed cell — the whole
    score is pure-Column folds over stored ints, no Python, no float
    vectors read."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    d2 = ((centroids - qn) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]
    bias = centroids @ qn  # nlist floats
    table = np.stack(
        [codebooks[j] @ qn[j * dsub : (j + 1) * dsub] for j in range(m)]
    )
    blit = F.lit([float(x) for x in bias])
    tlit = F.lit([[float(x) for x in table[j]] for j in range(m)])
    codes = F.col(code_col)
    score = F.element_at(blit, (F.col(cell_col) + 1).cast("int")) + F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(tlit, j + 1),
            (F.element_at(codes, j + 1) + 1).cast("int"),
        ),
    )
    return (
        index_df.filter(F.col(cell_col).isin(probes))
        .select(F.col(id_col), score.alias("pq_score"))
        .orderBy(F.col("pq_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def encode_ivfpq(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """Encode vectors under a FIXED, already-trained IVF-PQ geometry —
    the assignment tail of ``build_ivfpq_index`` with no k-means and no
    codebook training: normalize → nearest cell → residual → PQ codes,
    all Arrow-batched. Returns (id, cell, code, ``__adist``) where
    ``__adist`` is the L2 distance of the normalized vector to its
    assigned centroid — the drift statistic ``append_ivfpq_index``
    reports (vectors drifting away from stale centroids show up as
    growing mean assignment distance; the quantized codes cannot show
    it because decoded residuals saturate at the codebook's span)."""
    nrm = df.withColumn("__nvec", _normalize_udf()(F.col(vec_col)))
    assigned = nrm.withColumn(
        cell_col, _nearest_cell_udf(centroids)(F.col("__nvec"))
    )
    with_resid = assigned.withColumn(
        "__resid", _residual_udf(centroids)(F.col("__nvec"), F.col(cell_col))
    )
    adist = F.sqrt(
        F.aggregate(
            F.col("__resid"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    enc = _pq_codes_udf(codebooks, normalize=False)
    return with_resid.select(
        F.col(id_col),
        F.col(cell_col),
        enc(F.col("__resid")).alias(code_col),
        adist.alias("__adist"),
    )


def _ivfpq_write_segment(
    rows: DataFrame, target: str, id_col: str, cell_col: str, code_col: str
) -> dict:
    """Write one (id, cell, code) SEGMENT partitioned by cell into a
    DOT-PREFIXED staging dir (invisible to Spark's FileIndex and to the
    append's ``__seg=*`` glob — a crashed half-write is inert litter
    the next writer clears, never a partition-discovery landmine inside
    the live index), with a ``_ivfpq_seg.json`` stats sidecar (row
    count + mean assignment distance when ``rows`` carries
    ``__adist``), then publish with one ``os.rename`` — readers never
    see a partial segment. Returns the stats."""
    import json as _json
    import os
    import shutil

    staging = os.path.join(
        os.path.dirname(target),
        "." + os.path.basename(target) + ".inprogress",
    )
    shutil.rmtree(staging, ignore_errors=True)
    aggs = [F.count(F.lit(1)).alias("n")]
    if "__adist" in rows.columns:
        aggs.append(F.avg("__adist").alias("mad"))
    srow = rows.agg(*aggs).first()
    stats = {
        "n": int(srow["n"]),
        "mean_assign_dist": (
            None
            if "__adist" not in rows.columns or srow["mad"] is None
            else float(srow["mad"])
        ),
    }
    (
        rows.select(id_col, cell_col, code_col)
        .repartition(cell_col)
        .write.partitionBy(cell_col)
        .parquet(staging)
    )
    with open(os.path.join(staging, "_ivfpq_seg.json"), "w") as f:
        _json.dump(stats, f)
    os.rename(staging, target)
    return stats


def save_ivfpq_index(
    index_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_code",
    overwrite: bool = False,
) -> str:
    """Persist a ``build_ivfpq_index`` result as a probe-ready store:
    ONLY (id, cell, code) go to parquet — the float vectors stay in the
    source table; an index that re-stores them would forfeit PQ's whole
    compression point — plus the centroids/codebooks as an
    ``_``-prefixed npz beside the data (parquet readers ignore
    underscore files).

    Layout (round 10, appendable)::

        path/_ivfpq_meta.json                  id/cell/code col names,
                                               format=2
        path/_ivfpq_aux.npz                    centroids + codebooks
        path/__seg=N/_ivfpq_seg.json           {n, mean_assign_dist}
        path/__seg=N/ivf_cell=C/*.parquet      (id, code)

    ``__seg``/``ivf_cell`` are partition directories, so ``nprobe``
    cell filters prune directories across every segment at once.
    ``append_ivfpq_index`` adds segments (one atomic rename each)
    without touching stored bytes. When ``index_df`` carries an
    ``__adist`` column (``encode_ivfpq`` output), the base segment's
    mean assignment distance is recorded as the drift baseline.
    Single-writer, like the repo's other stored indexes."""
    import json as _json
    import os
    import shutil

    if os.path.exists(path) and not overwrite:
        raise FileExistsError(
            f"artifact already exists at {path} (overwrite=False)"
        )
    # Staging is built COMPLETELY before the existing index is touched
    # (no-partial-artifact invariant: a failed encode/write leaves the
    # old store intact; same rename-aside swap as compact_bm25_index).
    staging = path + ".inprogress"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    meta = {
        "format": 2,
        "id_col": id_col,
        "cell_col": cell_col,
        "code_col": code_col,
    }
    with open(os.path.join(staging, "_ivfpq_meta.json"), "w") as f:
        _json.dump(meta, f)
    np.savez(
        os.path.join(staging, "_ivfpq_aux.npz"),
        centroids=centroids,
        codebooks=codebooks,
    )
    _ivfpq_write_segment(
        index_df, os.path.join(staging, "__seg=0"), id_col, cell_col, code_col
    )
    retired = path + ".old"
    shutil.rmtree(retired, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, retired)
    os.rename(staging, path)
    shutil.rmtree(retired, ignore_errors=True)
    return path


def append_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> dict:
    """Append NEW vectors to a ``save_ivfpq_index`` store in O(batch):
    assign them to the EXISTING cells and codebooks (``encode_ivfpq``
    — no retraining, nothing stored is read or rewritten) and publish
    the encodings as the next ``__seg=K`` directory with one atomic
    rename. Probes over base+appended equal probes over the union
    encoded under the same geometry in one shot (asserted in tests) —
    the append changes WHICH rows are indexed, never how any row
    scores.

    The honest staleness caveat: centroids and codebooks are frozen at
    build time, so a drifting vector distribution quantizes worse over
    time even though every probe stays exact-over-codes. The returned
    report carries the re-train trigger: the batch's
    ``mean_assign_dist`` (true L2 distance to assigned centroids,
    computed while the floats are in hand) vs the base segment's, as
    ``drift_ratio`` — schedule a full rebuild when it grows past your
    tolerance (the IVF analog of ``refresh_bm25_index``'s exact
    refresh; BM25's global state is exact integers and folds, k-means
    geometry is approximate and cannot).

    Contract: batch ids must be new (append-only, the
    ``incremental_dedup`` rule). Single writer. Returns
    {segment, n, mean_assign_dist, base_mean_assign_dist, drift_ratio}.
    """
    import glob
    import json as _json
    import os

    with open(os.path.join(path, "_ivfpq_meta.json")) as f:
        meta = _json.load(f)
    if meta.get("format") != 2:
        raise ValueError(f"not an appendable (format-2) IVF-PQ index: {path}")
    aux = np.load(os.path.join(path, "_ivfpq_aux.npz"))
    enc = encode_ivfpq(
        new_vectors,
        aux["centroids"],
        aux["codebooks"],
        id_col=id_col or meta["id_col"],
        vec_col=vec_col,
        cell_col=meta["cell_col"],
        code_col=meta["code_col"],
    )
    import shutil

    for stale in glob.glob(os.path.join(path, ".__seg=*.inprogress")):
        shutil.rmtree(stale, ignore_errors=True)
    segs = sorted(
        int(os.path.basename(d).split("=", 1)[1])
        for d in glob.glob(os.path.join(path, "__seg=*"))
    )
    nxt = (segs[-1] + 1) if segs else 0
    stats = _ivfpq_write_segment(
        enc,
        os.path.join(path, f"__seg={nxt}"),
        id_col or meta["id_col"],
        meta["cell_col"],
        meta["code_col"],
    )
    base = None
    if segs:
        with open(
            os.path.join(path, f"__seg={segs[0]}", "_ivfpq_seg.json")
        ) as f:
            base = _json.load(f).get("mean_assign_dist")
    return {
        "segment": nxt,
        "n": stats["n"],
        "mean_assign_dist": stats["mean_assign_dist"],
        "base_mean_assign_dist": base,
        "drift_ratio": (
            stats["mean_assign_dist"] / base
            if base and stats["mean_assign_dist"] is not None
            else None
        ),
    }


def load_ivfpq_index(spark, path: str):
    """(index_df, centroids, codebooks) back from ``save_ivfpq_index``
    — hand straight to ``ivfpq_topk_indexed``/``ivfpq_topk_rerank``.
    The cell filter inside those probes prunes the stored partitions
    (every segment at once); nothing is rebuilt. ``index_df`` carries
    the ``__seg`` partition column — probe operators ignore it."""
    import os

    aux = np.load(os.path.join(path, "_ivfpq_aux.npz"))
    return spark.read.parquet(path), aux["centroids"], aux["codebooks"]


def ivfpq_topk_rerank(
    index_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rerank: int = 100,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """IVF-PQ + exact rerank — the production shape ANN.md recommends
    (VERDICT r7 ask #2): ADC over the stored int codes picks the top
    ``rerank`` candidates from the probed cells (cheap, no float
    vectors read), then ONLY those ``rerank`` rows join back to the
    float-vector table for an exact cosine, and the final top-``k`` is
    exact over that candidate set. Returns (id, score) with
    ``score`` = exact cosine.

    Recall decomposition: the exact rerank recovers every true
    neighbor the candidate set CONTAINS (a true top-k vector among the
    candidates always exact-scores into the final top-k), so
    recall@k == containment of the true top-k in the ADC top-``rerank``
    — rerank converts PQ's code-resolution loss into a widen-the-net
    knob while keeping the scan int-only. Measured on the clustered
    fixture by ``scripts/ann_clustered.py`` (ANN.md table).

    Scale shape: the candidate list is ``rerank`` ids (KBs) —
    broadcast it into the vector table so the exact pass is one
    pruned probe of the (bucketed/partitioned) vector store, never a
    full-corpus float scan; TakeOrderedAndProject caps the result."""
    cand = ivfpq_topk_indexed(
        index_df,
        centroids,
        codebooks,
        query_vec,
        k=rerank,
        nprobe=nprobe,
        id_col=id_col,
        cell_col=cell_col,
        code_col=code_col,
    ).select(id_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    qlit = F.lit([float(x) for x in qn])
    return (
        vectors.join(F.broadcast(cand), id_col)
        .select(
            F.col(id_col),
            (dot(F.col(vec_col), qlit) / norm(F.col(vec_col))).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )

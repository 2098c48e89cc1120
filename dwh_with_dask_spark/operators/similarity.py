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
"""

from __future__ import annotations

import numpy as np
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
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q).alias("cosine_sim")
    return (
        df.select(F.col(id_col), sim)
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _projection_matrix(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (public SRP-LSH construction)."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim))


def srp_signature(
    vec_col: Column, planes: np.ndarray
) -> Column:
    """Sign-random-projection bucket id: bit i = (v · plane_i) >= 0."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseXOR(F.shiftleft((proj >= 0).cast("long"), i))
    return sig


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
    """Approximate top-k: multi-table SRP-LSH prefilter, then exact cosine.

    Classic (b, L) LSH: ``tables`` independent b-bit sign-random-projection
    signatures; a vector is a candidate if ANY table's signature lands
    within ``multiprobe_hamming`` bits of the query's signature for that
    table. Multiple small tables, not one big signature, is what makes
    recall controllable: P(candidate) = 1-(1-p_table)^L climbs steeply
    with L for true neighbors while staying low for random vectors.

    At corpus scale the L signatures are precomputed columns and the
    table is bucketed by them, so a query probes L×(1+b·h) buckets
    instead of scanning; here the prefilter is a single fused scan.
    """
    dim = len(query_vec)
    qv = np.asarray(query_vec, dtype=np.float64)
    q = F.array(*[F.lit(float(x)) for x in query_vec])

    cond = None
    for t in range(tables):
        planes = _projection_matrix(dim, bits, seed + 1000 * t)
        qsig = 0
        for i, plane in enumerate(planes):
            if float(np.dot(qv, plane)) >= 0:
                qsig |= 1 << i
        # All buckets within the probe radius of this table's query sig.
        probes = [qsig]
        if multiprobe_hamming >= 1:
            probes += [qsig ^ (1 << i) for i in range(bits)]
        if multiprobe_hamming >= 2:
            probes += [
                qsig ^ (1 << i) ^ (1 << j)
                for i in range(bits)
                for j in range(i + 1, bits)
            ]
        hit = srp_signature(F.col(vec_col), planes).isin(probes)
        cond = hit if cond is None else (cond | hit)

    candidates = df.filter(cond)
    return (
        candidates.select(
            F.col(id_col), cosine(F.col(vec_col), q).alias("cosine_sim")
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
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
    import pandas as pd

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
    seeds = (
        df.orderBy(F.col(id_col).asc())
        .limit(nlist)
        .select(vec_col)
        .collect()
    )
    cents = np.asarray([list(r[0]) for r in seeds], dtype=np.float64)
    for _ in range(iters):
        assigned = df.select(
            _nearest_centroid(F.col(vec_col), cents).alias("cell"),
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
    return cents


def _nearest_centroid(vec_col: Column, cents: np.ndarray) -> Column:
    """Argmin over literal centroids as one fused expression.

    Builds the array of squared distances and takes
    array_position(dists, array_min(dists)) — first-match semantics give a
    deterministic smallest-index tie-break, all JVM-side, no UDF.
    """
    vd = _as_double(vec_col)
    dists = []
    for c in cents:
        carr = F.array(*[F.lit(float(x)) for x in c])
        dists.append(
            F.aggregate(
                F.zip_with(vd, carr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize, probe nearest cells, exact
    cosine inside them.

    The inverted-file layout: every vector is assigned to its nearest of
    ``nlist`` centroids; a query scores only the ``nprobe`` cells whose
    centroids are closest to it, scanning nprobe/nlist of the data. At
    corpus scale the cell id is a materialized partition column, so the
    probe is partition pruning on the Parquet scan rather than a filter —
    the same plan shape Faiss-IVF/Milvus use, expressed relationally.
    """
    cents = _kmeans_centroids(df, nlist, id_col, vec_col)
    qv = np.asarray(query_vec, dtype=np.float64)
    d2 = ((cents - qv) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cell = _nearest_centroid(F.col(vec_col), cents)
    return (
        df.filter(cell.isin(probes))
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


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

    dim = len(df.select(F.size(vec_col)).first()[0] * [0])
    planes = _projection_matrix(dim, bits, seed)
    with_sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        srp_signature(F.col(vec_col), planes).alias("sig"),
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

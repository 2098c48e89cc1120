"""Distributed graph analytics: weighted PageRank (Page et al. 1999).

ABSENT-IN-REFERENCE (SURVEY.md §2B north-star): the reference pipeline
has no graph operators at all; this complements the connected-components
fixpoint in ``operators/dedup.py`` with the other canonical iterative
graph primitive, in the standard pregel-by-joins Spark shape.

Execution model per iteration (the published power-iteration form):

    contrib  = ranks JOIN norm_edges ON node = src    (shuffle by node)
    new_rank = (1-d)/N + d * SUM(contrib) GROUP BY dst

The normalized edge table is persisted once (caller-owned lifecycle via
``CacheScope``, same contract as the dedup/similarity operators) so the
K iterations re-shuffle only the rank vector — (node, double) rows —
never the edge list derivation. At 100 TB the edge table partitioning
is stable across iterations, so each join co-partitions against the
same exchange; ranks are a node-count-sized table, orders of magnitude
smaller than the raw fact tables they came from.

Determinism: fixed iteration count, fixed damping, uniform init — no
RNG. Cross-engine float drift is summation-order only (~1e-15
relative); oracles round to 6 dp and tie-break ordering by node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.caching import CacheScope, attach, scoped


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 5,
    damping: float = 0.85,
    undirected: bool = True,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list; returns (node, rank).

    ``undirected=True`` mirrors every edge (the right semantics for
    affinity graphs like customer<->supplier); it also removes dangling
    nodes entirely — every node has out-degree >= 1 — so no dangling
    redistribution term is needed. With ``undirected=False`` dangling
    mass is dropped (the (1-d)/N floor still applies), matching the
    oracle twin exactly.
    """
    scope, created = scoped(scope)
    spark = edges.sparkSession
    reliable = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()

    def _pin(df: DataFrame) -> DataFrame:
        # Same contract as dedup.connected_components: truncate lineage
        # each round so the plan stays flat (persist caches data but the
        # logical plan would still grow join-deep per iteration, and the
        # repeated reference to ``norm`` inside its own derivation would
        # trip self-join column resolution).
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
            eager=True
        )

    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    outw = e.groupBy("src").agg(F.sum("w").alias("__tw"))
    norm = scope.persist(
        e.join(outw, "src").select(
            F.col("src").alias("node"), "dst", (F.col("w") / F.col("__tw")).alias("p")
        )
    )
    nodes = scope.persist(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    base = (1.0 - damping) / n

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            ranks.join(norm, "node")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("__c"))
            .withColumnRenamed("dst", "node")
        )
        ranks = _pin(
            nodes.join(contrib, "node", "left").select(
                "node",
                (F.lit(base) + damping * F.coalesce("__c", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )

    return attach(ranks, scope, created)


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    per_node: bool = False,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Exact triangle counting over an undirected edge list — the third
    canonical graph primitive beside PageRank and connected components
    (clustering-coefficient inputs, community density, link-spam and
    bot-ring signals over co-occurrence graphs).

    Algorithm (the standard distributed formulation): canonicalize each
    undirected edge to (lo, hi) with lo < hi and dedupe — self-loops
    drop, each triangle {a < b < c} then exists as EXACTLY the three
    edges (a,b), (b,c), (a,c). Count wedges a<b<c by joining the edge
    list with itself on b, then close each wedge against the edge list
    on (a, c). Every triangle is counted once — no /3 correction, no
    orientation ambiguity.

    Scale shape: two equi-join shuffles over the (deduped) edge list;
    wedge work per node is deg_out² under the a<b<c orientation, which
    for the id ordering is bounded by the same skew guards as any
    self-join (cap or re-id hot nodes first — the hot-shingle idiom).
    Returns a 1-row (n_triangles) frame, or per-APEX counts with
    ``per_node=True`` ((node, n_triangles) where node = the smallest
    id in the triangle — re-aggregable partials for incremental
    maintenance).
    """
    # Persisted: the canonical edge list feeds THREE consumers (both
    # wedge sides + the closing join) whose projections column-prune
    # differently, so ReusedExchange never fires and the whole edge
    # DERIVATION (often itself a join, e.g. the co-occurrence basket
    # self-join) would run three times — measured 6 scans / 0 reuses on
    # the part graph. Lifecycle: caller-owned via ``scope``.
    scope, created = scoped(scope)
    e = scope.persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = ab.join(bc, "b")  # a < b < c by construction
    tris = wedges.join(ac, ["a", "c"])
    if per_node:
        out = tris.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("n_triangles")
        )
    else:
        out = tris.agg(F.count(F.lit(1)).alias("n_triangles"))
    return attach(out, scope, created)

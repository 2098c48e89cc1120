"""Drift-triggered IVF-PQ retrain experiment (VERDICT r12 ask #8).

``append_ivfpq_index`` encodes new batches under FROZEN centroids/
codebooks and reports ``drift_ratio`` (batch mean assignment distance /
base segment's) as the retrain trigger. This script measures the whole
lifecycle the docstring promises, on the clustered fixture:

1. build + save a format-2 IVF-PQ store over 20k clustered vectors;
2. append an IN-distribution batch → drift_ratio ≈ 1 (control: no
   false trigger);
3. append an OUT-of-distribution batch (fresh centers) → drift_ratio
   well above 1 (the trigger fires);
4. measure recall@10 (ivfpq_topk_rerank, nprobe=2, rerank=100) for
   drifted-batch queries against the STALE store, then retrain (full
   rebuild over base+appends, the action the trigger schedules) and
   re-measure → recovered recall, with append vs rebuild wall times
   showing why appends stay O(batch) between retrains.

Appends a section to ANN.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwh_with_dask_spark.operators import similarity as S
from dwh_with_dask_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE = os.path.join(REPO, ".localdata", "index_cache", "ivfpq_drift_store")
K = 10
DIM = 64
N_BASE = 20_000
N_BATCH = 2_000
N_CLUSTERS = 64
SIGMA = 0.05
NQ = 20


def make_clustered(n, centers, sigma, seed):
    rng = np.random.default_rng(seed)
    assign = np.arange(n) % len(centers)
    x = centers[assign] + sigma * rng.normal(size=(n, DIM))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def to_df(spark, mat, id0):
    return spark.createDataFrame(
        [(int(id0 + i), [float(x) for x in mat[i]]) for i in range(len(mat))],
        "vec_id long, embedding array<double>",
    ).repartition(16)


def recall_rows(index_df, cn, bks, vectors, queries, truth):
    recalls, lats = [], []
    for qid, qvec in queries:
        t0 = time.perf_counter()
        got = {
            r.vec_id
            for r in S.ivfpq_topk_rerank(
                index_df, cn, bks, vectors, qvec, k=K, rerank=100, nprobe=2
            ).collect()
        }
        lats.append(time.perf_counter() - t0)
        recalls.append(len(got & truth[qid]) / K)
    return (
        round(sum(recalls) / len(recalls), 3),
        round(statistics.median(lats), 3),
    )


def main() -> None:
    rng = np.random.default_rng(11)
    base_centers = rng.normal(size=(N_CLUSTERS, DIM))
    base_centers /= np.linalg.norm(base_centers, axis=1, keepdims=True)
    rng2 = np.random.default_rng(99)
    new_centers = rng2.normal(size=(N_CLUSTERS, DIM))
    new_centers /= np.linalg.norm(new_centers, axis=1, keepdims=True)

    base = make_clustered(N_BASE, base_centers, SIGMA, seed=1)
    indist = make_clustered(N_BATCH, base_centers, SIGMA, seed=2)
    drifted = make_clustered(N_BATCH, new_centers, SIGMA, seed=3)

    spark = get_spark(app_name="ann_drift")
    base_df = to_df(spark, base, 0)
    in_df = to_df(spark, indist, N_BASE)
    dr_df = to_df(spark, drifted, N_BASE + N_BATCH)
    all_df = base_df.unionByName(in_df).unionByName(dr_df).persist()
    all_df.count()

    # ground truth over the FULL corpus for drifted-batch queries
    full = np.vstack([base, indist, drifted])
    ids = np.arange(len(full), dtype=np.int64)
    qsel = np.random.default_rng(7).permutation(N_BATCH)[:NQ] + N_BASE + N_BATCH
    truth = {}
    for qi in qsel:
        sims = full @ full[qi]
        order = np.lexsort((ids, -sims))[:K]
        truth[int(qi)] = {int(ids[i]) for i in order}
    queries = [(int(qi), [float(x) for x in full[qi]]) for qi in qsel]

    shutil.rmtree(STORE, ignore_errors=True)
    t0 = time.perf_counter()
    idx, cn, bks = S.build_ivfpq_index(base_df, nlist=64, m=16, ksub=64)
    S.save_ivfpq_index(idx, cn, bks, STORE)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    rep_in = S.append_ivfpq_index(in_df, STORE)
    t_append_in = time.perf_counter() - t0
    t0 = time.perf_counter()
    rep_dr = S.append_ivfpq_index(dr_df, STORE)
    t_append_dr = time.perf_counter() - t0
    print("in-distribution append:", rep_in)
    print("drifted append:", rep_dr)
    assert rep_in["drift_ratio"] < 1.2, rep_in
    assert rep_dr["drift_ratio"] > rep_in["drift_ratio"] * 1.2, rep_dr

    stale_idx, cn2, bks2 = S.load_ivfpq_index(spark, STORE)
    stale_recall, stale_lat = recall_rows(
        stale_idx, cn2, bks2, all_df, queries, truth
    )
    print(f"stale store: recall@10={stale_recall} lat={stale_lat}s")

    # the action the trigger schedules: full retrain over base+appends
    t0 = time.perf_counter()
    idx3, cn3, bks3 = S.build_ivfpq_index(all_df, nlist=64, m=16, ksub=64)
    S.save_ivfpq_index(idx3, cn3, bks3, STORE, overwrite=True)
    t_retrain = time.perf_counter() - t0
    fresh_idx, cn4, bks4 = S.load_ivfpq_index(spark, STORE)
    fresh_recall, fresh_lat = recall_rows(
        fresh_idx, cn4, bks4, all_df, queries, truth
    )
    print(f"retrained store: recall@10={fresh_recall} lat={fresh_lat}s")

    with open(os.path.join(REPO, "ANN.md"), "a") as f:
        f.write(
            "\n## Drift-triggered retrain (`scripts/ann_drift.py`, round 13)\n\n"
            f"Base: {N_BASE} clustered vectors (64 centers, sigma="
            f"{SIGMA}), IVF-PQ nlist=64 m=16 ksub=64, format-2 store. "
            f"Two O(batch) appends of {N_BATCH} vectors each: one drawn "
            "from the SAME centers (control), one from 64 FRESH centers "
            "(drift). Queries are drawn from the drifted batch; recall "
            "protocol = ivfpq_topk_rerank nprobe=2 rerank=100 over the "
            "full corpus truth.\n\n"
            "| step | wall s | drift_ratio | recall@10 (drifted queries) |\n"
            "| --- | --- | --- | --- |\n"
            f"| build+save base ({N_BASE}) | {t_build:.1f} | — (baseline) | — |\n"
            f"| append in-distribution ({N_BATCH}) | {t_append_in:.1f} | "
            f"{rep_in['drift_ratio']:.3f} | — |\n"
            f"| append drifted ({N_BATCH}) | {t_append_dr:.1f} | "
            f"{rep_dr['drift_ratio']:.3f} | — |\n"
            f"| probe STALE store | — | — | {stale_recall} "
            f"(median probe {stale_lat}s) |\n"
            f"| retrain (full rebuild, {N_BASE + 2 * N_BATCH}) | "
            f"{t_retrain:.1f} | resets to 1 | — |\n"
            f"| probe retrained store | — | — | {fresh_recall} "
            f"(median probe {fresh_lat}s) |\n"
            "\nReading: the control append's drift_ratio stays ~1 (no "
            "false trigger); the out-of-distribution append reports "
            f"{rep_dr['drift_ratio']:.2f}, the signal to schedule a "
            "rebuild. Probing the stale store for drifted queries "
            f"still works (every probe is exact over codes) at "
            f"recall {stale_recall}; retraining re-fits centroids/"
            f"codebooks to the grown corpus and lifts it to "
            f"{fresh_recall}. Appends cost "
            f"{t_append_in:.0f}-{t_append_dr:.0f} s vs {t_retrain:.0f} s "
            "for the rebuild — the economics of appending between "
            "drift-triggered retrains.\n"
        )
    print("appended drift section to ANN.md")
    spark.stop()


if __name__ == "__main__":
    main()

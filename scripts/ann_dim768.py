"""ANN recall at realistic dimensionality (VERDICT r13 ask #8).

ANN.md's sweeps run at dim 64; production text embeddings are 384-1536
dims with a fast-decaying eigenspectrum (most variance in a few
directions). This script measures IVF-PQ at dim 768 on NON-ISOTROPIC
data constructed so the driver testdata embeddings are literally the
corpus's top-64 principal components:

  x768 = normalize( Q @ [ s_head * x64_testdata ; s_tail * noise ] )

- x64: /root/testdata/sf0.1/embeddings.parquet (2000 vectors, labeled
  clusters), tiled 10x with small jitter -> 20000 vectors so the cells
  are meaningfully populated;
- s_j = 1/sqrt(1+j): the decaying spectrum (head dims carry the
  signal, the 704 tail dims are low-variance noise — the PCA shape);
- Q: a seeded random orthogonal rotation, so the anisotropy is NOT
  axis-aligned (axis-aligned decay would hand PQ's coordinate-chunked
  subquantizers an unrealistic gift).

Protocol identical to ann_clustered.py: 20 seeded queries, recall@10
vs exact cosine ground truth, nprobe sweep 1/2/4 (+ the rerank
composition at nprobe=2), section appended to ANN.md.

Usage: python scripts/ann_dim768.py [--n-rep 10] [--nq 20] [--out ANN.md]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwh_with_dask_spark.operators import similarity as S
from dwh_with_dask_spark.session import get_spark

K = 10
DIM = 768
HEAD = 64


def make_dim768(n_rep: int, seed: int = 23):
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    base = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    reps = [base]
    for _ in range(n_rep - 1):
        j = base + 0.02 * rng.normal(size=base.shape)
        reps.append(j / np.linalg.norm(j, axis=1, keepdims=True))
    head = np.concatenate(reps, axis=0)  # (n_rep*2000, 64)
    n = head.shape[0]

    spectrum = 1.0 / np.sqrt(1.0 + np.arange(DIM))
    lifted = np.zeros((n, DIM))
    lifted[:, :HEAD] = head * spectrum[:HEAD]
    lifted[:, HEAD:] = rng.normal(size=(n, DIM - HEAD)) * spectrum[HEAD:] * 0.25
    q_mat, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    x = lifted @ q_mat.T
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def ground_truth(mat, qidx):
    ids = np.arange(mat.shape[0], dtype=np.int64)
    out = {}
    for qi in qidx:
        sims = mat @ mat[qi]
        order = np.lexsort((ids, -sims))[:K]
        out[int(qi)] = set(int(ids[i]) for i in order)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rep", type=int, default=10)
    ap.add_argument("--nq", type=int, default=20)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ANN.md",
        ),
    )
    args = ap.parse_args()

    mat = make_dim768(args.n_rep)
    n = mat.shape[0]
    # anisotropy check: variance explained by the top-64 PCA directions
    _, s, _ = np.linalg.svd(mat[:4000] - mat[:4000].mean(0), full_matrices=False)
    var = s**2 / (s**2).sum()
    head_var = float(var[:HEAD].sum())

    rng = np.random.default_rng(7)
    qidx = rng.permutation(n)[: args.nq]
    truth = ground_truth(mat, qidx)
    queries = [(int(i), [float(x) for x in mat[i]]) for i in qidx]

    spark = get_spark(app_name="ann_dim768")
    import pandas as pd

    emb = (
        spark.createDataFrame(
            pd.DataFrame(
                {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)}
            )
        )
        .repartition(32)
        .persist()
    )
    emb.count()

    t0 = time.perf_counter()
    idxq, cn, bks = S.build_ivfpq_index(emb, nlist=64, m=args.m, ksub=64)
    idxq = idxq.persist()
    idxq.count()
    build_s = round(time.perf_counter() - t0, 1)

    rows = []
    for nprobe in (1, 2, 4):
        recalls, lats = [], []
        for qid, qvec in queries:
            t0 = time.perf_counter()
            got = {
                r.vec_id
                for r in S.ivfpq_topk_indexed(
                    idxq, cn, bks, qvec, k=K, nprobe=nprobe
                ).collect()
            }
            lats.append(time.perf_counter() - t0)
            recalls.append(len(got & truth[qid]) / K)
        rows.append(
            (
                nprobe,
                round(sum(recalls) / len(recalls), 3),
                round(statistics.median(lats), 3),
            )
        )
        print(f"IVFPQ dim768 nprobe={nprobe}: {rows[-1][1:]}", flush=True)

    rr_rows = []
    for nprobe, rerank in ((1, 100), (2, 100), (4, 100)):
        recalls, lats = [], []
        for qid, qvec in queries:
            t0 = time.perf_counter()
            got = {
                r.vec_id
                for r in S.ivfpq_topk_rerank(
                    idxq, cn, bks, emb, qvec,
                    k=K, nprobe=nprobe, rerank=rerank,
                ).collect()
            }
            lats.append(time.perf_counter() - t0)
            recalls.append(len(got & truth[qid]) / K)
        rr_rows.append(
            (
                nprobe,
                rerank,
                round(sum(recalls) / len(recalls), 3),
                round(statistics.median(lats), 3),
            )
        )
        print(
            f"IVFPQ+rerank dim768 nprobe={nprobe} N={rerank}: "
            f"{rr_rows[-1][2:]}",
            flush=True,
        )
    idxq.unpersist()
    emb.unpersist()

    with open(args.out, "a") as f:
        f.write(
            "\n## Dim-768 non-isotropic sweep (`scripts/ann_dim768.py`, "
            "round 14)\n\n"
            f"{n} vectors at dim 768 built so the driver testdata "
            "embeddings are the\ncorpus's top-64 principal components: "
            "testdata vectors (tiled 10x with\n0.02 jitter) carry a "
            "1/sqrt(1+j) decaying spectrum in the head dims, the\n704 "
            "tail dims are low-variance noise, and a seeded random "
            "rotation makes\nthe anisotropy non-axis-aligned (no gift "
            "to PQ's coordinate chunking).\nTop-64 PCA directions carry "
            f"{head_var:.1%} of the variance — the realistic\n"
            f"embedding shape. IVF-PQ nlist=64 m={args.m} ksub=64 (subdim {768 // args.m}), "
            f"build+persist\n{build_s} s; protocol as the sweeps above "
            "(20 seeded queries, recall@10 vs\nexact cosine).\n\n"
            "| index | nprobe | recall@10 | probe s |\n"
            "| --- | --- | --- | --- |\n"
        )
        for nprobe, rec, lat in rows:
            f.write(f"| IVF-PQ m={args.m} | {nprobe} | {rec} | {lat} |\n")
        for nprobe, rerank, rec, lat in rr_rows:
            f.write(
                f"| IVF-PQ m={args.m} + rerank {rerank} | {nprobe} | {rec} | {lat} |\n"
            )
    print(f"appended dim-768 section to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()

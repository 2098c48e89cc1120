"""Clustered-geometry ANN sweep (VERDICT r6 ask #4).

ANN.md's sf1 sweep measures near-orthogonal synthetic vectors — the
geometry where IVF/IVF-PQ honestly lose (cell loss x code loss
compound to 0.24-0.43 recall). This script generates the OTHER regime
the text promises: a deterministic mixture of Gaussians (real
embedding corpora cluster — topics, languages, templates), runs the
same recall protocol, and appends a "Clustered geometry" section to
ANN.md so the winning-regime claim is measured, not asserted.

Fixture: n vectors, 64-dim, n_clusters unit-norm centers (seeded),
x = normalize(center + sigma * N(0, I)). sigma=0.05 gives
within-cluster cosine ~0.86 vs cross-cluster ~0.0 (noise norm sigma*sqrt(dim)=0.4 vs unit centers; sigma much larger buries the centers in noise) — clearly clustered
but far from degenerate.

Usage: python scripts/ann_clustered.py [--n 20000] [--clusters 64]
         [--sigma 0.05] [--nq 20] [--out ANN.md]
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


def make_clustered(n: int, dim: int, n_clusters: int, sigma: float, seed: int = 11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.arange(n) % n_clusters
    x = centers[assign] + sigma * rng.normal(size=(n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x, assign


def ground_truth(ids, mat, qidx):
    out = {}
    for qi in qidx:
        sims = mat @ mat[qi]
        order = np.lexsort((ids, -sims))[:K]
        out[int(ids[qi])] = set(int(ids[i]) for i in order)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--sigma", type=float, default=0.05)
    ap.add_argument("--nq", type=int, default=20)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ANN.md"
        ),
    )
    args = ap.parse_args()

    mat, assign = make_clustered(args.n, 64, args.clusters, args.sigma)
    ids = np.arange(args.n, dtype=np.int64)
    within = float(
        np.mean(
            [
                mat[i] @ mat[i + args.clusters]
                for i in range(0, 2000)
            ]
        )
    )
    cross = float(np.mean([mat[i] @ mat[i + 1] for i in range(0, 2000)]))

    spark = get_spark(app_name="ann_clustered")
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]]) for i in range(args.n)],
        "vec_id long, embedding array<double>",
    ).repartition(32)

    rng = np.random.default_rng(7)
    qidx = rng.permutation(args.n)[: args.nq]
    truth = ground_truth(ids, mat, qidx)
    queries = [(int(i), [float(x) for x in mat[i]]) for i in qidx]

    ivf_rows = []
    indexed, cents = S.build_ivf_index(emb, nlist=64)
    indexed = indexed.persist()
    indexed.count()
    for nprobe in (1, 2, 4, 8):
        recalls, lats = [], []
        for qid, qvec in queries:
            t0 = time.perf_counter()
            got = {
                r.vec_id
                for r in S.ivf_topk_indexed(
                    indexed, cents, qvec, k=K, nprobe=nprobe
                ).collect()
            }
            lats.append(time.perf_counter() - t0)
            recalls.append(len(got & truth[qid]) / K)
        ivf_rows.append(
            (
                64,
                nprobe,
                round(sum(recalls) / len(recalls), 3),
                round(nprobe / 64, 4),
                round(statistics.median(lats), 3),
            )
        )
        print(f"IVF nlist=64 nprobe={nprobe}: {ivf_rows[-1][2:]}", flush=True)
    indexed.unpersist()

    ivfpq_rows = []
    idxq, cn, bks = S.build_ivfpq_index(emb, nlist=64, m=16, ksub=64)
    idxq = idxq.persist()
    idxq.count()
    for nprobe in (1, 2, 4, 8):
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
        ivfpq_rows.append(
            (
                64,
                16,
                64,
                nprobe,
                round(sum(recalls) / len(recalls), 3),
                round(nprobe / 64, 4),
                round(statistics.median(lats), 3),
            )
        )
        print(
            f"IVFPQ nlist=64 m=16 nprobe={nprobe}: {ivfpq_rows[-1][4:]}",
            flush=True,
        )

    # IVF-PQ + exact rerank (the production shape the Recommendation
    # cites — VERDICT r7 ask #2: this measurement is the committed
    # provenance for the containment numbers). The operator's recall@10
    # EQUALS containment of the true top-10 in the ADC top-`rerank`
    # (exact rerank recovers every contained neighbor), so one sweep
    # provides both readings.
    rerank_rows = []
    for nprobe, rerank in ((1, 100), (2, 50), (2, 100), (4, 100)):
        recalls, lats = [], []
        for qid, qvec in queries:
            t0 = time.perf_counter()
            got = {
                r.vec_id
                for r in S.ivfpq_topk_rerank(
                    idxq, cn, bks, emb, qvec, k=K, rerank=rerank,
                    nprobe=nprobe,
                ).collect()
            }
            lats.append(time.perf_counter() - t0)
            recalls.append(len(got & truth[qid]) / K)
        rerank_rows.append(
            (
                nprobe,
                rerank,
                round(sum(recalls) / len(recalls), 3),
                round(statistics.median(lats), 3),
            )
        )
        print(
            f"IVFPQ+rerank nprobe={nprobe} rerank={rerank}: "
            f"{rerank_rows[-1][2:]}",
            flush=True,
        )
    idxq.unpersist()

    srp_rows = []
    for bits, tables in ((10, 16),):
        idx = S.build_srp_index(emb, bits=bits, tables=tables).persist()
        idx.count()
        recalls, lats = [], []
        for qid, qvec in queries:
            t0 = time.perf_counter()
            got = {
                r.vec_id
                for r in S.ann_lsh_topk_indexed(
                    idx, qvec, k=K, bits=bits, tables=tables
                ).collect()
            }
            lats.append(time.perf_counter() - t0)
            recalls.append(len(got & truth[qid]) / K)
        idx.unpersist()
        srp_rows.append(
            (
                bits,
                tables,
                round(sum(recalls) / len(recalls), 3),
                round(statistics.median(lats), 3),
            )
        )
        print(f"SRP bits={bits} tables={tables}: {srp_rows[-1][2:]}", flush=True)

    with open(args.out, "a") as f:
        f.write(
            "\n## Clustered geometry (`scripts/ann_clustered.py`)\n\n"
            f"Mixture of Gaussians: {args.n} unit vectors, 64-dim, "
            f"{args.clusters} seeded centers, sigma={args.sigma} "
            f"(mean within-cluster cosine {within:.2f}, cross "
            f"{cross:.2f}), {args.nq} seeded queries, k=10 — the regime "
            "real embedding corpora live in (topics/languages/templates "
            "cluster). Same recall protocol as the sf1 sweep above.\n\n"
            "| index | setting | nprobe | recall@10 | candidate frac | probe s |\n"
            "| --- | --- | --- | --- | --- | --- |\n"
        )
        for nl, np_, r, c, lat in ivf_rows:
            f.write(f"| IVF | nlist={nl} | {np_} | {r} | {c} | {lat} |\n")
        for nl, m_sub, ks, np_, r, c, lat in ivfpq_rows:
            f.write(
                f"| IVF-PQ | nlist={nl} m={m_sub} ksub={ks} | {np_} | {r} "
                f"| {c} | {lat} |\n"
            )
        for bits, tables, r, lat in srp_rows:
            f.write(
                f"| SRP | bits={bits} tables={tables} | — | {r} | "
                f"(signature-dependent) | {lat} |\n"
            )
        f.write(
            "\nIVF-PQ + exact rerank (`ivfpq_topk_rerank`): ADC top-N "
            "candidates from the probed cells, exact cosine over ONLY "
            "those N float vectors. recall@10 of the operator == "
            "containment of the true top-10 in the ADC top-N (exact "
            "rerank recovers every contained neighbor):\n\n"
            "| nprobe | rerank N | recall@10 (= containment) | probe s |\n"
            "| --- | --- | --- | --- |\n"
        )
        for nprobe, rerank, r, lat in rerank_rows:
            f.write(f"| {nprobe} | {rerank} | {r} | {lat} |\n")
        best = max(rerank_rows, key=lambda t: t[2])
        f.write(
            "\nReading: on genuinely clustered vectors the coarse "
            "quantizer recovers the true neighborhoods — IVF hits "
            f"recall {ivf_rows[0][2]} reading "
            f"{ivf_rows[0][3] * 100:.1f}% of the corpus. IVF-PQ's "
            "recall is flat across nprobe (cell loss is zero; the "
            "remaining loss is code resolution — within a tight "
            "cluster the true top-10 differ by cosine margins below "
            "what m=16 codes resolve). The standard composition closes "
            "it: `ivfpq_topk_rerank` fetches a wider code top-N from "
            "the probed cells and exact-reranks, reaching "
            f"{best[2]} recall at nprobe={best[0]}/rerank={best[1]} "
            "while reading the corpus as int codes plus N float "
            "vectors per query. Floor-tested in "
            "`test_ivfpq_rerank_recall_clustered` (>= 0.9 at "
            "rerank-100/nprobe=2, and rerank must strictly beat plain "
            "ADC).\n"
        )
    print(f"appended clustered section to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()

"""ANN parameter sweep: recall@10 vs cost for SRP-LSH and IVF at sf1.

Round-4 verdict ask: the point-check recall tests prove the operators
work, but a 100 TB user picking (tables, bits) or (nlist, nprobe) needs
a measured tradeoff table. This script sweeps both index families over
the sf1 embeddings (20k unit vectors, 64-dim, cluster geometry preserved
from the driver's sf0.1 generator) and writes ANN.md.

Metrics per setting, averaged over NQ seeded held-out queries:
- recall@10 against exact brute-force cosine (ground truth computed
  once, driver-side numpy over the collected matrix — an EVALUATION
  harness step, not part of any query plan; the plans under test touch
  only stored signature/cell columns).
- candidate fraction: rows surviving the index filter / corpus size.
  This is the scale-relevant cost: on a signature-bucketed or
  cell-partitioned table the filter is partition pruning, so query cost
  at 100 TB is proportional to this fraction, not to the local-mode
  latency (which is dominated by the fixed ~0.2-0.4 s job cost at this
  absolute size).
- median probe latency on local[32], for completeness.

Protocol: index built + persisted ONCE per setting (the production
shape: signatures/cells are stored columns); per-query timing covers the
probe plan only. Queries are the first NQ vectors of a seeded shuffle;
ground truth excludes nothing (self-hit counts for both sides, so recall
is comparable).

Usage: python scripts/ann_sweep.py [--nq 20] [--out ANN.md]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dwh_with_dask_spark.operators import similarity as S
from dwh_with_dask_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".localdata", "sf1")

K = 10
SRP_GRID = [(bits, tables) for bits in (8, 10, 12) for tables in (4, 8, 16)]
IVF_NLIST = (16, 64, 256)
IVF_NPROBE = (1, 4, 8, 16)


def ground_truth(ids: np.ndarray, mat: np.ndarray, qidx: np.ndarray) -> dict:
    """Exact top-K cosine per query over the full matrix (numpy, eval only)."""
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for qi in qidx:
        sims = mat @ mat[qi]
        # top-K by (-sim, id) to mirror the operators' deterministic tiebreak
        order = np.lexsort((ids, -sims))[:K]
        out[int(ids[qi])] = set(int(ids[i]) for i in order)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(REPO, "ANN.md"))
    args = ap.parse_args()

    spark = get_spark(app_name="ann_sweep")
    emb = spark.read.parquet(os.path.join(SF1_DIR, "embeddings.parquet"))
    rows = emb.select("vec_id", "embedding").collect()  # eval harness only
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    n = len(ids)

    rng = np.random.default_rng(7)
    qidx = rng.permutation(n)[: args.nq]
    truth = ground_truth(ids, mat, qidx)
    queries = [(int(ids[i]), [float(x) for x in mat[i]]) for i in qidx]

    srp_rows = []
    for bits, tables in SRP_GRID:
        idx = S.build_srp_index(emb, bits=bits, tables=tables).persist()
        idx.count()  # materialize the stored signatures once
        recalls, fracs, lats = [], [], []
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
            # candidate fraction = rows surviving the signature filter
            qsigs = S._query_sigs(qvec, bits, tables, 42)
            cond = None
            for t, probes in enumerate(S._probe_lists(qsigs, bits, 1)):
                hit = F.element_at(F.col("srp_sigs"), t + 1).isin(probes)
                cond = hit if cond is None else (cond | hit)
            fracs.append(idx.filter(cond).count() / n)
        idx.unpersist()
        srp_rows.append(
            (
                bits,
                tables,
                round(sum(recalls) / len(recalls), 3),
                round(sum(fracs) / len(fracs), 4),
                round(statistics.median(lats), 3),
            )
        )
        print(f"SRP bits={bits} tables={tables}: {srp_rows[-1][2:]}", flush=True)

    ivf_rows = []
    for nlist in IVF_NLIST:
        indexed, cents = S.build_ivf_index(emb, nlist=nlist)
        indexed = indexed.persist()
        indexed.count()
        for nprobe in IVF_NPROBE:
            if nprobe > nlist:
                continue
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
                    nlist,
                    nprobe,
                    round(sum(recalls) / len(recalls), 3),
                    round(nprobe / nlist, 4),
                    round(statistics.median(lats), 3),
                )
            )
            print(f"IVF nlist={nlist} nprobe={nprobe}: {ivf_rows[-1][2:]}", flush=True)
        indexed.unpersist()

    # PQ: full scan over stored codes — the cost metric is BYTES read
    # per row (m code bytes vs dim*4 float bytes), not candidate rows.
    pq_rows = []
    dim = mat.shape[1]
    for m_sub, ksub in ((8, 256), (16, 64), (16, 256), (32, 64)):
        books = S.pq_train(emb, m=m_sub, ksub=ksub)
        idx = S.build_pq_index(emb, books).persist()
        idx.count()
        recalls, lats = [], []
        for qid, qvec in queries:
            t0 = time.perf_counter()
            got = {
                r.vec_id
                for r in S.pq_topk_indexed(idx, books, qvec, k=K).collect()
            }
            lats.append(time.perf_counter() - t0)
            recalls.append(len(got & truth[qid]) / K)
        idx.unpersist()
        pq_rows.append(
            (
                m_sub,
                ksub,
                round(sum(recalls) / len(recalls), 3),
                round(m_sub * 1.0 / (dim * 4), 4),
                round(statistics.median(lats), 3),
            )
        )
        print(f"PQ m={m_sub} ksub={ksub}: {pq_rows[-1][2:]}", flush=True)

    # IVF-PQ: residual PQ inside coarse cells — candidate fraction from
    # nprobe/nlist AND code-bytes fraction both apply (the probe reads
    # m bytes per row of the probed cells only).
    ivfpq_rows = []
    for nlist, m_sub, ksub in ((64, 16, 64), (64, 32, 64), (256, 16, 64)):
        idxq, cn, bks = S.build_ivfpq_index(emb, nlist=nlist, m=m_sub, ksub=ksub)
        idxq = idxq.persist()
        idxq.count()
        for nprobe in (8, 16):
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
                    nlist,
                    m_sub,
                    ksub,
                    nprobe,
                    round(sum(recalls) / len(recalls), 3),
                    round(nprobe / nlist, 4),
                    round(statistics.median(lats), 3),
                )
            )
            print(
                f"IVFPQ nlist={nlist} m={m_sub} ksub={ksub} nprobe={nprobe}: "
                f"{ivfpq_rows[-1][4:]}",
                flush=True,
            )
        idxq.unpersist()

    with open(args.out, "w") as f:
        f.write(
            "# ANN — recall/cost tradeoff, measured\n\n"
            f"Generated by `scripts/ann_sweep.py` on sf1 embeddings "
            f"({n} unit vectors, 64-dim, {args.nq} seeded queries, "
            "k=10).\n\n"
            "**candidate fraction** is the scale metric: the share of the\n"
            "corpus surviving the stored-signature / stored-cell filter.\n"
            "On a table written bucketed-by-signature or\n"
            "partitioned-by-cell that filter is partition pruning, so at\n"
            "100 TB the query reads (fraction x corpus) — local-mode\n"
            "latency at 20k rows is dominated by the fixed per-job cost\n"
            "and is reported only for completeness.\n\n"
            "## SRP-LSH (`build_srp_index` + `ann_lsh_topk_indexed`, "
            "multiprobe_hamming=1)\n\n"
            "| bits | tables | recall@10 | candidate frac | probe s |\n"
            "| --- | --- | --- | --- | --- |\n"
        )
        for b, t, r, c, lat in srp_rows:
            f.write(f"| {b} | {t} | {r} | {c} | {lat} |\n")
        f.write(
            "\n## IVF (`build_ivf_index` + `ivf_topk_indexed`)\n\n"
            "cells probed / nlist IS the candidate fraction (cells are\n"
            "near-uniform under the k-means assignment).\n\n"
            "| nlist | nprobe | recall@10 | candidate frac | probe s |\n"
            "| --- | --- | --- | --- | --- |\n"
        )
        for nl, np_, r, c, lat in ivf_rows:
            f.write(f"| {nl} | {np_} | {r} | {c} | {lat} |\n")
        f.write(
            "\n## PQ (`pq_train` + `build_pq_index` + `pq_topk_indexed`)\n\n"
            "PQ scans every row but reads only the m-byte code column —\n"
            "**bytes frac** = m / (dim x 4) is its scale metric (the IO\n"
            "share of a float-vector scan). Probe = pure-Column lookup\n"
            "folds, no Python, no float vectors touched.\n\n"
            "| m | ksub | recall@10 | bytes frac | probe s |\n"
            "| --- | --- | --- | --- | --- |\n"
        )
        for m_sub, ks, r, c, lat in pq_rows:
            f.write(f"| {m_sub} | {ks} | {r} | {c} | {lat} |\n")
        f.write(
            "\n## IVF-PQ (`build_ivfpq_index` + `ivfpq_topk_indexed`)\n\n"
            "Residual PQ inside coarse cells: cost = (nprobe/nlist of\n"
            "the rows) x (m code bytes per row) — partition pruning AND\n"
            "compression compose.\n\n"
            "| nlist | m | ksub | nprobe | recall@10 | candidate frac "
            "| probe s |\n"
            "| --- | --- | --- | --- | --- | --- | --- |\n"
        )
        for nl, m_sub, ks, np_, r, c, lat in ivfpq_rows:
            f.write(
                f"| {nl} | {m_sub} | {ks} | {np_} | {r} | {c} | {lat} |\n"
            )
        f.write(
            "\n## Recommendation\n\n"
            "Recall numbers are GEOMETRY-DEPENDENT — this sweep is\n"
            "near-orthogonal synthetic vectors (close to the hardest case\n"
            "for space-partitioning indexes); re-run\n"
            "`scripts/ann_clustered.py` after regenerating this file to\n"
            "re-append the clustered-geometry section (the regime real\n"
            "embedding corpora live in). Cite the section matching your\n"
            "corpus, not a single number.\n\n"
            "- **SRP**: bits=10, tables=16 at multiprobe radius 1 measures\n"
            "  its recall in the table above on THIS geometry (clustered\n"
            "  geometry reads far higher). The committed floor test\n"
            "  (`tests/test_dedup_similarity.py::"
            "test_ann_recommended_recall_floor`)\n"
            "  pins a different, cheaper setting on the sf0.01 fixture:\n"
            "  bits=8, tables=16, radius-2 multiprobe >= 0.9 (radius is\n"
            "  the query-time recall knob — no index rebuild).\n"
            "- **IVF**: nlist ~ sqrt(corpus), nprobe = nlist/8 as the\n"
            "  starting point; scale nprobe up for recall, nlist up for\n"
            "  per-query cost. Floor-tested by geometry in\n"
            "  `test_ivf_recall_floor_by_geometry`.\n"
            "- **PQ**: the compression play, not the recall play, on\n"
            "  near-orthogonal vectors — use as a first-pass\n"
            "  filter and exact-rerank the PQ top-100 when recall\n"
            "  matters (see the measured rows; the committed twin test\n"
            "  pins m=16/ksub=64 >= 0.5 recall on the sf0.01 geometry).\n"
            "- **IVF-PQ**: cell loss x code loss multiply on unclustered\n"
            "  vectors (measured 0.24-0.43); on clustered vectors the\n"
            "  cell loss vanishes and the code resolution binds — the\n"
            "  production shape is IVF-PQ + exact rerank of the code\n"
            "  top-100 (see the clustered section). Probing all cells\n"
            "  isolates the code loss (twin test >= 0.5).\n"
        )
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()

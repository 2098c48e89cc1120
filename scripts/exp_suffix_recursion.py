"""Suffix-array MULTI-SCALE RECURSION stress (VERDICT r12 ask #7).

Round 12 added recursion past ``base * _BLK_CAP`` tokens (an
intermediate block-rank round per factor-of-32 of document length);
round 13 adds the measured evidence: a corpus whose documents are long
enough to actually trigger it. Vocabulary 30k words (R0 = 4), document
lengths 8k-24k tokens → Lfull = 6000 > _XS_CAP, so L caps at 32
(base = 128) and the top-level block count ceil(24000/128) = 188 >
_BLK_CAP = 32 forces ONE intermediate round (descent non-empty: the
pair walk's per-scale cursor fetches run for real). Spans values are
checked hash-equal against the fixed-k8 DuckDB twin (coverage
equivalence — exact VALUES, not just timing), and the run asserts the
descent actually happened.

Corpus: 600 docs (~9.6M token positions), planted 64-token shared
passages in 1 of 20 docs + 1% exact duplicates.

Usage: python scripts/exp_suffix_recursion.py (idle machine; appends a
section to BENCH_SCALE.md).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dwh_with_dask_spark.operators import suffix
from dwh_with_dask_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, ".localdata", "recursedocs", "documents.parquet")

N_DOCS = 600
VOCAB = 30_000

FIXED_K8_SQL = """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(lower(text), ' '), t -> t <> '')
                    AS toks
           FROM read_parquet('{path}/*.parquet')),
p AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS pos FROM t),
w AS (SELECT doc_id, pos,
             substring(md5(array_to_string(toks[pos+1:pos+8], ' ')), 1, 16)
               AS h
      FROM p),
d AS (SELECT h FROM w GROUP BY h HAVING COUNT(*) >= 2),
dw AS (SELECT w.doc_id, w.pos FROM w JOIN d USING (h)),
m AS (SELECT doc_id, pos,
        MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM dw)
SELECT doc_id, COUNT(*) AS n_dup_windows,
       CAST(SUM(GREATEST(0, pos + 8 - GREATEST(pos,
                COALESCE(prev_end, 0)))) AS BIGINT) AS dup_tokens
FROM m GROUP BY doc_id
"""


def gen_corpus(spark) -> None:
    """Deterministic long-doc corpus: md5-driven word choice, lengths
    8k..24k tokens, planted 64-token shared passages, 1% exact dups."""
    if os.path.exists(CORPUS):
        return
    from pyspark.sql import functions as F

    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    dl = (
        (F.xxhash64("doc_id", F.lit("len")) % 16001 + 16001) % 16001 + 8000
    )
    words = F.transform(
        F.sequence(F.lit(0), dl - 1),
        lambda i: F.concat(
            F.lit("w"),
            (
                (F.xxhash64(F.col("doc_id"), i, F.lit("tok")) % VOCAB + VOCAB)
                % VOCAB
            ).cast("string"),
        ),
    )
    passage = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.concat(
            F.lit("p"), (F.col("doc_id") % 5).cast("string"),
            F.lit("_"), i.cast("string"),
        ),
    )
    toks = F.when(
        F.col("doc_id") % 20 == 0,
        F.concat(
            F.slice(words, 1, 500), passage,
            F.slice(words, 565, 100_000),
        ),
    ).otherwise(words)
    docs = base.select("doc_id", F.array_join(toks, " ").alias("text"))
    dups = docs.filter(F.col("doc_id") % 100 == 3).select(
        (F.col("doc_id") + N_DOCS).alias("doc_id"), "text"
    )
    docs.unionByName(dups).coalesce(8).write.mode("overwrite").parquet(CORPUS)


def _gc_hygiene(spark) -> None:
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)


def main() -> None:
    while os.getloadavg()[0] > 1.5:
        print("waiting for idle, loadavg", os.getloadavg(), flush=True)
        time.sleep(20)
    spark = get_spark()
    la0 = os.getloadavg()
    print("loadavg at start", la0)
    gen_corpus(spark)
    docs = spark.read.parquet(CORPUS)

    # prove the recursion actually fires on this corpus shape
    _, tail, R0, B, L, _src = suffix.suffix_ranks(docs)
    assert tail is not None and len(tail.descent) >= 1, (
        "corpus did not trigger the multi-scale recursion: "
        f"tail={tail} R0={R0} L={L}"
    )
    n_rounds = len(tail.descent) + 1
    print(
        f"recursion confirmed: R0={R0} L={L} base={R0 * L} "
        f"unit={tail.unit} nb={tail.nb} descent_rounds={len(tail.descent)}"
    )
    # drop every reference to the probe build's checkpointed frames so
    # the GC pass below actually frees their storage before timing
    del tail, _src
    _gc_hygiene(spark)

    suffix.TIMINGS = []
    t0 = time.perf_counter()
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["dup_tokens"])
        for r in suffix.suffix_duplicate_spans(docs, min_len=8).collect()
    }
    warm = time.perf_counter() - t0
    phases = list(suffix.TIMINGS)
    suffix.TIMINGS = None
    ts = []
    for _ in range(2):
        _gc_hygiene(spark)
        t0 = time.perf_counter()
        suffix.suffix_duplicate_spans(docs, min_len=8).count()
        ts.append(time.perf_counter() - t0)
    spark_med = statistics.median([warm] + ts)

    con = duckdb.connect()
    sql = FIXED_K8_SQL.format(path=CORPUS)
    t0 = time.perf_counter()
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    duck_s = time.perf_counter() - t0

    assert got == want, (
        f"coverage mismatch: {len(got)} vs {len(want)} rows; first diffs "
        f"{[(k, got.get(k), want.get(k)) for k in list(want)[:3]]}"
    )
    print(f"spans rows={len(got)} spark_med={spark_med:.2f}s duck={duck_s:.2f}s")

    with open(os.path.join(REPO, "BENCH_SCALE.md"), "a") as f:
        f.write(
            "\n## Suffix multi-scale RECURSION stress — 8k-24k-token docs "
            "(appended by exp_suffix_recursion)\n\n"
            f"{N_DOCS + N_DOCS // 100} docs x 8k-24k tokens (~9.7M "
            f"positions), vocabulary {VOCAB} (R0=4, L=32, base=128):\n"
            "ceil(24000/128) = 188 top-level blocks > _BLK_CAP = 32, so "
            "the block-rank tail\nRECURSES — one intermediate round "
            f"(total {n_rounds} tail rounds; descent verified\nnon-empty "
            "at run time) — the round-12 code path that previously had "
            "no measured\nleg. Values hash-equal the fixed-k8 DuckDB "
            "twin (coverage equivalence).\n\n"
            "| query | spark s (med of 3) | duckdb s | ratio |\n"
            "| --- | --- | --- | --- |\n"
            f"| suffix spans, recursion corpus | {spark_med:.2f} | "
            f"{duck_s:.2f} | {spark_med / duck_s:.2f}x |\n"
            "\nPhase decomposition (first spans run):\n\n"
            "| phase | seconds |\n| --- | --- |\n"
        )
        for lbl, sec in phases:
            f.write(f"| {lbl} | {sec:.2f} |\n")
        f.write(f"\nloadavg at start {la0}; driver heap "
                f"{spark.conf.get('spark.driver.memory', 'default')}\n")
    print("appended recursion-stress section to BENCH_SCALE.md")
    spark.stop()


if __name__ == "__main__":
    main()

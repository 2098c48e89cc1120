"""Suffix-array TAIL stress (rounds 11-12): on a REALISTIC corpus
shape — large vocabulary (R0 small) and documents far longer than the
packed prefix — the block-rank tail is the COMMON path, not the edge.
This leg builds such a corpus deterministically, runs BOTH
suffix_duplicate_spans and suffix_span_removal end-to-end (tail
active: the wide packed-prefix sort, the atop block-rank assembly and
the broadcast-probe residual fetches), checks spans against the
fixed-k8 DuckDB twin (coverage equivalence — exact VALUES, not just
timing) and removal against the FULL suffix-removal DuckDB oracle
(plans/llm._SUFFIX_REMOVAL_CTES — run/RMQ identities, per-doc md5 of
the cleaned text), and appends the measured rows + the tail's phase
decomposition to BENCH_SCALE.md.

Corpus: 20k docs, length 200..800 tokens, vocabulary 50k words, with a
1% exact-duplicate tail and planted shared passages (so spans is
non-trivial). R0 = floor(63/log2(50001)) = 4; the balanced tail picks
L = ceil(sqrt(ceil(800/4))) = 15 (base = 60, atop = 14 block ranks).

Usage: python scripts/exp_suffix_longdocs.py (idle machine). Runs at
the DEFAULT 8g driver heap: every frame spills gracefully
(MEMORY_AND_DISK) — no OOM at any heap. Memory-sizing rule (measured,
BENCH_SCALE round 12): the pipeline keeps ~0.6 KB of localCheckpoint
storage per corpus token-position live across its four big frames;
size executor storage above that (16g heap here) for fully-resident
runs, or accept the measured spill penalty at 8g. Between runs the
script forces a JVM GC so the ContextCleaner frees the previous
run's checkpoint blocks (otherwise runs degrade as dead storage
accumulates — the blocks are freed on RDD GC, not on query end)."""

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
CORPUS = os.path.join(REPO, ".localdata", "longdocs", "documents.parquet")

N_DOCS = 20_000
VOCAB = 50_000

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
    """Deterministic long-doc corpus: md5-driven word choice, planted
    64-token shared passages in 5% of docs, 1% exact duplicates."""
    if os.path.exists(CORPUS):
        return
    from pyspark.sql import functions as F

    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    dl = (F.xxhash64("doc_id", F.lit("len")) % 601 + 601) % 601 + 200
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
    # planted passage: docs with doc_id % 20 == 0 overwrite tokens
    # [50, 114) with a shared passage keyed by doc_id % 7 (so each
    # passage variant recurs ~143x)
    passage = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.concat(
            F.lit("p"), (F.col("doc_id") % 7).cast("string"),
            F.lit("_"), i.cast("string"),
        ),
    )
    toks = F.when(
        F.col("doc_id") % 20 == 0,
        F.concat(
            F.slice(words, 1, 50), passage,
            F.slice(words, 115, 10_000),
        ),
    ).otherwise(words)
    docs = base.select(
        "doc_id", F.array_join(toks, " ").alias("text")
    )
    # 1% exact duplicates (new ids, same text as doc_id % 100 == 3)
    dups = docs.filter(F.col("doc_id") % 100 == 3).select(
        (F.col("doc_id") + N_DOCS).alias("doc_id"), "text"
    )
    docs.unionByName(dups).coalesce(8).write.mode("overwrite").parquet(CORPUS)


def _gc_hygiene(spark) -> None:
    """Free the previous run's dead checkpoint blocks: drop Python
    refs, force a JVM GC (ContextCleaner unpersists on RDD collect),
    and give the async cleaner a beat."""
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)


def main() -> None:
    # refuse to time on a busy box (BASELINE.md protocol): wait for the
    # 1-minute load to drain below 1.5 before starting
    while os.getloadavg()[0] > 1.5:
        print("waiting for idle, loadavg", os.getloadavg(), flush=True)
        time.sleep(20)
    spark = get_spark()
    la0 = os.getloadavg()
    print("loadavg at start", la0)
    gen_corpus(spark)
    docs = spark.read.parquet(CORPUS)

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

    # ---- removal leg (round 12): exact VALUES against the full
    # suffix-removal oracle, per-doc md5 of the cleaned text ----
    _gc_hygiene(spark)
    from pyspark.sql import functions as F

    from dwh_with_dask_spark.operators.suffix import suffix_span_removal

    suffix.TIMINGS = []
    t0 = time.perf_counter()
    got_rm = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["h"])
        for r in suffix_span_removal(docs, min_len=8)
        .select("doc_id", "n_tokens", "n_removed", F.md5("clean_text").alias("h"))
        .collect()
    }
    warm_rm = time.perf_counter() - t0
    phases_rm = list(suffix.TIMINGS)
    suffix.TIMINGS = None
    ts_rm = []
    for _ in range(2):
        _gc_hygiene(spark)
        t0 = time.perf_counter()
        suffix_span_removal(docs, min_len=8).select(F.md5("clean_text")).count()
        ts_rm.append(time.perf_counter() - t0)
    rm_med = statistics.median([warm_rm] + ts_rm)

    from dwh_with_dask_spark.plans.llm import _SUFFIX_REMOVAL_CTES

    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{CORPUS}/*.parquet')"
    )
    t0 = time.perf_counter()
    want_rm = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"WITH {_SUFFIX_REMOVAL_CTES} "
            "SELECT doc_id, n_tokens, n_removed, md5(clean_text) FROM clean"
        ).fetchall()
    }
    rm_duck_s = time.perf_counter() - t0
    assert got_rm == want_rm, (
        f"removal mismatch: {len(got_rm)} vs {len(want_rm)} rows; diffs "
        f"{[(k, got_rm.get(k), want_rm.get(k)) for k in list(want_rm) if got_rm.get(k) != want_rm.get(k)][:3]}"
    )
    print(
        f"removal rows={len(got_rm)} spark_med={rm_med:.2f}s "
        f"duck={rm_duck_s:.2f}s"
    )

    with open(os.path.join(REPO, "BENCH_SCALE.md"), "a") as f:
        f.write(
            "\n## Suffix block-rank tail stress — long docs, large vocab "
            "(appended by exp_suffix_longdocs)\n\n"
            f"{N_DOCS + N_DOCS // 100} docs x 200-800 tokens, vocabulary "
            f"{VOCAB} (R0=4, balanced L=15, base=60 ->\nthe block-rank "
            "tail is the COMMON path: every doc beyond 60 tokens\ntakes "
            "it), planted 64-token shared passages + 1% exact "
            "duplicates.\nValues hash-equal the fixed-k8 DuckDB twin "
            "(coverage equivalence) —\nthis row exercises the wide "
            "packed-prefix sort, the atop assembly AND the\n"
            "broadcast-probe residual at realistic vocabulary, which the "
            "small-vocab\nsf corpora cannot.\n\n"
            "| query | spark s (med of 3) | duckdb s | ratio |\n"
            "| --- | --- | --- | --- |\n"
            f"| suffix spans, long-doc corpus | {spark_med:.2f} | "
            f"{duck_s:.2f} | {spark_med / duck_s:.2f}x |\n"
            f"| suffix removal, long-doc corpus | {rm_med:.2f} | "
            f"{rm_duck_s:.2f} | {rm_med / rm_duck_s:.2f}x |\n"
            "\n(removal oracle: the FULL run/RMQ suffix-removal twin, "
            "per-doc md5 of clean_text\nhash-equal — not the fixed-k "
            "approximation.)\n"
            "\nPhase decomposition (first spans run):\n\n"
            "| phase | seconds |\n"
            "| --- | --- |\n"
        )
        for lbl, sec in phases:
            f.write(f"| {lbl} | {sec:.2f} |\n")
        f.write(
            "\nPhase decomposition (first removal run — shares _sa_pairs; "
            "the extra cost is the\nrun segmentation, per-run windows and "
            "reassembly):\n\n| phase | seconds |\n| --- | --- |\n"
        )
        for lbl, sec in phases_rm:
            f.write(f"| {lbl} | {sec:.2f} |\n")
        f.write(f"\nloadavg at start {la0}; driver heap "
            f"{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '8g')}\n")
    print("appended tail-stress section to BENCH_SCALE.md")


if __name__ == "__main__":
    main()

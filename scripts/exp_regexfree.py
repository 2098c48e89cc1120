"""Round-6 experiment part 3: regex-free text kernels via translate().

Java regex is the residual floor of the token family. Candidates
(all semantics-identical on ASCII \\s/\\w, verified in tests):

  tokens:  filter(split(translate(lower(x), '\\t\\n\\x0b\\x0c\\r', '     '), ' '), <> '')
  punct:   length(translate(x, [A-Za-z0-9_ + ws], ''))  vs  regexp_replace
  norm:    array_join(tokens, ' ') == normalize_text(x)  (for sha256 dedup)

MEASURED (2026-08-14, idle host) — NEGATIVE result, NOT adopted:

    token/norm/punct mismatches on the sf1 corpus: 0 (semantics equal)
    toksize_regex      0.373 s    toksize_translate   0.358 s
    explode_regex      0.327 s    explode_translate   0.312 s
    punct_regex        0.247 s    punct_translate     0.250 s
    sha_norm_regex     0.227 s    sha_norm_translate  0.261 s

Java regex with these simple patterns is NOT the bottleneck — the
translate() char-map forms are within noise (and the sha-norm one
loses: concat_ws re-materializes the token array). Keeping the regex
kernels; the win was eliminating a PASS, not the regex itself.
"""

from __future__ import annotations

import os
import statistics
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import jvm_gc, materialize
from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.operators.dedup import normalize_text, text_tokens
from dwh_with_dask_spark.operators.partitioning import widen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".localdata", "sf1")

WS = "\t\n\x0b\x0c\r"
WORD_WS = string.ascii_letters + string.digits + "_ " + WS


def tokens_tr(c):
    return F.filter(
        F.split(F.translate(F.lower(F.col(c)), WS, "     "), " ", -1),
        lambda t: t != F.lit(""),
    )


def timed(spark, name, build, runs=3):
    materialize(build())
    jvm_gc(spark)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(build())
        ts.append(time.perf_counter() - t0)
        jvm_gc(spark)
    print(f"{name:28s} {statistics.median(ts):6.3f}s", flush=True)


def main():
    from dwh_with_dask_spark.session import get_spark

    spark = get_spark()
    d = widen(load_table(spark, SF1, "documents").select("doc_id", "text"), "doc_id")

    # equivalence spot-check on the real corpus
    bad = d.select(
        (F.concat_ws(" ", text_tokens("text")) != F.concat_ws(" ", tokens_tr("text"))).alias("x")
    ).filter("x").count()
    print("token mismatch rows:", bad)
    bad2 = d.select(
        (normalize_text("text") != F.array_join(tokens_tr("text"), " ")).alias("x")
    ).filter("x").count()
    print("norm mismatch rows:", bad2)

    timed(spark, "toksize_regex", lambda: d.select(F.size(text_tokens("text")).alias("n")).agg(F.sum("n")))
    timed(spark, "toksize_translate", lambda: d.select(F.size(tokens_tr("text")).alias("n")).agg(F.sum("n")))
    timed(spark, "explode_regex", lambda: d.select(F.explode(text_tokens("text")).alias("t")).agg(F.count("*")))
    timed(spark, "explode_translate", lambda: d.select(F.explode(tokens_tr("text")).alias("t")).agg(F.count("*")))

    n = F.length(F.col("text"))
    punct_re = n - F.length(F.regexp_replace(F.col("text"), r"[^\w\s]", ""))
    punct_tr = F.length(F.translate(F.col("text"), WORD_WS, ""))
    bad3 = d.select((punct_re != punct_tr).alias("x")).filter("x").count()
    print("punct mismatch rows:", bad3)
    timed(spark, "punct_regex", lambda: d.select(punct_re.alias("p")).agg(F.sum("p")))
    timed(spark, "punct_translate", lambda: d.select(punct_tr.alias("p")).agg(F.sum("p")))

    timed(spark, "sha_norm_regex", lambda: d.select(F.sha2(normalize_text("text"), 256).alias("h")).agg(F.count("h")))
    timed(spark, "sha_norm_translate", lambda: d.select(F.sha2(F.concat_ws(" ", tokens_tr("text")), 256).alias("h")).agg(F.count("h")))
    print("loadavg", open("/proc/loadavg").read().split()[0])


if __name__ == "__main__":
    main()

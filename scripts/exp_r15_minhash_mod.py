"""Round-15 A/B: pmod vs %, and the banded-join shape, in MinHash-LSH.

1. ``_minhash_cols`` computes 64 ``pmod(a + (i+1)*b, 2^32)`` per shingle
   row. Both operands are provably non-negative (conv of 8 hex chars is
   0..2^32-1; a + 65*b < 2^38), so ``pmod`` (two modulos + add) can be a
   plain ``%`` (one modulo) — or a bitwise AND with 2^32-1, since the
   modulus is a power of two. Values are bit-identical for non-negative
   inputs; asserted below.

2. Timing decomposition: signature build alone vs full LSH query, so
   the candidate/verify stages are attributed correctly.

Usage: python scripts/exp_r15_minhash_mod.py [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import dwh_with_dask_spark.operators.dedup as D
from dwh_with_dask_spark.catalog import load_table
from dwh_with_dask_spark.session import get_spark


def minhash_cols_mod(num_hashes: int):
    digest = F.md5(F.concat(F.col("shingle"), F.lit("|mh")))
    a = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    return [(a + F.lit(i + 1) * b) % F.lit(2 ** 32) for i in range(num_hashes)]


def minhash_cols_and(num_hashes: int):
    digest = F.md5(F.concat(F.col("shingle"), F.lit("|mh")))
    a = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    return [
        (a + F.lit(i + 1) * b).bitwiseAND(F.lit(2 ** 32 - 1))
        for i in range(num_hashes)
    ]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def release(df):
    if hasattr(df, "cache_scope"):
        df.cache_scope.release()


def time_it(make, runs, spark, label):
    df = make()
    noop(df)
    release(df)
    spark.sparkContext._jvm.System.gc()
    xs = []
    for _ in range(runs):
        df = make()
        t0 = time.perf_counter()
        noop(df)
        xs.append(time.perf_counter() - t0)
        release(df)
    print(
        f"{label}: median={statistics.median(xs):.3f}s "
        f"min={min(xs):.3f} max={max(xs):.3f}",
        flush=True,
    )
    spark.sparkContext._jvm.System.gc()


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp_r15_minhash")
    docs = load_table(spark, sf_dir, "documents")

    orig = D._minhash_cols

    def set_family(cols_fn):
        def patched(num_hashes, hash_family):
            if hash_family == "md5":
                return cols_fn(num_hashes)
            return orig(num_hashes, hash_family)

        D._minhash_cols = patched

    # Equivalence: signatures bit-identical across the three forms.
    D._minhash_cols = orig
    base = (
        D.minhash_signatures(docs, num_hashes=64, hash_family="md5")
        .orderBy("id")
        .collect()
    )
    for name, fn in (("mod", minhash_cols_mod), ("and", minhash_cols_and)):
        set_family(fn)
        got = (
            D.minhash_signatures(docs, num_hashes=64, hash_family="md5")
            .orderBy("id")
            .collect()
        )
        assert got == base, f"{name} signatures differ"
    print(f"equivalence OK over {len(base)} signatures", flush=True)

    for name, fn in (
        ("pmod(current)", None),
        ("percent-mod", minhash_cols_mod),
        ("bitand", minhash_cols_and),
    ):
        if fn is None:
            D._minhash_cols = orig
        else:
            set_family(fn)
        time_it(
            lambda: D.minhash_signatures(docs, num_hashes=64, hash_family="md5"),
            runs,
            spark,
            f"sig_build[{name}]",
        )
        time_it(
            lambda: D.minhash_lsh_pairs(
                docs, n=3, num_hashes=64, bands=16, threshold=0.30,
                hash_family="md5",
            ),
            runs,
            spark,
            f"full_lsh[{name}]",
        )
    spark.stop()


if __name__ == "__main__":
    main()

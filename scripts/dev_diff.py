"""Dev loop: run every oracle-backed query vs DuckDB, report ALL diffs.

Usage: python scripts/dev_diff.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from dwh_with_dask_spark.session import get_spark
from tests.conftest import make_duck
from tests.test_driver_contract import canon


def coarse_arrow_type(t) -> str:
    """Collapse an Arrow type to the class the driver's value-hash is
    sensitive to. int64 vs decimal128 (the DuckDB HUGEINT trap) differ;
    string vs large_string do not."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{coarse_arrow_type(t.value_type)}>"
    return str(t)


def arrow_type_diffs(spark_df, duck_rel) -> list[str]:
    """Compare per-column coarse Arrow types between Spark and DuckDB."""
    s_schema = spark_df.toArrow().schema
    d_schema = duck_rel.arrow().schema
    s = {f.name: coarse_arrow_type(f.type) for f in s_schema}
    d = {f.name: coarse_arrow_type(f.type) for f in d_schema}
    return [
        f"{c}: spark={s[c]} duck={d[c]}"
        for c in sorted(set(s) & set(d))
        if s[c] != d[c]
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    # Local-fixture queries (q2/q11/q20) join in whenever the target dir
    # carries partsupp.parquet (gen_scale_data.py --fixture-partsupp).
    import os as _os

    if _os.path.exists(f"{sf_dir}/partsupp.parquet"):
        from dwh_with_dask_spark.plans.tpch_extra import (
            LOCAL_ORACLES,
            LOCAL_QUERIES,
        )

        queries = {**queries, **LOCAL_QUERIES}
        oracles = {**oracles, **LOCAL_ORACLES}

    spark = get_spark(app_name="dev_diff", master="local[8]", shuffle_partitions=8)
    duck = make_duck(sf_dir)

    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception:
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            print(f"ok   {name} (rows-only): {len(spark_rows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = duck.sql(oracles[name])
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception:
            failures.append(name)
            print(f"FAIL {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            continue
        msgs = []
        if sorted(spark_cols) != sorted(duck_cols):
            msgs.append(f"cols spark={spark_cols} duck={duck_cols}")
        elif len(spark_rows) != len(duck_rows):
            msgs.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        else:
            tdiffs = arrow_type_diffs(df, duck.sql(oracles[name]))
            if tdiffs:
                msgs.append(f"arrow types differ: {'; '.join(tdiffs)}")
            a = canon(spark_rows, spark_cols)
            b = canon(duck_rows, duck_cols)
            bad = [(x, y) for x, y in zip(a, b) if x != y]
            if bad:
                msgs.append(
                    f"{len(bad)}/{len(a)} rows differ; first:\n"
                    f"      spark={bad[0][0]}\n      duck ={bad[0][1]}"
                )
        if msgs:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(msgs)}")
        else:
            print(f"ok   {name}: {len(spark_rows)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

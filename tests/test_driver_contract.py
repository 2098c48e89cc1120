"""Differential test: every oracle-backed query must EXACTLY match DuckDB.

This mirrors the driver's CORRECTNESS gate (row count + column names +
order-insensitive values) but stricter: we require exact Python-object
equality after canonical sorting, so any driver-side hash will match.

Runs at sf0.01 by default (the driver's correctness scale); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a faster dev loop.
"""

from __future__ import annotations

import datetime
import math

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def canon(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, then rows by value — the driver's comparison
    shape. NaNs normalized so equality is well-defined."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_CORRECT)
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    rel = duck.sql(ORACLES[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = canon(spark_rows, spark_cols)
    b = canon(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(a)} rows differ; first: "
        f"spark={mismatches[0][0]} duck={mismatches[0][1]}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    """Non-oracle queries must at least run and return a stable schema."""
    df = QUERIES[name](spark, SF_CORRECT)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0

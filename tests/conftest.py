"""Shared fixtures: one SparkSession per test session, DuckDB oracle."""

from __future__ import annotations

import os

import duckdb
import pytest

from dwh_with_dask_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the same parquet tables as views —
    mirrors the driver's oracle setup. partsupp registers only when the
    dir carries it (local fixtures from gen_scale_data.py; the driver
    testdata has none)."""
    import os

    con = duckdb.connect()
    extra = ("partsupp",) if os.path.exists(f"{sf_dir}/partsupp.parquet") else ()
    for t in TABLES + extra:
        if not os.path.exists(f"{sf_dir}/{t}.parquet"):
            continue  # partial local dirs (e.g. sf10 skips embeddings)
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = make_duck(SF_CORRECT)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_smoke():
    con = make_duck(SF_SMOKE)
    yield con
    con.close()

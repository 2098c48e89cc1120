"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator suite from
SURVEY.md §2 (implemented in dwh_with_dask_spark.plans) for the driver's
DuckDB differential check at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dwh_with_dask_spark.plans import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query.

    Sketch-based operators on engine-specific randomness (SRP-ANN's
    gaussian projections, the HLL approx-distinct) have no cross-engine
    oracle — the driver records the weaker rows-only check; their
    correctness is property-tested against exact counterparts in
    tests/. MinHash-LSH and SimHash ride md5-derived hash families
    (round 13) and are full hash-match rows here.
    """
    return dict(ORACLES)

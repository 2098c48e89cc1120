"""JDBC sink/source integration against embedded Derby (SURVEY.md §2A
#26-28).

No MySQL exists in this container, but Spark ships Derby jars (used for
the Hive metastore), and Spark's JDBC connector has a DerbyDialect — so
the reference's write-replace / ORM-append / DDL-passthrough semantics
(project-dask.py:101, detail_notes.py:92-97, financial_statement.sql)
are exercised for real over an embedded database.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_with_dask_spark.sources.jdbc import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/testdb;create=true"


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "ID long, item string, value double")


def test_write_replace_roundtrip(spark, derby_url):
    """if_exists='replace' semantics (§2A #26): second overwrite replaces
    the first table's contents, and reads come back value-exact."""
    write_jdbc(
        _mkdf(spark, [(1, "a", 1.5), (2, "b", 2.5)]),
        derby_url,
        "laporan",
        mode="overwrite",
        driver=DRIVER,
    )
    write_jdbc(
        _mkdf(spark, [(3, "c", 3.5)]),
        derby_url,
        "laporan",
        mode="overwrite",
        truncate=False,  # Derby: full drop/create replace
        driver=DRIVER,
    )
    got = read_jdbc(spark, derby_url, "laporan", driver=DRIVER)
    assert [tuple(r) for r in got.orderBy("ID").collect()] == [(3, "c", 3.5)]


def test_write_append(spark, derby_url):
    """ORM-append semantics (§2A #27): appends accumulate rows."""
    write_jdbc(
        _mkdf(spark, [(1, "a", 1.0)]), derby_url, "notes", mode="overwrite",
        truncate=False, driver=DRIVER,
    )
    write_jdbc(
        _mkdf(spark, [(2, "b", 2.0)]), derby_url, "notes", mode="append",
        driver=DRIVER,
    )
    got = read_jdbc(spark, derby_url, "notes", driver=DRIVER)
    assert got.count() == 2
    assert [r["ID"] for r in got.orderBy("ID").collect()] == [1, 2]


def test_ddl_passthrough_decimal_types(spark, derby_url):
    """DDL passthrough (§2A #28): createTableColumnTypes carries the
    reference's DECIMAL(20,2) schema (financial_statement.sql:8-9) into
    the created table — verified by reading the column type back."""
    write_jdbc(
        _mkdf(spark, [(1, "Pendapatan bersih", 1234.56)]),
        derby_url,
        "fin",
        mode="overwrite",
        truncate=False,
        create_table_column_types="item VARCHAR(255), value DECIMAL(20,2)",
        driver=DRIVER,
    )
    got = read_jdbc(spark, derby_url, "fin", driver=DRIVER)
    vtype = dict(got.dtypes)["value"]
    assert vtype == "decimal(20,2)", vtype
    row = got.first()
    assert float(row["value"]) == 1234.56


def test_partitioned_read(spark, derby_url):
    """Partitioned range read: numPartitions parallel scans union to the
    full table."""
    write_jdbc(
        _mkdf(spark, [(i, f"r{i}", float(i)) for i in range(1, 101)]),
        derby_url,
        "big",
        mode="overwrite",
        truncate=False,
        driver=DRIVER,
    )
    got = read_jdbc(
        spark,
        derby_url,
        "big",
        partition_column="ID",
        lower_bound=1,
        upper_bound=101,
        num_partitions=4,
        driver=DRIVER,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.agg(F.sum("ID")).first()[0] == 5050

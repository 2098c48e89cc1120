"""JDBC source/sink (SURVEY.md §2A #26-28).

The reference's MySQL path is collect-to-pandas + a single to_sql over
one connection (project-dask.py:101). The Spark-native replacement is
partitioned JDBC on both directions:

- read: ``partitionColumn/lowerBound/upperBound/numPartitions`` splits
  the source table into parallel range scans.
- write: each partition opens its own connection and batches inserts
  (``batchsize``); ``mode('overwrite')`` + ``truncate`` reproduces the
  reference's if_exists='replace' without dropping indexes.

No MySQL server exists in this container; the wrappers are integration-
tested against embedded Derby (shipped with Spark) in tests/test_jdbc.py
— replace/append modes, createTableColumnTypes DDL passthrough, and
partitioned range reads all execute against a real database. The
distributed execution is Spark's own JDBC connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    truncate: bool = True,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    create_table_column_types: str | None = None,
    **options,
) -> None:
    """Distributed JDBC write (replaces compute().to_sql, §2A #25-26).

    ``create_table_column_types`` carries the reference's DDL intent
    (e.g. 'CurrentYearInstant DECIMAL(20,2), ...' per
    financial_statement.sql:8-9) into the auto-created table.
    """
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", str(truncate).lower())
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()

"""Test-table catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scans go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown, column pruning and (on partitioned layouts) partition pruning
for free. At 100 TB these would be directory-partitioned / bucketed
tables registered in a metastore; the loader API is the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

# Dimension tables small enough to broadcast at any scale factor the
# schema implies (region=5, nation=25 rows always; supplier/part grow
# slowly). Joins against these should never shuffle the fact side.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Optional tables: present only in locally generated dirs (partsupp via
# scripts/gen_scale_data.py — the driver testdata has no partsupp, so
# queries over it live outside the driver registry).
OPTIONAL_TABLES = ("partsupp",)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES and name not in OPTIONAL_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
        # version this arrives two ways, so dispatch on the read type:
        # - Spark versions without native nanos support reject the column
        #   unless spark.sql.legacy.parquet.nanosAsLong=true, which yields
        #   a LONG of epoch-nanos → convert exactly with integral division
        #   (double math would lose precision on 2^60-ns values);
        # - newer Sparks read it natively as TIMESTAMP_NTZ truncated to
        #   micros (same floor semantics as the division) and ignore the
        #   legacy conf → use the column as-is.
        # Both paths land on identical TIMESTAMP_NTZ micros values
        # (parquet isAdjustedToUTC=false → NTZ inference).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf removed: native nanos read is available
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

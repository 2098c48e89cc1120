"""Sinks: distributed writers (SURVEY.md §2A #26-28 Spark mappings).

The reference always collects to the driver before writing
(compute().to_sql). Every sink here writes from the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Parquet sink. ``partition_by`` produces hive-style directory
    partitioning — the thing that makes downstream partition pruning work
    at 100 TB (pick low-cardinality columns: date, source, lang)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: later equi-joins/aggs on ``bucket_by``
    read co-located buckets and skip the shuffle entirely."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def export_shuffled_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Deterministic pseudorandom shuffle into exactly ``n_shards``
    hive-partitioned shards — the training-data export shape: shard
    membership AND within-shard order depend only on (id, seed), never
    on input partitioning, cluster size, or execution order, so a rerun
    (or a different cluster) reproduces byte-identical shards.

    shard = pmod(xxhash64(id, seed), n_shards); rows are repartitioned
    on the shard column, sorted by the same hash within partitions
    (files inherit the sort), and written with partitionBy(shard).
    Re-seeding gives an independent permutation — epochs without
    rereading in a new order. Shards are balanced in expectation
    (multinomial over a 64-bit hash).
    """
    from pyspark.sql import functions as F

    key = F.xxhash64(F.col(id_col), F.lit(seed))
    (
        df.withColumn("shard", F.pmod(key, F.lit(n_shards)).cast("int"))
        .withColumn("__shuffle_key", key)
        .repartition("shard")
        .sortWithinPartitions("shard", "__shuffle_key", id_col)
        .drop("__shuffle_key")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )

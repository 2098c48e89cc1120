"""Surrogate-ID operators.

The reference assigns contiguous 1-based IDs in concatenation order
(project-dask.py:46-48, dask-with-dataframe.py:84-87,
dask-with-dataframe-[2].py:202). That is trivial single-machine but a
scale hazard: a gap-free global sequence forces a total order. This
module offers both semantics and documents the cost so callers choose
deliberately:

- ``sequential_id``  — exact reference semantics (contiguous from 1 in a
  caller-specified order). Implemented with zipWithIndex-style two-pass
  partition offsets, NOT a single-partition window: each partition is
  counted, offsets are prefix-summed on the driver (tiny), and IDs are
  assigned partition-locally. Scales to any size as long as the input
  partitioning realizes the desired order (sort first if needed).
- ``fast_id``        — monotonically_increasing_id: unique, ordered per
  partition, NON-contiguous. Zero coordination; the 100 TB default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fast_id(df: DataFrame, name: str = "ID") -> DataFrame:
    """Unique non-contiguous 64-bit IDs, no shuffle, no coordination."""
    return df.withColumn(name, F.monotonically_increasing_id())


def sequential_id(
    df: DataFrame,
    order_by: list[Column | str] | None = None,
    name: str = "ID",
    start: int = 1,
) -> DataFrame:
    """Gap-free IDs ``start, start+1, ...`` in ``order_by`` order.

    When ``order_by`` is given the input is range-partition sorted on it
    first (one shuffle), so the global sequence follows that order across
    partitions. Assignment itself is shuffle-free: per-partition counts →
    driver prefix-sum → partition-local row numbers + offset. This is the
    distributed equivalent of the reference's ``range(1, len+1)`` without
    collapsing to one partition.
    """
    if order_by:
        df = df.orderBy(*order_by)

    schema = df.schema
    sc = df.sparkSession

    def assign(idx: int, it):
        offset = offsets_bc.value[idx]
        for i, row in enumerate(it):
            yield (*row, start + offset + i)

    rdd = df.rdd
    counts = rdd.mapPartitionsWithIndex(
        lambda idx, it: [(idx, sum(1 for _ in it))]
    ).collectAsMap()
    offsets: dict[int, int] = {}
    running = 0
    for idx in range(rdd.getNumPartitions()):
        offsets[idx] = running
        running += counts.get(idx, 0)
    offsets_bc = sc.sparkContext.broadcast(offsets)

    out_schema = schema.add(name, "long", nullable=False)
    return sc.createDataFrame(rdd.mapPartitionsWithIndex(assign), out_schema)


def sequential_id_window(
    df: DataFrame,
    order_by: list[Column | str],
    name: str = "ID",
    start: int = 1,
) -> DataFrame:
    """Gap-free IDs via a global row_number window.

    Single-partition shuffle — correct and simple, O(n) through one task.
    Fine for dimension-sized data (the reference's ~500 rows); use
    ``sequential_id`` for fact-sized data.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(name, (F.row_number().over(w) + F.lit(start - 1)).cast("long"))

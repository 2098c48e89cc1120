"""Numeric scalar functions + deterministic aggregation helpers.

``to_numeric_coerce`` / ``parse_number`` re-express the reference's
numeric coercion (pd.to_numeric(errors='coerce').fillna(0) at
dask-with-dataframe.py:52-53; float(v.replace(',','')) at
dask-with-dataframe-[2].py:90).

``dsum`` / ``davg`` are this engine's deterministic-aggregate idiom:
floating-point SUM is order-dependent, and a distributed engine does not
guarantee accumulation order — so two runs (or Spark vs. another engine)
can differ in the last bits. Casting each term to a fixed-scale DECIMAL
before summing makes the aggregate exact and order-independent (decimal
addition is associative), then one cast back to double restores the
convenient type. Per-row double arithmetic is IEEE-deterministic, so the
decimal inputs are identical across engines too. This is what makes the
DuckDB-oracle value hashes match bit-for-bit, and at 100 TB it makes
re-runs reproducible regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_numeric_coerce(col: Column | str, default: float = 0.0) -> Column:
    """Cast to double; unparseable/null → ``default``.

    Spark's cast yields null on failure, which is exactly
    ``errors='coerce'``; coalesce supplies the fillna(0).
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast (not cast): under ANSI mode a malformed string would throw;
    # try_cast yields null = pandas errors='coerce'.
    return F.coalesce(c.try_cast("double"), F.lit(default))


def parse_number(col: Column | str, default: float | None = None) -> Column:
    """Parse a string number with thousands separators ('1,234.56')."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, ",", "").try_cast("double")
    if default is not None:
        out = F.coalesce(out, F.lit(default))
    return out


def dsum(col: Column | str, scale: int = 2, precision: int = 23) -> Column:
    """Order-independent (exact) sum of a double column, as double.

    ``scale`` should be >= the true decimal scale of the data (money = 2,
    price*(1-disc) products = 4, etc.).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6, precision: int = 23) -> Column:
    """Order-independent average: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(c).cast("double")
    )


def exact_group_sums(
    df,
    keys: list[str],
    measures: dict[str, tuple[Column, int]],
    plain_sums: dict[str, Column] | None = None,
    count_alias: str = "n",
):
    """Order-independent exact sums with a long-integer hot path.

    Same result as ``dsum`` per measure (exact decimal total, returned as
    double) but ~2x faster on wide scans: the per-row work is
    ``round(x * 10^scale)`` + a codegen long add, and decimal arithmetic
    only touches the tiny per-partition partial table.

    Physical shape: stamp ``spark_partition_id``, partial-aggregate by
    (keys, pid) — map-side only, pid is constant within a partition —
    summing scaled longs; then finalize by keys, summing the partials as
    DECIMAL(38,0) (exact, unbounded rows) and dividing the scale back
    out in decimal before one cast to double. Rows that ever see decimal
    math: #groups x #partitions, not the data.

    Correctness bounds (documented, caller-owned):
    - measures must have true decimal scale <= ``scale`` (same contract
      as ``dsum``): then ``x * 10^scale`` is integral up to float error
      and rounds identically to a decimal cast.
    - per-partition long partial must not overflow: requires
      rows_per_partition * max|x| * 10^scale < 9.2e18. Money at scale 6
      and ~1e5 magnitude gives ~9e7 rows of headroom per partition —
      an order of magnitude above a 128 MB parquet split. Keep
      ``spark.sql.files.maxPartitionBytes`` at defaults and this holds
      at any total data size; the FINAL sum is decimal and never
      overflows.

    ``plain_sums`` are summed as-is in both levels (use for columns that
    are exact in double, e.g. integer-valued quantities).
    ``count_alias`` receives COUNT(*).
    """
    plain_sums = plain_sums or {}
    partial_aggs = [F.count(F.lit(1)).alias("__n")]
    for alias, (col, scale) in measures.items():
        # rint, not round: Spark's round() on doubles converts through
        # BigDecimal PER ROW (an allocation on the hot path — profiled
        # ~40% of q1's agg time); rint is a single FP instruction in
        # codegen. Identical result here: the product is within float
        # error of an integer (scale contract above), so half-even vs
        # half-up never sees a midpoint.
        partial_aggs.append(
            F.sum(F.rint(col * (10**scale)).cast("long")).alias(f"__L_{alias}")
        )
    for alias, col in plain_sums.items():
        partial_aggs.append(F.sum(col).alias(f"__P_{alias}"))

    partial = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy(*keys, "__pid")
        .agg(*partial_aggs)
    )

    final_aggs = [F.sum("__n").alias(count_alias)]
    for alias, (col, scale) in measures.items():
        final_aggs.append(
            (
                F.sum(F.col(f"__L_{alias}").cast("decimal(38,0)"))
                / F.lit(10**scale)
            )
            .cast("double")
            .alias(alias)
        )
    for alias in plain_sums:
        final_aggs.append(F.sum(F.col(f"__P_{alias}")).alias(alias))
    return partial.groupBy(*keys).agg(*final_aggs)

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

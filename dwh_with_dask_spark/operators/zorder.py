"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

North-star addition (ABSENT-IN-REFERENCE, SURVEY.md §2B): the
reference's sink is a flat MySQL table (`project-dask.py:94`); a
warehouse fact table at 100 TB lives in Parquet and survives on
min/max-stat file skipping. Sorting by ONE column gives perfect skipping
on that column and none on any other; interleaving the bits of several
columns (the public Z-order technique used by Delta/Iceberg OPTIMIZE)
gives bounded min/max ranges on EVERY interleaved column in every file,
so point/range filters on any of them prune most files.

``zvalue`` is pure integer Column arithmetic — shifts, masks, adds —
fully inside whole-stage codegen; ``write_zordered`` is one range
shuffle + a per-file sort, the same cost as any global sort-write.

Input contract: each dimension must already be a non-negative integer
fitting ``bits`` bits. Map real columns with the usual tricks —
``datediff`` from an epoch for dates, ``& (2^bits - 1)`` for ids (masks
keep low-bit locality), or a precomputed quantile bin for skewed
continuous values. The mask is the caller's choice because it is part of
the table's clustering contract, not something to infer silently.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` dimensions × ``bits`` bits:
    bit ``b`` of dimension ``i`` lands at position ``b*ncols + i``.

    Emitted as a flat sum of ``bits × ncols`` shift/mask terms — integer
    ops the JVM codegens into straight-line arithmetic (no UDF, no
    loop). 2 × 16 bits (the default fact-table shape) is 32 terms and a
    32-bit z-value; up to 4 × 16 stays inside a BIGINT.
    """
    ncols = len(cols)
    if ncols < 2:
        raise ValueError("z-ordering needs at least 2 dimensions")
    if bits * ncols > 63:
        raise ValueError("bits * ncols must fit a signed 64-bit z-value")
    masked = [c.cast("long").bitwiseAND(F.lit((1 << bits) - 1)) for c in cols]
    terms = [
        F.shiftleft(
            F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ncols + i
        )
        for i, c in enumerate(masked)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a + t, terms).cast("long")


def scale_to_bits(
    col: Column, lo: int | float, hi: int | float, bits: int = 16
) -> Column:
    """Linear map of ``col`` from [lo, hi] into [0, 2^bits) — the
    normalization step before interleaving dimensions of unequal range.

    Interleaving RAW values with very different magnitudes degrades to a
    single-column sort: if one dimension needs 12 bits and the other 8,
    every high-order z-bit belongs to the wide dimension, so the first
    file-split boundaries cut only on it (measured in
    tests/test_scd_zorder.py). Equalizing effective bit width makes the
    curve alternate dimensions at every level, which is what yields
    bounded min/max ranges on all of them. ``lo``/``hi`` come from the
    table's own domain (a metadata-sized min/max aggregate, or fixed
    domain knowledge — days-since-epoch bounds, id ranges); values
    outside clamp to the edges, so stale bounds degrade clustering, not
    correctness.
    """
    span = float(hi - lo)
    if span <= 0:
        raise ValueError("hi must exceed lo")
    top = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(top))
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(top), scaled))


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[Column],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as Parquet clustered on the Z-curve of ``dims``.

    ``repartitionByRange`` on the z-value puts contiguous curve segments
    in each output file (range exchange with sampled bounds — the
    standard distributed sort shuffle), and the within-partition sort
    tightens row-group stats too. Readers then prune on ANY of the
    interleaved dimensions via ordinary Parquet min/max skipping — no
    special reader support needed.
    """
    z = zvalue(dims, bits).alias("__z")
    d = df.withColumn("__z", z)
    d = (
        d.repartitionByRange(n_files, F.col("__z"))
        if n_files
        else d.repartitionByRange(F.col("__z"))
    )
    d.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(
        path
    )

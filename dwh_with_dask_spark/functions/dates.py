"""Date / quarter scalar functions.

Re-expresses the reference's Indonesian-date → quarter-label logic
(``determine_quarter`` at dask-with-dataframe-[2].py:37-68) as Column
expressions. We implement the *intended* semantics: the reference has two
shipped bugs here — a NameError when the regex misses (line 57) and an
invalid date regex in the multi-date variant (line 109) that makes the
whole PDF branch silently return empty — which we deliberately do NOT
reproduce (divergence recorded in tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Indonesian month names → month number (dask-with-dataframe-[2].py:41-49).
INDO_MONTHS = {
    "Januari": 1,
    "Februari": 2,
    "Maret": 3,
    "April": 4,
    "Mei": 5,
    "Juni": 6,
    "Juli": 7,
    "Agustus": 8,
    "September": 9,
    "Oktober": 10,
    "November": 11,
    "Desember": 12,
}

INDO_DATE_RE = r"Pada Tanggal (\d{1,2}) (\w+) (\d{4})(?: dan (\d{4}))?"


def _month_number(name_col: Column) -> Column:
    """Map an Indonesian month name to its number (null if unknown)."""
    expr: Column = F.lit(None).cast("int")
    # Build a when-chain; order doesn't matter, names are distinct.
    for name, num in INDO_MONTHS.items():
        expr = F.when(name_col == name, F.lit(num)).otherwise(expr)
    return expr


def parse_indo_date(text: Column | str) -> Column:
    """Extract the first ``Pada Tanggal D <bulan> YYYY`` date as DateType.

    Null when no date line matches or the month name is unknown
    (the reference's fallback path, dask-with-dataframe-[2].py:67-68).
    """
    c = F.col(text) if isinstance(text, str) else text
    day = F.regexp_extract(c, INDO_DATE_RE, 1)
    month_name = F.regexp_extract(c, INDO_DATE_RE, 2)
    year = F.regexp_extract(c, INDO_DATE_RE, 3)
    month = _month_number(month_name)
    return F.when(
        (day != "") & month.isNotNull() & (year != ""),
        F.make_date(year.cast("int"), month, day.cast("int")),
    )


def quarter_label(date_col: Column | str) -> Column:
    """``Q{1-4} {year}`` label from a date (reference format at
    dask-with-dataframe-[2].py:60); 'Unknown' for null dates."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.when(
        c.isNotNull(),
        F.concat(F.lit("Q"), F.quarter(c).cast("string"), F.lit(" "), F.year(c).cast("string")),
    ).otherwise(F.lit("Unknown"))


def quarter_from_indo_text(text: Column | str) -> Column:
    """Full pipeline: Indonesian text → 'Qn YYYY' or 'Unknown'.

    The intended semantics of ``determine_quarter`` + the findall/pick-last
    wrapper (dask-with-dataframe-[2].py:37-68,109-129): regexp_extract
    takes the FIRST match; the reference picked the LAST of findall but its
    regex never compiled (shipped bug) so no observable behavior depends on
    the choice. We document first-match as this engine's contract.
    """
    return quarter_label(parse_indo_date(text))

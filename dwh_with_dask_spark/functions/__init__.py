"""Scalar Column-expression library.

Every function here returns a ``pyspark.sql.Column`` built from
built-in functions only — JVM-side, whole-stage-codegen friendly. No
Python UDFs: all of the reference's scalar logic (SURVEY.md §2A rows
12-20) is expressible with builtins.
"""

from dwh_with_dask_spark.functions.dates import (
    INDO_MONTHS,
    parse_indo_date,
    quarter_label,
    quarter_from_indo_text,
)
from dwh_with_dask_spark.functions.numeric import (
    dsum,
    davg,
    parse_number,
    to_numeric_coerce,
)
from dwh_with_dask_spark.functions.text import (
    clean_text_v2,
    clean_text_v3,
    extract_section,
    parse_statement_line,
    truncate_names,
)

__all__ = [
    "INDO_MONTHS",
    "parse_indo_date",
    "quarter_label",
    "quarter_from_indo_text",
    "dsum",
    "davg",
    "parse_number",
    "to_numeric_coerce",
    "clean_text_v2",
    "clean_text_v3",
    "extract_section",
    "parse_statement_line",
    "truncate_names",
]

"""Text-cleaning scalar functions.

Re-expresses the reference's string-cleaning logic as pure Column
expressions (reference: ``clean_text`` at dask-with-dataframe.py:15-18,
ASCII variant at dask-with-dataframe-[2].py:26-33, section extraction at
dask-with-dataframe-[2].py:72-78, statement-line regex at
dask-with-dataframe-[2].py:86). These ran as per-cell ``.apply`` lambdas
in the reference — here they are codegen'd JVM expressions, so they
vectorize and scale with zero Python serde cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Matches the line format ``<item label>   1,234.56   <trailing text>``.
STATEMENT_LINE_RE = r"^(.+?)\s+([\d,.]+)\s*(.*)$"


def clean_text_v2(col: Column | str, max_len: int = 255) -> Column:
    """Strip non-word/non-space characters, truncate to ``max_len``.

    Semantics of the reference's v2 ``clean_text`` (regex ``[^\\w\\s]`` →
    '' then slice to 255, dask-with-dataframe.py:15-18). Null-safe: null
    stays null (the reference only applied it to non-null cells).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.regexp_replace(c, r"[^\w\s]", ""), 1, max_len)


def clean_text_v3(col: Column | str, max_len: int | None = None) -> Column:
    """Strip non-ASCII, trim, optional truncate; nulls become ''.

    Semantics of the reference's v3 ``clean_text`` (``[^\\x00-\\x7F]+`` →
    '' with a pd.notna guard mapping null → '', dask-with-dataframe-[2].py:26-33).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.trim(F.regexp_replace(F.coalesce(c.cast("string"), F.lit("")), r"[^\x00-\x7F]+", ""))
    if max_len is not None:
        out = F.substring(out, 1, max_len)
    return out


def extract_section(col: Column | str, start_marker: str, end_marker: str) -> Column:
    """Substring strictly between two literal markers; '' if either is absent.

    Semantics of the reference's ``extract_section`` (str.find both
    markers, slice between, dask-with-dataframe-[2].py:72-78). Built from
    locate/substr so the markers are treated literally (no regex escaping
    concerns), matching the reference's ``str.find``.
    """
    c = F.col(col) if isinstance(col, str) else col
    start_pos = F.locate(start_marker, c)  # 1-based; 0 = absent
    # Reference searches the end marker AFTER the start marker's end —
    # locate() only takes a literal start offset, so search the remainder.
    content_from = start_pos + F.lit(len(start_marker))
    rest = c.substr(content_from, F.length(c))
    end_rel = F.locate(end_marker, rest)
    found = (start_pos > 0) & (end_rel > 0)
    return F.when(found, rest.substr(F.lit(1), end_rel - F.lit(1))).otherwise(F.lit(""))


def parse_statement_line(
    df: DataFrame,
    line_col: str,
    item_name: str = "item",
    value_name: str = "value",
    rest_name: str = "rest",
) -> DataFrame:
    """Parse ``<item> <number-with-separators> <rest>`` lines; drop non-matches.

    Semantics of the reference's line parser (re.match 3 groups, drop and
    log non-matching lines, dask-with-dataframe-[2].py:86-92). The value
    group keeps its raw text; pair with ``parse_number`` for the float.
    """
    c = F.col(line_col)
    matched = F.regexp_extract(c, STATEMENT_LINE_RE, 2) != ""
    return (
        df.filter(matched)
        .withColumn(item_name, F.regexp_extract(c, STATEMENT_LINE_RE, 1))
        .withColumn(value_name, F.regexp_extract(c, STATEMENT_LINE_RE, 2))
        .withColumn(rest_name, F.regexp_extract(c, STATEMENT_LINE_RE, 3))
    )


def truncate_names(df: DataFrame, max_length: int = 64) -> DataFrame:
    """Truncate every column NAME to ``max_length`` characters.

    Semantics of the reference's ``truncate_column_names`` (MySQL 64-char
    identifier limit, project-dask.py:31-38). Pure metadata operation.
    """
    return df.toDF(*[c[:max_length] for c in df.columns])


def nfc_normalize(col: Column | str) -> Column:
    """Unicode NFC normalization (canonical composition) — the
    normalization step real multilingual corpora need before hashing or
    dedup (é as U+00E9 vs e+U+0301 must collide). Spark has no builtin,
    so this is an Arrow-batched pandas_udf over ``unicodedata`` — the
    sanctioned slow path, one vectorized pass, no per-row Python.
    DuckDB's ``nfc_normalize`` is the oracle twin; byte-level agreement
    on composed/decomposed fixtures is pinned in tests."""
    @F.pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    c = F.col(col) if isinstance(col, str) else col
    return _nfc(c)

"""The reference's financial-statement ETL pipelines, Spark-first.

Re-expresses EP1/EP2 (SURVEY.md §3): Excel statement sheets (and v3 PDF
text) → cleaned long fact table → surrogate IDs → ordered schema →
sink. Every step is a lazy DataFrame transform, so the whole pipeline is
ONE Catalyst plan executed at write time — vs. the reference's eager
per-statement pandas execution.

The reference's silent-failure semantics (a failed sheet becomes an
empty frame that unions away, dask-with-dataframe.py:58-60) are
deliberately NOT reproduced: failures raise. Intended-vs-actual
divergences are documented in tests/test_etl_golden.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwh_with_dask_spark.functions.dates import quarter_from_indo_text
from dwh_with_dask_spark.functions.numeric import parse_number, to_numeric_coerce
from dwh_with_dask_spark.functions.text import (
    clean_text_v2,
    clean_text_v3,
    extract_section,
    parse_statement_line,
)
from dwh_with_dask_spark.operators.ids import sequential_id_window

# Statement-type labels (project-dask.py:56-58).
STATEMENT_LABELS = ("Laba Rugi", "Posisi Keuangan", "Arus Kas")

# v3 section markers (dask-with-dataframe-[2].py:133-135).
SECTION_MARKERS = {
    "Laba Rugi": ("Laporan laba rugi", "Laporan arus kas"),
    "Arus Kas": ("Laporan arus kas", "Laporan neraca"),
    "Posisi Keuangan": ("Laporan neraca", "Catatan atas laporan"),
}


def normalize_statement_sheet(raw: DataFrame, grup_lk: str) -> DataFrame:
    """v2 per-sheet normalization (dask-with-dataframe.py:31-56).

    Positional rename → literal statement label → text clean → numeric
    coercion (unparseable → 0) → 4-column projection.
    """
    cols = raw.columns
    renamed = raw.toDF(
        "LaporanDetail", "CurrentYearInstant", "PriorYearInstant", *cols[3:]
    )
    return renamed.select(
        clean_text_v2("LaporanDetail").alias("LaporanDetail"),
        to_numeric_coerce(parse_number("CurrentYearInstant")).alias("CurrentYearInstant"),
        to_numeric_coerce(parse_number("PriorYearInstant")).alias("PriorYearInstant"),
        F.lit(grup_lk).alias("LaporanKeuangan"),
    )


def combine_statements(
    sheets: dict[str, DataFrame], emitent: str
) -> DataFrame:
    """v2 combine (dask-with-dataframe.py:76-90): lit emitent → ordered
    union → contiguous 1-based ID in union order → golden column order.

    Spark unions are unordered, so union order is stamped explicitly
    (__src, __pos) before the ID window — SURVEY.md §7 hard-part (2).
    The golden table is dimension-sized (~500 rows), so the exact
    gap-free window ID is the right tool; fact-scale callers use
    operators.ids.sequential_id instead.
    """
    stamped = []
    for i, (label, df) in enumerate(sheets.items()):
        stamped.append(
            df.withColumn("__src", F.lit(i)).withColumn(
                "__pos", F.monotonically_increasing_id()
            )
        )
    unioned = stamped[0]
    for df in stamped[1:]:
        unioned = unioned.unionByName(df)
    with_id = sequential_id_window(unioned, ["__src", "__pos"], name="ID")
    return with_id.select(
        "ID",
        F.lit(emitent).alias("emitent"),
        "LaporanKeuangan",
        "LaporanDetail",
        "CurrentYearInstant",
        "PriorYearInstant",
    )


def pipeline_v2(
    statement_sheets: dict[str, DataFrame], emitent: str
) -> DataFrame:
    """EP1: the v2 Excel pipeline end-to-end → `laporan_keuangan` shape
    (financial_statement.sql:3-10)."""
    normalized = {
        label: normalize_statement_sheet(raw, label)
        for label, raw in statement_sheets.items()
    }
    return combine_statements(normalized, emitent)


def pipeline_v2_observed(
    statement_sheets: dict[str, DataFrame], emitent: str
):
    """EP1 with native stage metrics: the Spark answer to the
    reference's per-stage row-count logging (§2A #29 — print(len(df))
    after each step, each print forcing an eager pandas materialization).

    ``DataFrame.observe`` attaches accumulator-backed metrics to points
    IN the single lazy plan: per-sheet post-normalization row counts and
    final-table stats are collected DURING the one write/collect action
    — zero extra jobs, zero extra scans, and they keep working
    unchanged under Structured Streaming (where a count() per stage is
    not even expressible).

    Returns (df, observations): read ``observations[name].get`` after
    the first action on ``df``.
    """
    from pyspark.sql import Observation

    observations: dict[str, Observation] = {}
    normalized = {}
    for label, raw in statement_sheets.items():
        o = Observation(f"sheet {label}")
        normalized[label] = normalize_statement_sheet(raw, label).observe(
            o, F.count(F.lit(1)).alias("rows")
        )
        observations[label] = o
    final = Observation("final")
    df = combine_statements(normalized, emitent).observe(
        final,
        F.count(F.lit(1)).alias("rows"),
        F.min("ID").alias("min_id"),
        F.max("ID").alias("max_id"),
    )
    observations["final"] = final
    return df, observations


# ---------------------------------------------------------------------------
# v3: PDF text + Excel → `financial_statement` (EP2)
# ---------------------------------------------------------------------------

def pdf_statements(full_text_df: DataFrame) -> DataFrame:
    """v3 PDF branch (dask-with-dataframe-[2].py:100-147), per document.

    Input: (doc_id, text) whole-document text. Output long rows
    (doc_id, grup_lk, item, value, quarter). The quarter derives from the
    intended date-regex semantics (the reference's own regex never
    compiled — §2A #19); sections slice between the v3 markers; statement
    lines parse via the 3-group regex with non-matches dropped.
    """
    with_quarter = full_text_df.withColumn(
        "quarter", quarter_from_indo_text("text")
    )
    per_section = []
    for grup_lk, (start, end) in SECTION_MARKERS.items():
        section = with_quarter.select(
            "doc_id",
            "quarter",
            F.explode(
                F.split(extract_section("text", start, end), "\n")
            ).alias("line"),
        )
        parsed = parse_statement_line(section, "line")
        per_section.append(
            parsed.select(
                "doc_id",
                F.lit(grup_lk).alias("grup_lk"),
                clean_text_v3("item").alias("item"),
                parse_number("value").alias("value"),
                "quarter",
            )
        )
    out = per_section[0]
    for df in per_section[1:]:
        out = out.unionByName(df)
    return out


def pipeline_v3(
    statement_sheets: dict[str, DataFrame],
    emitent: str,
    pdf_full_text: DataFrame | None = None,
) -> DataFrame:
    """EP2: PDF + Excel → `financial_statement` shape
    (ID, emitent, grup_lk, item, value, quarter —
    dask-with-dataframe-[2].py:205).

    Cross-source dependency preserved: the Excel rows take their quarter
    from the PDF branch's scalar (dask-with-dataframe-[2].py:186-190),
    'Unknown' when no PDF/date exists.
    """
    parts: list[DataFrame] = []
    if pdf_full_text is not None:
        pdf_rows = pdf_statements(pdf_full_text)
        qrow = pdf_rows.select("quarter").filter(F.col("quarter") != "Unknown").first()
        quarter = qrow[0] if qrow else "Unknown"
        parts.append(pdf_rows.select("grup_lk", "item", "value", "quarter"))
    else:
        quarter = "Unknown"

    for label, raw in statement_sheets.items():
        norm = normalize_statement_sheet(raw, label)
        parts.append(
            norm.select(
                F.col("LaporanKeuangan").alias("grup_lk"),
                clean_text_v3("LaporanDetail").alias("item"),
                F.col("CurrentYearInstant").alias("value"),
                F.lit(quarter).alias("quarter"),
            )
        )
    # Stamp union order explicitly — Spark unions are unordered (§2A #22).
    stamped = [
        p.withColumn("__src", F.lit(i)).withColumn(
            "__pos", F.monotonically_increasing_id()
        )
        for i, p in enumerate(parts)
    ]
    combined = stamped[0]
    for df in stamped[1:]:
        combined = combined.unionByName(df)

    with_id = sequential_id_window(combined, ["__src", "__pos"], name="ID")
    return with_id.select(
        "ID",
        F.lit(emitent).alias("emitent"),
        "grup_lk",
        "item",
        "value",
        "quarter",
    )

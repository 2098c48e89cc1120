"""Ordered-sequence sessionization (gaps-and-islands) operators.

Two flavors:

- ``sessionize_outline`` — the reference's stateful CALK outline parser
  (detail_notes.py:23-79) re-shaped for Spark: a per-line state machine
  becomes flag-boundaries + running-sum group ids + groupBy assembly.
  SURVEY.md §2A #21 calls this the one operator whose Spark form genuinely
  differs from the reference's loop.
- ``sessionize_by_gap`` — classic event sessionization (new session when
  the gap to the previous event exceeds a timeout). Batch analog of
  Structured Streaming's session_window, exposed for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Outline-number boundary, e.g. "1.", "1.a.", "1.a.i." (detail_notes.py:51).
OUTLINE_RE = r"^(\d+(\.\w+)*\.)\s+(.*)$"


def sessionize_outline(
    pages: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page_no",
    text_col: str = "text",
    arm_marker: str = "Catatan Atas Laporan Keuangan",
) -> DataFrame:
    """Parse hierarchical outline notes from ordered page text.

    Input: one row per page (doc_id, page_no, text). Output: one row per
    note — (doc_id, Nomor, calk, deskripsi) matching the reference's
    detail_notes schema (detail_notes.py:14-20).

    Plan: posexplode lines in page order → arm at the literal marker
    (running max over an ordered window) → mark boundary lines (outline
    regex) → running sum of boundary flags = group id → groupBy group id,
    first(number), first(title), concat_ws(body). Two window passes + one
    aggregation, all partitioned by document — scales with corpus size as
    long as single documents fit a partition (the same assumption any
    order-sensitive parse needs).
    """
    lines = pages.select(
        F.col(doc_col).alias("doc_id"),
        F.col(page_col).alias("page_no"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "line_no", "line"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("page_no", "line_no")

    armed = lines.withColumn(
        "armed",
        F.max((F.col("line").contains(arm_marker)).cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).filter((F.col("armed") == 1) & (~F.col("line").contains(arm_marker)))

    flagged = armed.withColumn(
        "nomor", F.regexp_extract("line", OUTLINE_RE, 1)
    ).withColumn("is_boundary", (F.col("nomor") != "").cast("int"))

    grouped = flagged.withColumn(
        "note_id",
        F.sum("is_boundary").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).filter(F.col("note_id") > 0)

    body = F.when(F.col("is_boundary") == 0, F.trim(F.col("line")))
    title = F.when(
        F.col("is_boundary") == 1, F.regexp_extract("line", OUTLINE_RE, 3)
    )
    return grouped.groupBy("doc_id", "note_id").agg(
        F.first(F.when(F.col("is_boundary") == 1, F.col("nomor")), ignorenulls=True).alias(
            "Nomor"
        ),
        F.substring(F.first(title, ignorenulls=True), 1, 255).alias("calk"),
        F.concat_ws(
            " ", F.collect_list(F.when(body != "", body))
        ).alias("deskripsi"),
    )


def sessionize_by_gap(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "5 minutes",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign session ids: new session when gap to previous event > gap.

    Output = input + ``session_id`` (1-based per key). One window
    shuffle on the key; the batch twin of F.session_window so batch and
    streaming paths agree.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr)
    ).cast("int")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )

"""EP3: the CALK notes pipeline (detail_notes.py) re-expressed on Spark.

Reference: a per-line Python state machine over pdfplumber pages
(detail_notes.py:23-79) feeding row-wise ORM inserts. Spark shape:
pages scan → sessionize_outline (posexplode + running-sum window +
groupBy assembly) → distributed JDBC append.

The reference's String(255) autoincrement-PK bug (§2A #27) is replaced
by a proper LongType surrogate id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dwh_with_dask_spark.operators.ids import sequential_id_window
from dwh_with_dask_spark.operators.sessionize import sessionize_outline


def detail_notes(pages: DataFrame) -> DataFrame:
    """(doc_id, page_no, text) pages → (id, Nomor, calk, deskripsi).

    Matches the reference's detail_notes schema (detail_notes.py:14-20)
    with the intended LongType id. Note order follows document order.
    """
    notes = sessionize_outline(pages)
    with_id = sequential_id_window(notes, ["doc_id", "note_id"], name="id")
    return with_id.select("id", "doc_id", "Nomor", "calk", "deskripsi")

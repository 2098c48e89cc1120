"""PDF / document-text source (SURVEY.md §2A #3-4).

The reference reads one PDF on the driver with pdfplumber and joins all
page text (dask-with-dataframe-[2].py:102-104) or iterates page lines
(detail_notes.py:30-36). Spark-first shape: a binaryFile scan produces
(path, content) rows; ``pdf_pages`` explodes each document into
(doc_id, page_no, text) rows via an Arrow-batched mapInPandas — the
text-extraction library runs on executors, one task per file batch, so a
million PDFs parse in parallel.

pdfplumber is NOT installed in this container: the extraction step is
gated and raises NotImplementedError, while all Spark-side plumbing
(schema, batching, page explosion, downstream operators) is real and
tested against pre-extracted page fixtures (FIXTURES.md A3) through
``pages_from_rows``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "doc_id string, page_no int, text string"


def _extract_pages(content: bytes) -> list[str]:
    """Per-document page text extraction (executor-side)."""
    try:
        import pdfplumber  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "pdfplumber not installed in this runtime; supply pre-extracted "
            "page text via pages_from_rows(), or install pdfplumber on "
            "executors for real PDF ingestion"
        ) from e
    import io

    import pdfplumber

    with pdfplumber.open(io.BytesIO(content)) as pdf:
        return [page.extract_text() or "" for page in pdf.pages]


def pdf_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → (doc_id, page_no, text), one row per page.

    page_no is 1-based in document order (the CALK parser depends on
    line order within doc — SURVEY.md §2A #21).
    """
    binaries = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.pdf").load(path_glob)
    )

    def parse(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for _, row in pdf_batch.iterrows():
                for i, text in enumerate(_extract_pages(row["content"]), start=1):
                    rows.append({"doc_id": row["path"], "page_no": i, "text": text})
            yield pd.DataFrame(rows, columns=["doc_id", "page_no", "text"])

    return binaries.select("path", "content").mapInPandas(parse, schema=PAGES_SCHEMA)


def pages_from_rows(
    spark: SparkSession, rows: list[tuple[str, int, str]]
) -> DataFrame:
    """Build the canonical pages DataFrame from pre-extracted text —
    the test/fixture entry point with the exact schema pdf_pages emits."""
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def full_text(pages: DataFrame) -> DataFrame:
    """(doc_id, text): newline-join of all pages in order — the analog of
    the reference's ''.join(page.extract_text()) whole-document string."""
    from pyspark.sql import functions as F

    return (
        pages.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("page_no", "text"))
                    ),
                    lambda s: s["text"],
                ),
            ).alias("text")
        )
    )

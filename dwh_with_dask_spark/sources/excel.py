"""Excel source — the reference's primary input (SURVEY.md §2A #1-2).

Reference behavior re-expressed:
- sheet scan with a header offset (pd.read_excel(header=1),
  project-dask.py:23-25, dask-with-dataframe.py:35)
- headerless key/value sheet + scalar cell lookup ('Kode entitas' →
  ticker, project-dask.py:15-16)

Design for scale: a single .xlsx is inherently a driver-side object (zip
of XML, no splittable row groups), so the honest architecture is
**ingest-to-Parquet**: read the workbook once on the driver (pandas /
openpyxl), write Parquet, and let every downstream query run
distributed. ``excel_to_parquet`` is that step; ``read_excel_sheet``
covers the interactive path. For *many* workbooks, parallelize across
files: binaryFile scan + mapInPandas with openpyxl per executor —
``read_excel_many`` sketches that path (gated on openpyxl presence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # gated: not guaranteed in every runtime
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None


def _require_excel_engine() -> None:
    if pd is None:
        raise NotImplementedError("pandas not available for the Excel bridge")
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "openpyxl not installed in this runtime; Excel ingestion requires "
            "it (or pre-convert workbooks to Parquet/CSV upstream)"
        ) from e


def read_excel_sheet(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
    header: int | None = 1,
) -> DataFrame:
    """One sheet → DataFrame via the driver-side pandas bridge (Arrow).

    ``header=1`` skips the title row like the reference; ``header=None``
    gives positional _c0.._cN columns (the key/value sheet case).
    """
    _require_excel_engine()
    pdf = pd.read_excel(path, sheet_name=sheet_name, header=header)
    if header is None:
        pdf.columns = [f"_c{i}" for i in range(len(pdf.columns))]
    else:
        pdf.columns = [str(c) for c in pdf.columns]
    return spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))


def lookup_cell(
    spark: SparkSession, path: str, sheet_name: str | int, key: str
) -> str | None:
    """Scalar cell lookup: value in column 1 where column 0 == key
    (reference: df.loc[df[0]=='Kode entitas', 1].values[0])."""
    df = read_excel_sheet(spark, path, sheet_name, header=None)
    row = df.filter(F.col("_c0") == key).select("_c1").first()
    return None if row is None else row[0]


def excel_to_parquet(
    spark: SparkSession,
    xlsx_path: str,
    out_dir: str,
    sheets: list[str | int],
    header: int | None = 1,
) -> dict[str, str]:
    """Ingest-to-Parquet normalization: each sheet → one Parquet dataset.

    This is the 100 TB story for semi-structured office inputs: pay the
    driver-side parse once at ingest, then all queries are columnar scans.
    """
    out = {}
    for sheet in sheets:
        df = read_excel_sheet(spark, xlsx_path, sheet, header)
        dest = f"{out_dir}/{sheet}"
        df.write.mode("overwrite").parquet(dest)
        out[str(sheet)] = dest
    return out


def read_excel_many(
    spark: SparkSession,
    path_glob: str,
    sheet_name: str | int = 0,
    header: int | None = 1,
    schema: str | None = None,
) -> DataFrame:
    """Distributed many-workbook reader: binaryFile scan + mapInPandas.

    Each executor parses its own workbooks (openpyxl over the binary
    content), so ingest scales with the number of files. ``schema`` must
    be supplied (arbitrary sheets can't be schema-inferred distributedly).
    """
    _require_excel_engine()
    if schema is None:
        raise ValueError("schema is required for the distributed Excel reader")
    import io

    binaries = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.xlsx").load(path_glob)
    )

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                sheet = pd.read_excel(
                    io.BytesIO(row["content"]), sheet_name=sheet_name, header=header
                )
                sheet["source_path"] = row["path"]
                yield sheet

    return binaries.select("path", "content").mapInPandas(parse, schema=schema)

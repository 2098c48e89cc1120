"""Spark 4 Python DataSource for xlsx: ``spark.read.format("xlsx")``.

The reference reads workbooks with pandas on one machine
(project-dask.py:23-25, dask-with-dataframe.py:35); this exposes the
same capability as a first-class Spark source via the Python Data
Source API (pyspark.sql.datasource, new in Spark 4): the DRIVER only
lists (file, sheet) pairs; each worksheet parses on an EXECUTOR as its
own input partition, so a directory of many workbooks scans with
per-sheet parallelism and no driver bottleneck.

Rows come out in the grid shape (sheet, row_idx, cells array) — the
same positional contract the rest of the Excel surface consumes
(sources/excel.py applies header offsets, positional schemas, and
typed coercion downstream). Parsing uses the stdlib OOXML reader
(sources/xlsx_lite.py), so the source works with no optional
dependencies.

Register once per session, then it behaves like any built-in format:

    spark.dataSource.register(XlsxDataSource)
    df = (spark.read.format("xlsx")
          .option("sheets", "1000000,1311000")   # names or indexes; default: all
          .load("/data/workbooks"))              # file or directory

Contract note for clusters: paths are opened on executors, so they
must be on a shared filesystem / mounted object store — the same
contract as every file-based source.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

GRID_SCHEMA = "sheet string, row_idx bigint, cells array<string>"


class SheetPartition(InputPartition):
    def __init__(self, path: str, sheet: str | int):
        self.path = path
        self.sheet = sheet


def _workbook_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.xlsx")))
    return sorted(glob.glob(path)) or [path]


class XlsxReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xlsx source requires a path")
        raw = options.get("sheets", "")
        self.sheets: Sequence[str] = [s.strip() for s in raw.split(",") if s.strip()]

    def partitions(self) -> Sequence[InputPartition]:
        """One partition per (workbook, sheet) — listed on the driver
        with sheet names read from each workbook's tiny manifest XML
        (no cell data touches the driver)."""
        from dwh_with_dask_spark.sources.xlsx_lite import sheet_names

        parts: list[SheetPartition] = []
        for p in _workbook_paths(self.path):
            names = sheet_names(p)
            if self.sheets:
                wanted: list[str | int] = []
                for s in self.sheets:
                    if s in names:
                        wanted.append(s)
                    elif s.isdigit() and not self.sheets:  # pragma: no cover
                        wanted.append(int(s))
                    elif s.isdigit() and int(s) < len(names) and s not in names:
                        wanted.append(names[int(s)])
                    # silently skip sheets absent from this workbook —
                    # heterogeneous directories are the normal case
            else:
                wanted = list(names)
            parts.extend(SheetPartition(p, s) for s in wanted)
        return parts

    def read(self, partition: SheetPartition) -> Iterator[tuple]:
        """Executor-side: parse ONE worksheet with the stdlib OOXML
        reader and emit grid rows."""
        from dwh_with_dask_spark.sources.xlsx_lite import sheet_rows

        for i, row in enumerate(sheet_rows(partition.path, partition.sheet)):
            yield (
                str(partition.sheet),
                i,
                [None if v is None else str(v) for v in row],
            )


class XlsxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> str:
        return GRID_SCHEMA

    def reader(self, schema) -> XlsxReader:
        return XlsxReader(self.options)

"""Driver-visible §2A ETL queries over COMMITTED binary fixtures.

The driver's correctness oracle runs over ``/root/testdata`` parquet,
which has no Excel/PDF — so until round 13 the reference's own
pipelines (EP1 ``plans/financial_etl.py``, EP3 ``plans/calk.py``) were
pytest-only. This module closes that gap (VERDICT r12 ask #3): a small
deterministic fixture WORKBOOK and PDF live at ``fixtures/etl/`` in the
repo (regenerable bit-for-bit by ``ensure_fixtures`` /
``scripts/gen_etl_fixtures.py``), and two registry queries run the
flagship ETL surface end-to-end THROUGH THE REAL PARSERS:

- ``etl_laporan_keuangan``: stdlib OOXML parse (sources/xlsx_lite) →
  ``lookup_cell`` emitent → ``pipeline_v2`` (rename/clean/coerce/
  ordered-union/sequential ID) → the golden 6-column fact table.
  Reference surface: dask-with-dataframe.py:35-93, project-dask.py:15.
- ``etl_detail_notes``: real PDF bytes → binaryFile scan →
  executor-side stdlib Flate text extraction (sources/pdf) →
  ``sessionize_outline`` CALK state machine → ``detail_notes`` schema.
  Reference surface: detail_notes.py:23-79.

Both carry FULL DuckDB oracles (not rows-only): the fixture contents
are restated as VALUES from the same Python constants that generate
the binaries, and the SQL reproduces every transform (clean_text_v2's
``[^\\w\\s]`` strip, thousands-separator parse with coerce-to-0, the
union-order window ID, the outline arm/boundary/running-sum group
assembly) — so a hash match proves the xlsx/PDF parse AND the pipeline
semantics against an independent engine.
"""

from __future__ import annotations

import os
import zipfile
import zlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
FIXTURE_DIR = os.path.join(_REPO, "fixtures", "etl")
WORKBOOK_PATH = os.path.join(FIXTURE_DIR, "financial_statement_fixture.xlsx")
NOTES_PDF_PATH = os.path.join(FIXTURE_DIR, "notes_fixture.pdf")

# --------------------------------------------------------------------------
# Fixture contents — the single source of truth. The xlsx/pdf writers
# below serialize exactly this, and the oracle SQL restates it as
# VALUES, so Spark (via the real parsers) and DuckDB (via the literals)
# must agree on every byte of the pipeline output.
# --------------------------------------------------------------------------

# Headerless general-info sheet (project-dask.py:15: 'Kode entitas' row).
INFO_SHEET = "1000000"
INFO_GRID: list[list[str | None]] = [
    ["Informasi umum", None],
    ["Kode entitas", "FIXT"],
    ["Nama entitas", "PT Fixture Tbk"],
    ["Periode", "31 Maret 2024"],
]

# Statement sheets, keyed like the reference workbook (test parity:
# tests/test_reference_workbook.py SHEETS). Each grid: row 0 = title
# (skipped by header=1), row 1 = header names, rows 2+ = data. Value
# cells are STRINGS (thousands separators, garbage, None) to exercise
# parse_number + to_numeric_coerce; labels exercise clean_text_v2's
# non-word strip and the null-stays-null contract.
STATEMENT_SHEETS: dict[str, str] = {
    "Laba Rugi": "1311000",
    "Posisi Keuangan": "1210000",
    "Arus Kas": "1510000",
}
SHEET_GRIDS: dict[str, list[list[str | None]]] = {
    "Laba Rugi": [
        ["Laporan laba rugi", None, None, None],
        ["Uraian", "CurrentYear", "PriorYear", "English"],
        ["Pendapatan bersih!", "12,345.75", "11,000.25", "Net revenue"],
        ["Beban pokok (penjualan)", "4,200.00", "3,900", "COGS"],
        ["Laba koto®", "8,145.75", "7,100.25", None],
        ["Beban usaha: umum & admin.", "1,000", "950.50", "Opex"],
        ["Laba bersih*", "7,145.75", "garbage", "Net income"],
    ],
    "Posisi Keuangan": [
        ["Laporan posisi keuangan", None, None, None],
        ["Uraian", "CurrentYear", "PriorYear", "English"],
        ["Kas & setara kas", "1,500.10", None, "Cash"],
        [None, "10", "20", "NullLabel"],
        ["Piutang usaha (neto)", "garbage", "750.25", "Receivables"],
    ],
    "Arus Kas": [
        ["Laporan arus kas", None, None, None],
        ["Uraian", "CurrentYear", "PriorYear", "English"],
        ["Arus kas operasi.", None, None, "Operating CF"],
        ["Arus kas investasi?", "-250.50", "-100", "Investing CF"],
    ],
}

# CALK notes PDF: page -> lines (detail_notes.py:23-79 input shape).
# Pre-marker lines must be ignored; the outline spans a page break.
NOTES_PAGES: list[list[str]] = [
    [
        "PT Fixture Tbk",
        "Laporan Keuangan Interim 31 Maret 2024",
        "Catatan Atas Laporan Keuangan",
        "1. Umum",
        "Perusahaan didirikan tahun 1995.",
        "Berkedudukan di Jakarta.",
        "1.a. Anak perusahaan",
        "Memiliki 3 anak perusahaan.",
    ],
    [
        "2. Kebijakan akuntansi",
        "Disusun berdasarkan SAK.",
        "2.a. Pengakuan pendapatan",
        "Pendapatan diakui saat terjadi.",
        "3. Kas",
        "Terdiri dari kas dan bank.",
    ],
]
NOTES_DOC = "notes_fixture.pdf"


# --------------------------------------------------------------------------
# Deterministic fixture writers (stdlib only, fixed zip timestamps).
# --------------------------------------------------------------------------

def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _sheet_xml(grid: list[list[str | None]]) -> str:
    rows = []
    for ri, row in enumerate(grid, start=1):
        cells = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_letter(ci)}{ri}"
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{_xml_escape(v)}</t></is></c>"
            )
        rows.append(f'<row r="{ri}">{"".join(cells)}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        "<worksheet xmlns="
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows)}</sheetData></worksheet>"
    )


def write_fixture_workbook(path: str) -> None:
    """Minimal OOXML workbook (inline strings, no styles/sharedStrings)
    serializing INFO_GRID + SHEET_GRIDS — readable by sources/xlsx_lite
    and by openpyxl. Deterministic bytes: fixed zip timestamps, fixed
    member order, DEFLATE level 9."""
    sheets = [(INFO_SHEET, INFO_GRID)] + [
        (STATEMENT_SHEETS[label], SHEET_GRIDS[label])
        for label in STATEMENT_SHEETS
    ]
    ct_overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(len(sheets))
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        "<Types xmlns="
        '"http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'sheet.main+xml"/>'
        f"{ct_overrides}</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        "<Relationships xmlns="
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type='
        '"http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    sheet_entries = "".join(
        f'<sheet name="{name}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (name, _) in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        "<workbook xmlns="
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        "<Relationships xmlns="
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type='
            '"http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + "</Relationships>"
    )
    members = [
        ("[Content_Types].xml", content_types),
        ("_rels/.rels", root_rels),
        ("xl/workbook.xml", workbook),
        ("xl/_rels/workbook.xml.rels", wb_rels),
    ] + [
        (f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(grid))
        for i, (_, grid) in enumerate(sheets)
    ]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED, compresslevel=9) as z:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, data.encode("utf-8"), compresslevel=9)
    os.replace(tmp, path)  # atomic: concurrent readers never see a torn file


def write_fixture_pdf(path: str) -> None:
    """Minimal multi-page PDF (FlateDecode content streams, one Tj/T*
    per line) serializing NOTES_PAGES — readable by sources/pdf's
    stdlib extractor. Deterministic bytes (zlib level 9, no dates)."""
    streams = []
    for lines in NOTES_PAGES:
        shows = " T* ".join(
            "(" + ln.replace("\\", r"\\").replace("(", r"\(")
            .replace(")", r"\)") + ") Tj"
            for ln in lines
        )
        streams.append(f"BT /F1 12 Tf 72 720 Td 14 TL {shows} ET".encode())
    n_pages = len(streams)
    objs: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    font_num = 3 + 2 * n_pages
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i in range(n_pages):
        cnum = 3 + n_pages + i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {cnum} 0 R /Resources << /Font << /F1 "
                f"{font_num} 0 R >> >> >>"
            ).encode()
        )
    for cs in streams:
        body = zlib.compress(cs, 9)
        objs.append(
            f"<< /Length {len(body)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n" + body + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)  # atomic publish, same reason as the workbook


def ensure_fixtures() -> None:
    """Write the committed fixtures if absent (idempotent; regeneration
    is byte-identical, so a fresh checkout and a regen agree)."""
    if not os.path.exists(WORKBOOK_PATH):
        write_fixture_workbook(WORKBOOK_PATH)
    if not os.path.exists(NOTES_PDF_PATH):
        write_fixture_pdf(NOTES_PDF_PATH)


# --------------------------------------------------------------------------
# Oracle SQL builders (VALUES restatement of the same constants).
# --------------------------------------------------------------------------

def _sql_lit(v: str | None) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + v.replace("'", "''") + "'"


def _laporan_oracle() -> str:
    rows = []
    for src, (label, _sheet) in enumerate(STATEMENT_SHEETS.items()):
        for pos, row in enumerate(SHEET_GRIDS[label][2:]):
            rows.append(
                f"({src}, {pos}, {_sql_lit(label)}, {_sql_lit(row[0])}, "
                f"{_sql_lit(row[1])}, {_sql_lit(row[2])})"
            )
    values = ",\n    ".join(rows)
    return f"""
    WITH raw(src, pos, grup, label, cur, prior) AS (VALUES
    {values}
    )
    SELECT CAST(row_number() OVER (ORDER BY src, pos) AS BIGINT) AS ID,
           'FIXT' AS emitent,
           grup AS LaporanKeuangan,
           substring(regexp_replace(label, '[^\\w\\s]', '', 'g'), 1, 255)
             AS LaporanDetail,
           COALESCE(TRY_CAST(replace(cur, ',', '') AS DOUBLE), 0.0)
             AS CurrentYearInstant,
           COALESCE(TRY_CAST(replace(prior, ',', '') AS DOUBLE), 0.0)
             AS PriorYearInstant
    FROM raw
    ORDER BY ID
    """


_OUTLINE_RE_SQL = r"^(\d+(\.\w+)*\.)\s+(.*)$"


def _notes_oracle() -> str:
    rows = []
    for pno, lines in enumerate(NOTES_PAGES, start=1):
        for lno, line in enumerate(lines):
            rows.append(f"({pno}, {lno}, {_sql_lit(line)})")
    values = ",\n    ".join(rows)
    return f"""
    WITH lines(page_no, line_no, line) AS (VALUES
    {values}
    ),
    armed AS (
      SELECT *,
             MAX(CASE WHEN line LIKE '%Catatan Atas Laporan Keuangan%'
                 THEN 1 ELSE 0 END)
               OVER (ORDER BY page_no, line_no
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS armed
      FROM lines),
    flagged AS (
      SELECT *,
             regexp_extract(line, '{_OUTLINE_RE_SQL}', 1) AS nomor,
             CASE WHEN regexp_extract(line, '{_OUTLINE_RE_SQL}', 1) <> ''
                  THEN 1 ELSE 0 END AS is_boundary
      FROM armed
      WHERE armed = 1
        AND line NOT LIKE '%Catatan Atas Laporan Keuangan%'),
    grouped AS (
      SELECT *,
             SUM(is_boundary)
               OVER (ORDER BY page_no, line_no
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS note_id
      FROM flagged),
    notes AS (
      SELECT note_id,
             MAX(CASE WHEN is_boundary = 1 THEN nomor END) AS Nomor,
             substring(MAX(CASE WHEN is_boundary = 1 THEN
               regexp_extract(line, '{_OUTLINE_RE_SQL}', 3) END), 1, 255)
               AS calk,
             COALESCE(string_agg(
               CASE WHEN is_boundary = 0 AND trim(line) <> ''
                    THEN trim(line) END,
               ' ' ORDER BY page_no, line_no), '') AS deskripsi
      FROM grouped WHERE note_id > 0 GROUP BY note_id)
    SELECT CAST(row_number() OVER (ORDER BY note_id) AS BIGINT) AS id,
           '{NOTES_DOC}' AS doc_id, Nomor, calk, deskripsi
    FROM notes
    ORDER BY id
    """


# --------------------------------------------------------------------------
# Registry queries.
# --------------------------------------------------------------------------

def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@query("etl_laporan_keuangan", _laporan_oracle())
def etl_laporan_keuangan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 end-to-end on the committed fixture workbook: stdlib OOXML
    parse → 'Kode entitas' emitent lookup → pipeline_v2 (rename, clean,
    coerce, ordered union, gap-free ID) → golden laporan_keuangan table.
    sf_dir is unused — the input is the committed xlsx, which is the
    point: the driver's oracle now sees the Excel parse itself.
    Reference: dask-with-dataframe.py:35-93, project-dask.py:15."""
    from dwh_with_dask_spark.plans.financial_etl import pipeline_v2
    from dwh_with_dask_spark.sources.excel import (
        lookup_cell,
        read_excel_sheet,
    )

    ensure_fixtures()
    emitent = lookup_cell(spark, WORKBOOK_PATH, INFO_SHEET, "Kode entitas")
    raw_sheets = {
        label: read_excel_sheet(spark, WORKBOOK_PATH, sheet, header=1)
        for label, sheet in STATEMENT_SHEETS.items()
    }
    return pipeline_v2(raw_sheets, emitent)


@query("etl_detail_notes", _notes_oracle())
def etl_detail_notes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 end-to-end on the committed fixture PDF: binaryFile scan →
    executor-side stdlib FlateDecode text extraction → CALK outline
    sessionization (arm marker, boundary regex, running-sum groups) →
    detail_notes schema. doc_id is projected to the stable basename so
    the value hash is environment-independent.
    Reference: detail_notes.py:23-79."""
    from dwh_with_dask_spark.plans.calk import detail_notes
    from dwh_with_dask_spark.sources.pdf import pdf_pages

    ensure_fixtures()
    pages = pdf_pages(spark, FIXTURE_DIR)
    notes = detail_notes(pages)
    return notes.withColumn(
        "doc_id", F.element_at(F.split("doc_id", "/"), -1)
    ).select("id", "doc_id", "Nomor", "calk", "deskripsi")

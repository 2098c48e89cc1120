"""Regenerate the committed ETL fixtures (byte-identical each run).

The fixture CONTENTS live in dwh_with_dask_spark/plans/etl_driver.py —
the same constants its oracle SQL restates as VALUES. This script just
serializes them to fixtures/etl/.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwh_with_dask_spark.plans.etl_driver import (  # noqa: E402
    NOTES_PDF_PATH,
    WORKBOOK_PATH,
    write_fixture_pdf,
    write_fixture_workbook,
)

if __name__ == "__main__":
    write_fixture_workbook(WORKBOOK_PATH)
    write_fixture_pdf(NOTES_PDF_PATH)
    print(f"wrote {WORKBOOK_PATH} ({os.path.getsize(WORKBOOK_PATH)} B)")
    print(f"wrote {NOTES_PDF_PATH} ({os.path.getsize(NOTES_PDF_PATH)} B)")

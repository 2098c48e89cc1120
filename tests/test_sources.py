"""Round-trip tests for the file source/sink surface (SURVEY.md §2B scans).

Each format writes the same small frame and reads it back; values must
survive exactly (modulo the format's documented type limits — CSV/JSON
carry no native date/decimal, so those columns round-trip via explicit
schema).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_with_dask_spark import sinks
from dwh_with_dask_spark.sources import files

SCHEMA = "id long, name string, price double, d date"
ROWS = [
    (1, "alpha", 1.5, "2024-01-01"),
    (2, "beta", -2.25, "2024-06-30"),
    (3, None, 0.0, None),
]


def _frame(spark):
    return spark.createDataFrame(
        [(i, n, p, d) for i, n, p, d in ROWS], "id long, name string, price double, d string"
    ).withColumn("d", F.col("d").cast("date"))


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("id").collect()]


def test_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    df = _frame(spark)
    sinks.write_parquet(df, path)
    back = files.read_parquet(spark, path)
    assert _sorted_rows(back.select(*df.columns)) == _sorted_rows(df)


def test_orc_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.orc")
    df = _frame(spark)
    df.write.mode("overwrite").orc(path)
    back = files.read_orc(spark, path)
    assert _sorted_rows(back.select(*df.columns)) == _sorted_rows(df)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    path = str(tmp_path / "t.csv")
    df = _frame(spark)
    sinks.write_csv(df, path)
    back = files.read_csv(spark, path, schema=SCHEMA)
    assert _sorted_rows(back.select(*df.columns)) == _sorted_rows(df)


def test_csv_infer_schema(spark, tmp_path):
    path = str(tmp_path / "t2.csv")
    sinks.write_csv(_frame(spark), path)
    back = files.read_csv(spark, path)
    assert back.count() == 3
    assert dict(back.dtypes)["id"] in ("int", "bigint")


def test_json_roundtrip_with_schema(spark, tmp_path):
    path = str(tmp_path / "t.json")
    df = _frame(spark)
    sinks.write_json(df, path)
    back = files.read_json(spark, path, schema=SCHEMA)
    assert _sorted_rows(back.select(*df.columns)) == _sorted_rows(df)


def test_binary_files_scan(spark, tmp_path):
    p = tmp_path / "blob.bin"
    payload = b"\x00\x01binary-payload\xff"
    p.write_bytes(payload)
    df = files.read_binary_files(spark, str(tmp_path))
    row = df.select("path", "length", "content").first()
    assert row["length"] == len(payload)
    assert bytes(row["content"]) == payload

"""Unit tests for the scalar Column-expression library (SURVEY.md §5.3).

Covers the reference's cleaning/coercion/date semantics including edge
cases (nulls, non-ASCII, thousands separators, missing markers) and the
two intended-vs-shipped divergences (§2A #17, #19).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_with_dask_spark.functions import (
    clean_text_v2,
    clean_text_v3,
    extract_section,
    parse_indo_date,
    parse_number,
    parse_statement_line,
    quarter_from_indo_text,
    to_numeric_coerce,
    truncate_names,
)


def one(spark, col, value=None):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col.alias("out")).first()["out"]


def test_clean_text_v2(spark):
    assert one(spark, clean_text_v2("v"), "a-b.c!  d") == "abc  d"
    assert one(spark, clean_text_v2("v"), "x" * 300) == "x" * 255
    assert one(spark, clean_text_v2("v"), None) is None


def test_clean_text_v3(spark):
    # Strips non-ASCII, trims; null → '' (pd.notna guard semantics).
    assert one(spark, clean_text_v3("v"), "  café™  ") == "caf"
    assert one(spark, clean_text_v3("v"), None) == ""
    assert one(spark, clean_text_v3("v", max_len=3), "abcdef") == "abc"


def test_to_numeric_coerce(spark):
    assert one(spark, to_numeric_coerce("v"), "12.5") == 12.5
    assert one(spark, to_numeric_coerce("v"), "garbage") == 0.0
    assert one(spark, to_numeric_coerce("v"), None) == 0.0


def test_parse_number_thousands(spark):
    assert one(spark, parse_number("v"), "1,234,567.89") == 1234567.89
    assert one(spark, parse_number("v", default=0.0), "n/a") == 0.0


def test_extract_section(spark):
    text = "AAA Laporan laba rugi\nitem 1\nLaporan arus kas BBB"
    got = one(spark, extract_section("v", "Laporan laba rugi", "Laporan arus kas"), text)
    assert got == "\nitem 1\n"
    # Missing marker → '' (reference behavior, dask-with-dataframe-[2].py:77-78).
    assert one(spark, extract_section("v", "NOPE", "Laporan arus kas"), text) == ""
    assert one(spark, extract_section("v", "Laporan laba rugi", "NOPE"), text) == ""


def test_parse_statement_line(spark):
    df = spark.createDataFrame(
        [("Pendapatan bersih 1,234.56 net revenue",), ("no numbers here",), ("Beban 99",)],
        "line string",
    )
    rows = parse_statement_line(df, "line").select("item", "value", "rest").collect()
    # Non-matching line dropped (dask-with-dataframe-[2].py:92).
    assert len(rows) == 2
    assert rows[0]["item"] == "Pendapatan bersih"
    assert rows[0]["value"] == "1,234.56"
    assert rows[0]["rest"] == "net revenue"


def test_indo_date_and_quarter(spark):
    t = "Laporan posisi keuangan Pada Tanggal 31 Desember 2023 dan 2022 tersaji"
    assert str(one(spark, parse_indo_date(F.col("v")), t)) == "2023-12-31"
    assert one(spark, quarter_from_indo_text("v"), t) == "Q4 2023"
    assert one(spark, quarter_from_indo_text("v"), "Pada Tanggal 1 Maret 2024") == "Q1 2024"
    # Intended semantics where the reference crashed (§2A #17 NameError,
    # #19 invalid regex): no date → 'Unknown', never an exception.
    assert one(spark, quarter_from_indo_text("v"), "no date here") == "Unknown"
    assert one(spark, quarter_from_indo_text("v"), "Pada Tanggal 31 Foo 2023") == "Unknown"
    assert one(spark, quarter_from_indo_text("v"), None) == "Unknown"


def test_truncate_names(spark):
    df = spark.createDataFrame([(1, 2)], ["a" * 80, "b"])
    out = truncate_names(df, 64)
    assert out.columns == ["a" * 64, "b"]


def test_exact_group_sums_matches_dsum(spark):
    """Two-level scaled-long path must reproduce the pure-decimal dsum
    results bit-for-bit on exact-decimal data, across a repartition (i.e.
    independent of partitioning)."""
    from dwh_with_dask_spark.functions.numeric import dsum, exact_group_sums

    df = (
        spark.range(0, 20000, 1, 8)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.round(F.rand(seed=11) * 100000, 2)).alias("price"),
            (F.round(F.rand(seed=12), 2)).alias("disc"),
        )
        .withColumn("prod", F.round(F.col("price") * F.col("disc"), 4))
    )
    ref = (
        df.groupBy("g")
        .agg(
            dsum("price", 2).alias("sp"),
            dsum("prod", 4).alias("spr"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    fast = exact_group_sums(
        df.repartition(5),
        keys=["g"],
        measures={"sp": (F.col("price"), 2), "spr": (F.col("prod"), 4)},
        count_alias="n",
    )
    a = {r["g"]: (r["sp"], r["spr"], r["n"]) for r in ref.collect()}
    b = {r["g"]: (r["sp"], r["spr"], r["n"]) for r in fast.collect()}
    assert a == b


def test_flesch_reading_ease_known_values(spark):
    from dwh_with_dask_spark.operators.textstats import (
        flesch_reading_ease,
        syllable_count,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "The cat sat on the mat."),   # 6 words, 1 sentence, 6 syls
        (2, ""),                          # wordless -> NULL
        (3, "unbelievable"),              # 1 word, floor 1 sentence, 5 groups
    ]
    d = spark.createDataFrame(rows, "id long, text string")
    out = {
        r.id: (r.syls, r.flesch)
        for r in d.select(
            "id",
            syllable_count("text").alias("syls"),
            flesch_reading_ease("text").alias("flesch"),
        ).collect()
    }
    assert out[1][0] == 6
    expected1 = 206.835 - 1.015 * (6 / 1) - 84.6 * (6 / 6)
    assert abs(out[1][1] - expected1) < 1e-9
    assert out[2] == (0, None)
    # 'unbelievable' -> u/e/ie/a/e vowel groups = 5
    assert out[3][0] == 5
    expected3 = 206.835 - 1.015 * 1 - 84.6 * 5
    assert abs(out[3][1] - expected3) < 1e-9


def test_nfc_normalize_matches_duckdb_on_decomposed_text(spark, tmp_path):
    """Composed vs decomposed fixtures — the behavior the ASCII corpus
    cannot exercise. Spark (unicodedata NFC) must byte-match DuckDB's
    nfc_normalize."""
    import duckdb

    from dwh_with_dask_spark.functions.text import nfc_normalize

    texts = [
        "caf\u00e9",            # precomposed e-acute
        "cafe\u0301",           # e + combining acute -> must compose
        "A\u030angstr\u00f6m",  # A + combining ring above
        "\uac00",               # Hangul syllable (already NFC)
        "\u1100\u1161",        # Hangul jamo pair -> composes
        "plain ascii",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.nfc
        for r in d.select(
            "doc_id", nfc_normalize("text").alias("nfc")
        ).collect()
    }
    con = duckdb.connect()
    want = {
        i: con.sql(f"SELECT nfc_normalize(?)", params=[t]).fetchone()[0]
        for i, t in rows
    }
    assert got == want
    assert got[1] == got[0] == "caf\u00e9"  # decomposed composed
    assert got[4] == "\uac00"             # jamo composed

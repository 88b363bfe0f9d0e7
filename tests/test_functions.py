"""Scalar-function unit tests (functions/scalar.py)."""

from pyspark.sql import functions as F

from big_data_analysis_for_stock_market_data_spark import functions as fns


def test_json_extract_types(spark):
    df = spark.createDataFrame(
        [('{"k": 7, "s": "x", "f": 1.5}',), ("not json",), (None,)], ["props"]
    )
    out = df.select(
        fns.json_long("props", "$.k").alias("k"),
        fns.json_str("props", "$.s").alias("s"),
        fns.json_double("props", "$.f").alias("f"),
    ).collect()
    assert (out[0].k, out[0].s, out[0].f) == (7, "x", 1.5)
    assert out[1] == (None, None, None)  # malformed -> nulls, no error
    assert out[2] == (None, None, None)


def test_normalize_ws_and_tokenize(spark):
    df = spark.createDataFrame([("  Hello   World\tAgain ",)], ["t"])
    row = df.select(
        fns.normalize_ws("t").alias("n"), fns.tokenize("t").alias("toks")
    ).first()
    assert row.n == "Hello World Again"
    assert row.toks == ["hello", "world", "again"]


def test_first_word(spark):
    df = spark.createDataFrame([("alpha beta",), ("", )], ["t"])
    got = [r.w for r in df.select(fns.first_word("t").alias("w")).collect()]
    assert got == ["alpha", ""]


def test_with_date_parts(spark):
    df = spark.createDataFrame(
        [("2024-03-10 15:30:00",)], ["ts"]
    ).select(F.col("ts").cast("timestamp"))
    row = fns.with_date_parts(df, "ts").first()
    assert (row.year, row.month, row.day, row.hour) == (2024, 3, 10, 15)
    assert row.dayofweek == 1  # 2024-03-10 is a Sunday; Spark: Sunday=1
    assert str(row.date_only) == "2024-03-10"

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


def test_variant_typed_extraction_and_try_null(spark):
    df = spark.createDataFrame(
        [(1, '{"a": {"b": 5}, "xs": [10, 20]}'), (2, "not json"), (3, None)],
        "id long, js string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            F.try_variant_get(F.try_parse_json("js"), "$.a.b", "long").alias("ab"),
            F.try_variant_get(F.try_parse_json("js"), "$.xs[1]", "long").alias("x1"),
            F.try_variant_get(F.try_parse_json("js"), "$.a", "long").alias("bad"),
        ).collect()
    }
    assert (out[1]["ab"], out[1]["x1"]) == (5, 20)
    assert out[1]["bad"] is None          # wrong-type extraction -> null
    assert out[2]["ab"] is None           # malformed JSON -> null (try_)
    assert out[3]["ab"] is None


def test_python_udtf_chunker_grid_and_degenerate_inputs(spark):
    from big_data_analysis_for_stock_market_data_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, None)], "doc_id long, txt string"
    )
    df.createOrReplaceTempView("udtf_t")
    rows = spark.sql(
        "SELECT doc_id, chunk_id, chunk FROM udtf_t, LATERAL chunker(txt, 4)"
    ).collect()
    got = sorted((r.doc_id, r.chunk_id, r.chunk) for r in rows)
    # empty and null texts emit no rows; tail chunk is ragged
    assert got == [(1, 0, "abcd"), (1, 1, "efgh"), (1, 2, "ij")]
    # the plan must use the Arrow UDTF evaluator, not BatchEvalPython
    plan = (
        spark.sql("SELECT * FROM udtf_t, LATERAL chunker(txt, 4)")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPythonUDTF" in plan


def test_bitmap_distinct_key_zero_and_bucket_boundary(spark):
    # bitmap_bit_position(x) = (x-1) % 32768, so key 0 maps to -1 and is
    # silently dropped by bitmap_construct_agg, and two keys 32768 apart
    # collide on the same bit unless leaves also group by
    # bitmap_bucket_number. The mergeable layout (shift +1, bucketed
    # leaves, OR-merge per bucket, SUM of per-bucket counts) must count
    # exactly like COUNT(DISTINCT) on both hazards.
    rows = [
        ("a", "s1", 0),          # the dropped-key hazard
        ("a", "s1", 5),
        ("a", "s2", 5),          # same key via another leaf: OR-merge dedups
        ("a", "s2", 5 + 32768),  # the bucket-collision hazard
        ("b", "s1", 32768),
        ("b", "s1", 2 * 32768),
        ("b", "s2", 3),
    ]
    df = spark.createDataFrame(rows, ["grp", "sub", "key"])
    df.createOrReplaceTempView("__bm_test")
    got = {
        r.grp: r.n
        for r in spark.sql("""
            WITH leaf AS (
              SELECT grp, sub, bitmap_bucket_number(key + 1) AS bkt,
                     bitmap_construct_agg(bitmap_bit_position(key + 1)) AS bm
              FROM __bm_test
              GROUP BY grp, sub, bitmap_bucket_number(key + 1)
            ),
            merged AS (
              SELECT grp, bkt, bitmap_or_agg(bm) AS bm
              FROM leaf GROUP BY grp, bkt
            )
            SELECT grp, CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n
            FROM merged GROUP BY grp
        """).collect()
    }
    assert got == {"a": 3, "b": 3}

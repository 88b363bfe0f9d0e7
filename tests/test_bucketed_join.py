"""Bucketed co-located joins (SURVEY.md §7): two tables bucketed on the
join key must join WITHOUT a shuffle — the mechanism that amortizes one
write-time shuffle across every future join at 100 TB."""

import pytest
from pyspark.sql import functions as F

from big_data_analysis_for_stock_market_data_spark.plans import inspect as P
from big_data_analysis_for_stock_market_data_spark.sources.io import write_parquet


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v1")
    )
    dims = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    )
    write_parquet(
        facts, str(base / "facts"), bucket_by=(8, ["k"]), table_name="bt_facts"
    )
    write_parquet(
        dims, str(base / "dims"), bucket_by=(8, ["k"]), table_name="bt_dims"
    )
    yield "bt_facts", "bt_dims"
    spark.sql("DROP TABLE IF EXISTS bt_facts")
    spark.sql("DROP TABLE IF EXISTS bt_dims")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    fname, dname = bucketed_tables
    f = spark.table(fname)
    d = spark.table(dname)
    # force the non-broadcast path so bucketing (not broadcast) is what
    # eliminates the exchange
    joined = f.hint("merge").join(d, "k")
    assert P.count_shuffles(joined) == 0
    assert joined.count() == 1_000


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    fname, _ = bucketed_tables
    f = spark.table(fname)
    agg = f.groupBy("k").agg(F.sum("v1").alias("s"))
    # groupBy on the bucket key reuses the bucketing: no exchange
    assert P.count_shuffles(agg) == 0

"""Partitioned parquet writes and partition pruning (SURVEY.md §4, §7):
a hive-partitioned sink plus a filtered read must prune directories at
plan time — the mechanism that makes day/symbol-partitioned 100 TB tables
readable in seconds."""

from pyspark.sql import functions as F

from big_data_analysis_for_stock_market_data_spark.plans import inspect as P
from big_data_analysis_for_stock_market_data_spark.sources.io import (
    read_parquet,
    write_parquet,
)


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("day"),
        (F.col("id") * 1.5).alias("v"),
    )
    path = str(tmp_path / "partitioned")
    write_parquet(df, path, partition_by=["day"])

    back = read_parquet(spark, path).filter(F.col("day") == 3)
    plan = P.explain_str(back, "formatted")
    # the partition filter must be a directory-level prune, not a row filter
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == df.filter(F.col("day") == 3).count()


def test_partition_column_roundtrip_values(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("k"), (F.col("id") + 0.5).alias("v")
    )
    path = str(tmp_path / "rt")
    write_parquet(df, path, partition_by=["k"])
    back = read_parquet(spark, path)
    got = {(r.id, r.k, r.v) for r in back.collect()}
    want = {(r.id, r.k, r.v) for r in df.collect()}
    assert got == want

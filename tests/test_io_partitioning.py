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


def test_nanos_normalized_without_declared_schema(spark, tmp_path):
    # ADVICE r2: schema=None reads must not leak raw epoch-nanos longs —
    # the footer carries TIMESTAMP(NANOS) and the reader normalizes from it
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "nanos")
    table = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array(
                [1_700_000_000_123_456_789, 1_700_000_001_000_000_000],
                type=pa.timestamp("ns"),
            ),
        }
    )
    pq.write_table(table, path + ".parquet")

    back = read_parquet(spark, path + ".parquet")
    assert dict(back.dtypes)["ts"] == "timestamp"
    got = {r.id: r.ts for r in back.collect()}
    # nanos floor to micros
    assert got[1].microsecond == 123456


def test_pre_epoch_nanos_floor_to_micros(spark, tmp_path):
    # ADVICE r2: div truncates toward zero; pre-1970 nanos must floor
    # (-1ns -> -1µs) to match DuckDB/Arrow conversion semantics
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "preepoch.parquet")
    table = pa.table(
        {
            "id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array([-1, -999, 1], type=pa.timestamp("ns")),
        }
    )
    pq.write_table(table, path)

    back = read_parquet(spark, path)
    got = {r.id: r.ts for r in back.collect()}
    epoch = dt.datetime(1970, 1, 1)
    # Arrow floor semantics: -1ns and -999ns both land in the -1µs bucket
    assert got[1] == epoch - dt.timedelta(microseconds=1)
    assert got[2] == epoch - dt.timedelta(microseconds=1)
    assert got[3] == epoch


def test_compact_write_targets_file_size(spark, tmp_path):
    from big_data_analysis_for_stock_market_data_spark.sources.io import (
        compact_write, read_parquet,
    )
    from pyspark.sql import functions as F

    df = spark.range(200_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("payload")
    )
    out = str(tmp_path / "compacted")
    # ~0.5 MB target on ~7 MB of data -> more than one, fewer than 100 files
    n = compact_write(df, out, target_file_mb=1)
    import os
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n and 1 < n < 100
    assert read_parquet(spark, out).count() == 200_000

    # empty frame still writes a valid (single-file) dataset
    out2 = str(tmp_path / "empty")
    assert compact_write(df.filter("id < 0"), out2) == 1
    assert read_parquet(spark, out2).count() == 0


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    from big_data_analysis_for_stock_market_data_spark.sources.io import write_parquet
    from big_data_analysis_for_stock_market_data_spark.plans import inspect as P
    from pyspark.sql import functions as F

    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_parquet(
            df, str(tmp_path / name), bucket_by=(8, ["k"]), table_name=name
        )
    joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
    try:
        # co-located bucketed join: zero exchanges in the physical plan —
        # the property that makes bucketing worth the write-side sort
        assert P.count_shuffles(joined) == 0
        assert joined.count() == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_to_pandas_sample_is_bounded(spark):
    from big_data_analysis_for_stock_market_data_spark.sources.io import to_pandas_sample

    pdf = to_pandas_sample(spark.range(1_000_000), max_rows=500)
    assert len(pdf) == 500  # driver export can never exceed the cap


def test_zorder_write_tightens_file_stats_on_both_dims(spark, tmp_path):
    """Z-order clustering: after the write, each output file's min-max
    range on EACH clustering column covers a small fraction of the global
    range (that fraction is what a selective filter reads); a plain write
    leaves every file spanning ~the full range on at least one column.
    Content must survive the rewrite exactly."""
    import glob

    import pyarrow.parquet as papq

    from big_data_analysis_for_stock_market_data_spark.queries import load
    from big_data_analysis_for_stock_market_data_spark.sources.io import zorder_write

    li = load(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zdir = str(tmp_path / "zordered")
    zorder_write(li, zdir, cols=["l_partkey", "l_suppkey"], n_files=16,
                 bits_per_col=8)

    spans = {"l_partkey": [], "l_suppkey": []}
    glo = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    rng = {"l_partkey": glo[1] - glo[0], "l_suppkey": glo[3] - glo[2]}
    files = glob.glob(f"{zdir}/part-*.parquet")
    assert len(files) >= 8
    for f in files:
        md = papq.read_metadata(f)
        for col in spans:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            spans[col].append((hi - lo) / rng[col])
    # every file tight on both dimensions simultaneously — the z-order
    # guarantee a single-column sort cannot give
    for col, fr in spans.items():
        assert sum(fr) / len(fr) < 0.55, (col, fr)

    got = spark.read.parquet(zdir)
    assert got.count() == li.count()
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, li.collect()))
    assert a == b


def test_python_datasource_partitioned_and_deterministic(spark):
    """Custom Python DataSource (Spark 4 API): content is a pure function
    of row id — changing the partition count changes task boundaries but
    never the data — and the scan parallelism equals n_parts."""
    from big_data_analysis_for_stock_market_data_spark.sources import pyds

    pyds.register(spark)

    def read(n_parts):
        return (
            spark.read.format("synthetic_ticks")
            .option("n_rows", 100)
            .option("n_parts", n_parts)
            .load()
        )

    a = sorted(map(tuple, read(4).collect()))
    b = sorted(map(tuple, read(7).collect()))
    assert a == b and len(a) == 100
    assert read(4).rdd.getNumPartitions() == 4
    # spot-check the determinism contract used by the SQL oracle
    i = 42
    assert a[i] == (i, f"s{i % 7}", 1_000_000_000 + i * 1_000_003, (i * 37) % 9973)


def test_observed_write_audits_in_one_pass(spark, tmp_path):
    """observed_write: the write action itself yields audit metrics —
    values must equal an independent recomputation, and the written
    files must round-trip."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from big_data_analysis_for_stock_market_data_spark.sources.io import observed_write

    df = spark.createDataFrame(
        [Row(k=i, v=float(i) if i % 3 else None) for i in range(30)]
    )
    out = str(tmp_path / "audited")
    got = observed_write(
        df, out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
            "sum_k": F.sum("k"),
        },
    )
    assert got == {"n_rows": 30, "n_null_v": 10, "sum_k": sum(range(30))}
    assert spark.read.parquet(out).count() == 30


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides written bucketBy(4, k) + sortBy(k): the equi-join on k
    must read bucket i against bucket i with NO Exchange anywhere in the
    joined plan — the co-located-join contract that makes repeated fact/
    dim joins shuffle-free at 100 TB."""
    left = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(300).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    for tbl in ("t_bkt_left", "t_bkt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_parquet(left, str(tmp_path / "l"), bucket_by=(4, ["k"]),
                  table_name="t_bkt_left")
    write_parquet(right, str(tmp_path / "r"), bucket_by=(4, ["k"]),
                  table_name="t_bkt_right")
    l, r = spark.table("t_bkt_left"), spark.table("t_bkt_right")
    # at test scale the planner would rather broadcast the 300-row side —
    # disable broadcast to expose the large-x-large shape the bucketed
    # layout exists for (at 100 TB neither side is broadcastable)
    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        joined = l.join(r, "k")
        plan = P.explain_str(joined, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 300
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

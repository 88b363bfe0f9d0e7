"""Readers/writers for the engine (SURVEY.md §2.1).

Scale notes
-----------
- ``read_parquet``/``read_csv`` accept any Hadoop-FS URI (local, ``gs://``,
  ``s3a://``, ``hdfs://``) — the reference read from GCS buckets
  (``G_2_rf_nordd.py:24``); nothing here is path-scheme-specific.
- Explicit schemas by default: CSV ``inferSchema`` triggers an extra full
  scan of the input (fatal at 100 TB); parquet schemas still get validated
  against the declared StructType so type drift fails fast.
- ``write_parquet`` supports ``partition_by`` (enables partition pruning +
  dynamic partition pruning downstream) and ``bucket_by`` (enables
  shuffle-free co-located joins on the bucket key).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_analysis_for_stock_market_data_spark.schema import TESTDATA_SCHEMAS

TABLE_NAMES: tuple[str, ...] = tuple(TESTDATA_SCHEMAS)


def _nanos_to_timestamp(name: str):
    """Epoch-nanos LongType -> microsecond TimestampType, floor semantics.

    Integer arithmetic throughout (float division loses precision —
    epoch-nanos exceed 2^53). Spark's ``div`` truncates toward zero, which
    would round pre-1970 nanos UP by 1µs versus the floor conversion DuckDB
    and Arrow use (-1ns must become -1µs, not 0µs); subtracting ``pmod``
    first makes the operand an exact multiple of 1000, so ``div`` == floor.
    """
    expr = F.expr(f"(`{name}` - pmod(`{name}`, 1000L)) div 1000L")
    return F.timestamp_micros(expr)


def _footer_nano_columns(path: str) -> set[str]:
    """Column names stored as parquet TIMESTAMP(NANOS), read driver-side
    from the file footer (pyarrow). Uses the PHYSICAL parquet schema, not
    the arrow view: legacy INT96 timestamps surface in arrow as
    ``timestamp[ns]`` too, but Spark reads INT96 natively as
    TimestampType — only true INT64 + Timestamp(nanoseconds) columns need
    the long-read-and-convert path. Best-effort: schemes pyarrow cannot
    open (``s3a://`` etc. without fsspec) yield an empty set — callers on
    such stores should pass an explicit ``schema`` instead."""
    try:
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        local = path[len("file://"):] if path.startswith("file://") else path
        frag = next(iter(pads.dataset(local, format="parquet").get_fragments()))
        sch = pq.ParquetFile(frag.path).schema
        nanos = set()
        for i in range(len(sch.names)):
            col = sch.column(i)
            if (
                col.physical_type == "INT64"
                and "nanoseconds" in str(col.logical_type)
            ):
                nanos.add(col.path)
        return nanos
    except Exception:
        return set()


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Parquet scan. ``columns`` prunes the read schema at the scan
    (check ``ReadSchema`` in ``.explain("formatted")``).

    Self-sufficient on vanilla SparkSessions (e.g. a driver harness):

    - Parquet TIMESTAMP(NANOS): Spark rejects the physical type INT64
      (TIMESTAMP(NANOS)) unless ``spark.sql.legacy.parquet.nanosAsLong`` is
      set, so the reader sets the runtime SQL conf itself instead of relying
      on session.py defaults. The column then arrives as LongType
      epoch-nanos and is normalized to microsecond TimestampType — via the
      declared ``schema`` when given, else by reading the parquet footer —
      so a raw epoch-nanos long can never flow downstream silently.
    - Session timezone: engine semantics are UTC (matching the reference
      data and the DuckDB oracle); date-deriving expressions
      (``to_date(ts)``, day grouping) must not depend on the host JVM's
      zone. Pinned here for the same vanilla-session reason.

    Both confs are deliberate session-wide mutations; they match
    ``session.py`` ``ENGINE_DEFAULTS`` so engine-built sessions see no
    change at all.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    ntz_conf = "spark.sql.parquet.inferTimestampNTZ.enabled"
    if spark.conf.get(ntz_conf, "true") != "false":
        spark.conf.set(ntz_conf, "false")
    df = spark.read.parquet(path)
    # Belt-and-braces: if NTZ still leaked through (conf snapshotted by an
    # earlier plan), collapse it to the engine's single timestamp type.
    # Session tz is UTC, so the cast reinterprets the same wall-clock
    # instant — no value shift.
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
    actual = {f.name: f.dataType for f in df.schema.fields}
    if schema is not None:
        declared = {f.name: f.dataType for f in schema.fields}
        missing = set(declared) - set(actual)
        if missing:
            raise ValueError(f"{path}: missing declared columns {sorted(missing)}")
        nano_cols = {
            name
            for name, want in declared.items()
            if isinstance(want, T.TimestampType)
            and isinstance(actual.get(name), T.LongType)
        }
    else:
        nano_cols = {
            name
            for name in _footer_nano_columns(path)
            if isinstance(actual.get(name), T.LongType)
        }
    for name in sorted(nano_cols):
        df = df.withColumn(name, _nanos_to_timestamp(name))
    if columns:
        df = df.select(*columns)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    sep: str = ",",
    infer_schema: bool = False,
) -> DataFrame:
    """CSV ingest (reference S1: ``spark.read.csv(path, header=True,
    inferSchema=True)`` at ``G_2_rf_nordd.py:24``). Engine default is an
    explicit schema — pass ``infer_schema=True`` only for exploration; it
    costs a second full pass over the input."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    else:
        raise ValueError("read_csv requires a schema unless infer_schema=True")
    return reader.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    bucket_by: tuple[int, Sequence[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Parquet sink (replaces reference pickle sink S3,
    ``G_2_data_exploration.ipynb cell 45``).

    ``partition_by``: hive-style directory partitioning — readers prune
    partitions for free. ``bucket_by=(n, cols)`` requires ``table_name``
    (bucketing is a metastore concept) and makes equi-joins on the bucket
    columns shuffle-free.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        if not table_name:
            raise ValueError("bucket_by requires table_name (saveAsTable)")
        n, cols = bucket_by
        writer.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(
            table_name
        )
        return
    writer.parquet(path)


def compact_write(
    df: DataFrame,
    path: str,
    target_file_mb: int = 128,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    probe_rows: int = 1_000,
) -> int:
    """Write parquet with output files sized near ``target_file_mb`` — the
    small-files guard for pipeline sinks (10k tiny files make the NEXT
    job's scan planning and open() overhead the bottleneck; one giant file
    serializes downstream parallelism).

    The bytes/row estimate comes from an actual compressed parquet probe
    (``probe_rows`` rows written to a temp dir and stat'ed) — schema-based
    guesses miss encoding/compression by 5-50x. Cost: one bounded probe
    write + one count + one full write; returns the partition count used.

    With ``partition_by`` the file count applies per directory partition
    on average — size skew across partition values is the caller's salt to
    add (see operators/skew.py).
    """
    import shutil
    import tempfile

    n_rows = df.count()
    if n_rows == 0:
        write_parquet(df, path, mode=mode, partition_by=partition_by)
        return 1
    probe_dir = tempfile.mkdtemp(prefix="engine_compact_probe_")
    try:
        df.limit(probe_rows).coalesce(1).write.mode("overwrite").parquet(
            probe_dir
        )
        probe_bytes = sum(
            os.path.getsize(os.path.join(probe_dir, f))
            for f in os.listdir(probe_dir)
            if f.endswith(".parquet")
        )
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)
    sampled = min(n_rows, probe_rows)
    est_total = probe_bytes * (n_rows / max(sampled, 1))
    n_parts = max(1, round(est_total / (target_file_mb * 1024 * 1024)))
    write_parquet(
        df.repartition(n_parts), path, mode=mode, partition_by=partition_by
    )
    return n_parts


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: Sequence[str] | None = None,
) -> dict[str, DataFrame]:
    """Load the driver test tables from ``sf_dir`` (TESTDATA.md)."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        out[name] = read_parquet(spark, path, schema=TESTDATA_SCHEMAS.get(name))
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (the reference's
    ``createOrReplaceTempView('stock_data')`` idiom, ``G_2_rf_nordd.py:32``)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def to_pandas_sample(df: DataFrame, max_rows: int = 100_000):
    """Bounded driver export (reference S6 ``df.toPandas()`` collected the
    whole table, ``G_2_data_exploration.ipynb cell 12``). The engine caps the
    export so a 100 TB table can never be pulled to the driver."""
    return df.limit(max_rows).toPandas()


def zorder_value(cols: Sequence, bits_per_col: int = 10):
    """Z-value (Morton code) column: each input bucket id contributes its
    bits interleaved, so rows close in EVERY dimension get close z-values.
    Inputs must already be integer bucket ids in [0, 2^bits_per_col)."""
    z = F.lit(0).cast("long")
    k = len(cols)
    for i, c in enumerate(cols):
        cl = F.col(c) if isinstance(c, str) else c
        cl = cl.cast("long")
        for j in range(bits_per_col):
            bit = F.shiftright(cl, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits_per_col: int = 10,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet write: bucket each clustering column by
    range (boundaries from a 2^bits quantile sketch — driver sees only the
    boundary list, control-plane), interleave the bucket bits into a
    Morton z-value, range-partition + sort the output by it.

    Why: parquet scans skip files/row-groups whose min-max stats exclude
    the predicate. A sort by one column gives perfect skipping on that
    column and none on others; z-order gives GOOD skipping on every
    clustering column simultaneously — at 100 TB, a selective filter on
    any clustered dimension reads a small fraction of files instead of all
    of them. One quantile probe + one range-shuffle + local sorts."""
    qcols = list(cols)
    n_buckets = 1 << bits_per_col
    probes = [float(i) / n_buckets for i in range(1, n_buckets)]
    bucketed = df
    bucket_names = []
    for c in qcols:
        bounds = df.approxQuantile(c, probes, 0.001)
        # strictly increasing boundary list (duplicates collapse buckets)
        uniq = sorted(set(bounds))
        arr = F.array(*[F.lit(b).cast("double") for b in uniq])
        # bucket id = count of boundaries <= value (0..len(uniq))
        bid = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + (F.col(c).cast("double") >= b).cast("int"),
        )
        # rescale to the FULL bit width: a low-cardinality column (few
        # distinct boundaries) must still occupy high interleave bits, or
        # the wider column's bits dominate the z-value and the narrow
        # column gets no clustering at all
        scaled = F.floor(bid * (n_buckets - 1) / F.lit(len(uniq))).cast("long")
        name = f"__zb_{c}"
        bucketed = bucketed.withColumn(name, scaled)
        bucket_names.append(name)
    z = zorder_value(bucket_names, bits_per_col)
    out = (
        bucketed.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *bucket_names)
    )
    out.write.mode(mode).parquet(path)


def observed_write(
    df: DataFrame,
    path: str,
    metrics: "dict[str, object]",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> dict:
    """Write parquet while collecting audit metrics IN THE SAME PASS
    (``df.observe`` + ``Observation``): row counts, null counts, value
    sums arrive as a side effect of the write — no second scan. At 100 TB
    the difference between "write, then re-scan to audit" and this is a
    full extra pass over the table; Spark's observation metrics piggyback
    on the tasks the write already runs.

    ``metrics`` maps name -> aggregate Column (e.g. ``F.count(F.lit(1))``,
    ``F.sum(...)``). Returns the observed values as a dict. Metrics are
    exactly-once per action — retried/speculative tasks do not
    double-count (Spark's AccumulatorV2 guarantee for observations)."""
    from pyspark.sql import Observation

    obs = Observation("write_audit")
    audited = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    w = audited.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return obs.get


def write_binary_files(
    df: DataFrame,
    out_dir: str,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    suffix: str = ".bin",
) -> None:
    """One file per row, written FROM THE EXECUTORS (foreachPartition) —
    the standard one-object-per-asset layout multimodal corpora ship as,
    and the shape ``spark.read.format("binaryFile")`` expects back. Each
    task writes only its own partition's blobs; nothing visits the
    driver. In the sandbox ``out_dir`` is a local path shared by the
    single JVM; on a cluster it is an object-store/DFS URI (same code —
    open() becomes the FS client of the deployment)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows) -> None:
        for r in rows:
            p = os.path.join(out_dir, f"{r[id_col]}{suffix}")
            with open(p, "wb") as f:
                f.write(bytes(r[payload_col]))

    df.select(id_col, payload_col).foreachPartition(write_part)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str = "*.bin",
) -> DataFrame:
    """Spark's ``binaryFile`` source: (path, modificationTime, length,
    content) per file, with directory parallelism and pathGlobFilter
    pushdown — the scan side of the multimodal blob pipeline."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )

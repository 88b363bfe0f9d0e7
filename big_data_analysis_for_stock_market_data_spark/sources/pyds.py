"""Custom Python data source (Spark 4 DataSource API, SPARK-44076).

The reference ingests only files it finds in a bucket; a real engine also
needs FIRST-CLASS custom sources — connectors to systems Spark has no
built-in reader for. Spark 4's Python DataSource API is the sanctioned
extension point: declare the schema, enumerate ``partitions()`` (the unit
of read parallelism — each becomes one task, so a 100 TB source splits
into thousands of these), and implement ``read(partition)`` as a plain
row generator executed ON THE EXECUTORS. No JVM code, no driver
bottleneck: the driver only plans partitions; every byte of data is
produced executor-side.

``SyntheticTicksDataSource`` is the reference implementation: a
deterministic OHLC tick generator (id-arithmetic payloads — which is what
makes an external-source scan SQL-oracle-checkable: DuckDB replays the
generator as arithmetic). Options:

- ``n_rows``  total rows (default 1000)
- ``n_parts`` read partitions (default 8)

Determinism contract: row ``i`` (0-based, global) carries
``symbol = 's' || (i % 7)``, ``px_nano = 1_000_000_000 + i * 1_000_003``,
``volume = (i * 37) % 9973``. Partition p covers the contiguous id range
``[p * ceil(n/parts), min(n, (p+1) * ceil(n/parts)))`` — re-planning with
a different partition count changes task boundaries but never content.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _TicksReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = max(1, int(options.get("n_parts", 8)))

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)  # ceil div
        return [
            _RangePartition(lo, min(self.n_rows, lo + step))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        # runs on an executor; yields plain tuples matching the schema
        for i in range(partition.start, partition.end):
            yield (
                i,
                f"s{i % 7}",
                1_000_000_000 + i * 1_000_003,
                (i * 37) % 9973,
            )


class SyntheticTicksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self):
        return T.StructType(
            [
                T.StructField("tick_id", T.LongType()),
                T.StructField("symbol", T.StringType()),
                T.StructField("px_nano", T.LongType()),
                T.StructField("volume", T.LongType()),
            ]
        )

    def reader(self, schema) -> DataSourceReader:
        return _TicksReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticTicksDataSource)

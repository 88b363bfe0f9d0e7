"""Sources & sinks (SURVEY.md §2.1 S1-S8, re-expressed Spark-first).

Parquet is the engine's native format (columnar, splittable, schema-carrying,
predicate-pushdown-able); CSV is kept as an ingest path because the reference
reads CSV (``G_2_rf_nordd.py:24``). The reference's pickle RDD persistence
(``G_2_data_exploration.ipynb cells 45-48``) is replaced by parquet
round-trips — pickle files are neither columnar nor splittable and pay
per-row Python serialization.
"""

from big_data_analysis_for_stock_market_data_spark.sources.io import (
    load_tables,
    read_csv,
    read_parquet,
    register_views,
    to_pandas_sample,
    write_parquet,
)

__all__ = [
    "load_tables",
    "read_csv",
    "read_parquet",
    "register_views",
    "to_pandas_sample",
    "write_parquet",
]

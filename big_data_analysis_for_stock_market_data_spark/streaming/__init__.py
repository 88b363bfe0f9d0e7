"""Structured Streaming surface (SURVEY.md §7 step 7).

The reference has no streaming code — its slides list "time-series
buffering" and sliding windows as future work (``G_2_presentation.pdf
p.31-34``). The engine ships that capability: event-time windowed
aggregates with watermarks, streaming deduplication, and a stateful
streaming EMA (the streaming twin of ``operators.indicators``' recursive
family) built on ``applyInPandasWithState``.

Batch/stream parity is part of the contract: each op is expressed so the
same transformation applied to a static DataFrame gives the same result a
full replay of the stream gives — tests assert it, and the query registry
runs the streaming ops under an ``availableNow`` trigger against the same
parquet the batch oracle reads.
"""

from big_data_analysis_for_stock_market_data_spark.streaming.ops import (
    ROCKSDB_STATE_CONFIGS,
    chained_windowed_rollup,
    rocksdb_state,
    read_stream_parquet,
    run_to_memory,
    run_to_parquet,
    run_upsert_to_parquet,
    session_agg,
    stream_dedup,
    stream_static_join,
    stream_stream_interval_join,
    streaming_ema,
    streaming_running_totals,
    windowed_agg,
)

__all__ = [
    "ROCKSDB_STATE_CONFIGS",
    "chained_windowed_rollup",
    "rocksdb_state",
    "read_stream_parquet",
    "run_to_memory",
    "run_to_parquet",
    "run_upsert_to_parquet",
    "session_agg",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_interval_join",
    "streaming_ema",
    "streaming_running_totals",
    "windowed_agg",
]

"""Window operators: label construction and rolling frames (SURVEY.md §2.5).

The reference builds its binary label with an **unpartitioned** window —
``LAG(high) OVER (ORDER BY date)`` (``G_2_rf_nordd.py:36``) — which Spark
executes by moving every row into a single partition (SURVEY.md §2.9-Q3):
fine at 671 K rows, fatal at 100 TB. Every operator here therefore takes a
``partition_by`` key (symbol, user, …). A global window remains available
explicitly via ``partition_by=None`` for small frames, but the engine warns
in the docstring rather than silently serializing the cluster.

Q1 (lag-vs-lead label bug): the reference's eight scripts alias
``LAG(high)`` — the *previous* row — as ``next_high`` and build the label
from it, while the notebook (cell 50) and the presentation (p.15) state the
intent is the *following* row's high. ``label_buy_sell`` implements the
intent (``mode='lead'``) and offers byte-compatible replication
(``mode='lag_parity'``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _ordered_window(
    order_by: str | Column,
    partition_by: str | Sequence[str] | None,
) -> WindowSpec:
    if partition_by is None:
        return Window.orderBy(order_by)
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    return Window.partitionBy(*partition_by).orderBy(order_by)


def label_buy_sell(
    df: DataFrame,
    value_col: str = "high",
    order_by: str = "date",
    partition_by: str | Sequence[str] | None = None,
    mode: str = "lead",
    out_col: str = "buy_or_sell",
) -> DataFrame:
    """Binary next-step label (reference W1/W3).

    ``mode='lead'``: label = 1 iff the *next* row's ``value_col`` exceeds the
    current one (the stated intent; ``G_2_data_exploration.ipynb cell 50``).
    ``mode='lag_parity'``: replicates the scripts' actual computation —
    ``LAG(value)`` compared against current (``G_2_rf_nordd.py:36-37``).
    """
    w = _ordered_window(order_by, partition_by)
    if mode == "lead":
        neighbor = F.lead(value_col, 1).over(w)
    elif mode == "lag_parity":
        neighbor = F.lag(value_col, 1).over(w)
    else:
        raise ValueError(f"mode must be 'lead' or 'lag_parity', got {mode!r}")
    return df.withColumn(
        out_col, F.when(neighbor > F.col(value_col), 1).otherwise(0)
    )


def with_lag(
    df: DataFrame,
    value_col: str,
    order_by: str,
    partition_by: str | Sequence[str] | None = None,
    offset: int = 1,
    out_col: str | None = None,
) -> DataFrame:
    """``LAG(value, offset)`` (reference W1/W2). The reference's W2 variant
    orders by a day-grain key over minute rows — ties make it
    nondeterministic (Q2); callers must pass a total ordering."""
    w = _ordered_window(order_by, partition_by)
    return df.withColumn(out_col or f"lag_{value_col}", F.lag(value_col, offset).over(w))


def with_lead(
    df: DataFrame,
    value_col: str,
    order_by: str,
    partition_by: str | Sequence[str] | None = None,
    offset: int = 1,
    out_col: str | None = None,
) -> DataFrame:
    """``LEAD(value, offset)`` (reference W3, notebook cell 50)."""
    w = _ordered_window(order_by, partition_by)
    return df.withColumn(
        out_col or f"lead_{value_col}", F.lead(value_col, offset).over(w)
    )


def rolling(
    df: DataFrame,
    value_col: str,
    order_by: str,
    partition_by: str | Sequence[str],
    window: int,
    funcs: dict[str, str] | None = None,
) -> DataFrame:
    """Trailing ``window``-row frame aggregates (reference W4 — absent in the
    reference because indicators arrived precomputed; the engine computes
    them natively). ``funcs`` maps output-column -> aggregate name
    (avg/sum/min/max/stddev/count). Frame: ``rowsBetween(-(window-1), 0)``.
    """
    funcs = funcs or {f"rolling_avg_{value_col}": "avg"}
    w = _ordered_window(order_by, partition_by).rowsBetween(-(window - 1), 0)
    out = df
    for out_col, fn in funcs.items():
        out = out.withColumn(out_col, getattr(F, fn)(value_col).over(w))
    return out

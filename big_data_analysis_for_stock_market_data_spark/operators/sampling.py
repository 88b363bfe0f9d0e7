"""Deterministic sampling operators for training-data pipelines.

Spark's built-in samplers (``df.sample``, ``df.sampleBy``, ``randomSplit``)
draw per-row Bernoulli variates from a partition-seeded RNG: the selected
set changes under repartitioning, AQE re-planning, and lineage
recomputation — and no external system can reproduce it. At 100 TB that
means a "sampled" training set that cannot be audited or rebuilt.

Everything here derives selection from a hash of the ROW KEY instead
(``ml.pipeline.split_bucket``'s md5 trick): a pure function of the data,
stable under any physical plan, reproducible byte-for-byte by any engine
with md5 — which is also what makes the registry oracles possible.

Scale notes: each operator is one narrow projection + filter (sampling)
or one window rank per group (top-k) — no extra shuffle beyond what the
semantics require, no driver participation.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from big_data_analysis_for_stock_market_data_spark.ml.pipeline import (
    DEFAULT_SEED,
    split_bucket,
)

BUCKETS = 10_000


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by the md5 bucket of
    ``key_col`` — the deterministic replacement for ``df.sample``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    b = split_bucket(F.col(key_col), seed, BUCKETS)
    return df.filter(b < int(fraction * BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    seed: int = DEFAULT_SEED,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the auditable twin of
    ``df.sampleBy`` (class rebalancing: downsample the majority class,
    keep the rare one). Strata absent from ``fractions`` get
    ``default_fraction``. One projection + filter; the fraction lookup is
    a CASE chain, not a join."""
    b = split_bucket(F.col(key_col), seed, BUCKETS)
    thresh: Column = F.lit(int(default_fraction * BUCKETS))
    for stratum, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1]")
        thresh = F.when(
            F.col(strata_col) == stratum, int(frac * BUCKETS)
        ).otherwise(thresh)
    return df.filter(b < thresh)


def topk_per_group(
    df: DataFrame,
    group_cols: str | Sequence[str],
    order_by: Column | Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group by an explicit ordering (quality filtering:
    'keep the k best documents per language'). ``order_by`` must be a
    total order within each group for determinism — pass a tie-breaker
    column (e.g. the row id) as the last sort key. One shuffle on the
    group key; rank is dropped unless ``rank_col`` is named."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    orders = [order_by] if isinstance(order_by, Column) else list(order_by)
    w = Window.partitionBy(*groups).orderBy(*orders)
    out = "__rank" if rank_col is None else rank_col
    ranked = df.withColumn(out, F.row_number().over(w)).filter(
        F.col(out) <= k
    )
    return ranked.drop("__rank") if rank_col is None else ranked

"""Incremental aggregate maintenance (partial-aggregate merge).

The 100 TB refresh problem: a daily revenue rollup over years of history
must not rescan history when one day of data arrives. The standard answer
is to keep the aggregate in *mergeable partial* form — (count, sum, min,
max) per key — so that

    state(base ∪ delta) == merge(state(base), state(delta))

holds exactly, and a refresh touches only the delta partitions plus the
(key-sized, tiny) stored state. AVG and other derived measures are computed
only at read time (``finalize``), never stored.

Exactness: sums are carried as DECIMAL(18,6) (integer arithmetic — addition
is associative and order-independent), so the merged state is bit-identical
to the direct aggregate regardless of how the input was split. This is the
same algebra Spark itself uses for map-side partial aggregation
(``partial_sum`` before the exchange); here it is exposed at the storage
boundary so the *sink* can be incremental too.

No reference equivalent (the reference recomputes everything per run, e.g.
the daily averages at G_2_rf_nordd_fe.py:47-49); this is north-star scale
surface.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def partial_agg(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    distinct: Sequence[str] = (),
) -> DataFrame:
    """Mergeable per-key state: n rows + (count, decimal sum, min, max) per
    measure + an HLL sketch per ``distinct`` column (Datasketches HLL —
    deterministic and merge-associative, so COUNT DISTINCT becomes
    incrementally maintainable too, which no exact per-key counter is).
    One hash aggregate (map-side combine) — the shuffle carries one state
    row per (input partition, key)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        aggs += [
            F.count(m).alias(f"cnt_{m}"),
            # SUM over decimal(18,6) widens to decimal(28,6); cast back so
            # the stored state has one fixed type from first write onward
            F.sum(F.col(m).cast(_DEC)).cast(_DEC).alias(f"sum_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
    for d in distinct:
        aggs.append(F.hll_sketch_agg(d).alias(f"hll_{d}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    measures: Sequence[str],
    distinct: Sequence[str] = (),
) -> DataFrame:
    """Merge any number of partial states: union + one hash aggregate.
    count/sum re-add, min/max re-extremize — all associative+commutative, so
    the merge is itself map-side combinable and the result is independent of
    how (and how many times) the input was split."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"cnt_{m}").alias(f"cnt_{m}"),
            F.sum(F.col(f"sum_{m}")).alias(f"sum_{m}"),
            F.min(f"min_{m}").alias(f"min_{m}"),
            F.max(f"max_{m}").alias(f"max_{m}"),
        ]
    for d in distinct:
        aggs.append(F.hll_union_agg(f"hll_{d}").alias(f"hll_{d}"))
    out = unioned.groupBy(*keys).agg(*aggs)
    # re-merged decimal sums widen per Spark's sum-of-decimal rule; pin the
    # stored-state type so state is stable under repeated merges
    sums = {f"sum_{m}" for m in measures}
    return out.select(
        *[
            F.col(c).cast(_DEC).alias(c) if c in sums else F.col(c)
            for c in out.columns
        ]
    )


def finalize(
    state: DataFrame, measures: Sequence[str], distinct: Sequence[str] = ()
) -> DataFrame:
    """Read-time view over the stored state: count/sum/min/max pass through,
    avg derived as exact-decimal sum / count, approx-distinct estimated
    from the stored HLL sketch (neither derived value is ever stored)."""
    cols = [c for c in state.columns if not c.startswith("hll_")]
    derived = [
        (F.col(f"sum_{m}").cast("double") / F.col(f"cnt_{m}")).alias(f"avg_{m}")
        for m in measures
    ]
    derived += [
        F.hll_sketch_estimate(f"hll_{d}").alias(f"approx_distinct_{d}")
        for d in distinct
    ]
    sums = {f"sum_{m}" for m in measures}
    out = [
        F.col(c).cast("double").alias(c) if c in sums else F.col(c)
        for c in cols
    ]
    return state.select(*out, *derived)

"""Skew-resilient aggregation (SURVEY.md §7 step 7).

AQE's skew-join splitting handles skewed JOINS; skewed GROUP BY keys (a few
hot keys receiving most rows — event streams and day-grain rollups do this
constantly) still funnel each hot key through one reducer. The classic fix
is salting: aggregate on (key, salt) first so a hot key spreads over
``salt_buckets`` reducers, then merge the partials.

Only decomposable aggregates are offered — sum/count/min/max re-merge with
themselves, avg merges as sum-of-sums over sum-of-counts. Decimal-cast sums
stay EXACT under re-association, so the salted plan is value-identical to
the direct plan (asserted against the DuckDB oracle), not just
approximately equal.

Spark's partial (map-side) aggregation already absorbs skew when the
upstream is many map tasks; salting matters when the input partitioning is
itself keyed (e.g. post-shuffle) or combine ratios are poor. The operator
exists so the choice is explicit and testable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGEABLE = ("sum", "count", "min", "max", "avg")


def salted_group_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    exact_decimal: bool = True,
) -> DataFrame:
    """Two-stage skew-safe ``groupBy(keys).agg(...)``.

    ``aggs`` maps out_col -> (fn, in_col) with fn in sum/count/min/max/avg.
    Stage 1 groups on (keys + salt) where salt = crc32(monotonic row id) %
    salt_buckets; stage 2 merges partials on keys alone. ``exact_decimal``
    casts sum inputs to DECIMAL(28,8) so both stages re-associate without
    float drift (matches the engine's oracle-exact dsum pattern)."""
    if isinstance(keys, str):
        keys = [keys]
    for out, (fn, _) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(
                f"{out}: {fn!r} is not decomposable; use {_MERGEABLE}"
            )

    salt = (F.crc32(F.monotonically_increasing_id().cast("string"))
            % salt_buckets).alias("__salt")
    d = df.withColumn("__salt", salt)

    def cast_sum(col: str):
        c = F.col(col)
        return c.cast("decimal(28,8)") if exact_decimal else c

    partial_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "sum":
            partial_exprs.append(F.sum(cast_sum(col)).alias(f"__p_sum_{out}"))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_cnt_{out}"))
        elif fn == "avg":
            partial_exprs.append(F.sum(cast_sum(col)).alias(f"__p_sum_{out}"))
            partial_exprs.append(F.count(col).alias(f"__p_cnt_{out}"))
        else:  # min / max
            partial_exprs.append(getattr(F, fn)(col).alias(f"__p_{fn}_{out}"))
    partial = d.groupBy(*keys, "__salt").agg(*partial_exprs)

    final_exprs = []
    for out, (fn, _) in aggs.items():
        if fn == "sum":
            e = F.sum(f"__p_sum_{out}")
            final_exprs.append(
                (e.cast("double") if exact_decimal else e).alias(out)
            )
        elif fn == "count":
            final_exprs.append(F.sum(f"__p_cnt_{out}").alias(out))
        elif fn == "avg":
            s = F.sum(f"__p_sum_{out}").cast("double")
            final_exprs.append((s / F.sum(f"__p_cnt_{out}")).alias(out))
        else:
            final_exprs.append(getattr(F, fn)(f"__p_{fn}_{out}").alias(out))
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi join: the big side adds a per-row salt (hash of the
    whole row — deterministic under recomputation, unlike rand()), the
    small side replicates once per salt value, and the join runs on
    (keys + salt) — a hot key's rows land on ``salt_buckets`` reducers
    instead of one. Small-side cost: x``salt_buckets`` rows (keep it
    broadcast-small or keep buckets modest). Result is EXACTLY the plain
    join — salt only scatters placement.

    LIMITATION of the default whole-row salt: fully duplicated rows of a
    hot key all hash to the SAME salt bucket, so for duplicate-heavy hot
    keys (common in log data) the mitigation degrades to nothing. Pass
    ``salt_on`` — column(s) unique-ish per row, e.g. an event id or
    ingest offset — to salt on those instead; any near-unique expression
    restores the scatter while staying deterministic under task retry.

    AQE's skew-join split handles most cases adaptively; this explicit
    form covers plans AQE declines (e.g. a skewed key feeding a
    sort-merge join inside a cached subtree) and makes the mitigation
    unit-testable.

    Only big-side-preserving join types are legal: an unmatched SMALL-side
    row exists ``salt_buckets`` times after replication, so right/full
    outer joins would emit it once per salt."""
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt_cols = list(salt_on) if salt_on is not None else list(big.columns)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)
    ).alias("__salt")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")

"""Hypothesis twin: as_of_join vs pandas.merge_asof on random streams.

The engine's as-of join (operators/joins.py) documents pandas
merge_asof semantics for all three directions and the tolerance bound.
pandas itself ships in the container, so the reference implementation
is the real thing — random keyed event/quote streams, every direction,
with and without tolerance, including equal-timestamp matches and
left rows with no in-range partner.

Scope note: right-side timestamps are unique per key (among equal
right times the operator deterministically carries the GREATEST value
tuple — pandas carries the last row in input order, a positional
notion that has no distributed analogue; see
test_joins.test_asof_tie_break_deterministic), and right_values carry
no nulls (the per-column last(ignorenulls) carry is a documented
deviation from merge_asof for null-bearing columns).
"""

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_analysis_for_stock_market_data_spark.operators.joins import as_of_join

SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(sec: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


stream = st.tuples(
    st.sets(st.integers(0, 300), min_size=1, max_size=12),  # key-0 times
    st.sets(st.integers(0, 300), min_size=1, max_size=12),  # key-1 times
)


@given(left=stream, right=stream,
       direction=st.sampled_from(["backward", "forward", "nearest"]),
       tol=st.sampled_from([None, 7, 40]),
       seed=st.integers(0, 10**6))
@SETTINGS
def test_as_of_join_matches_pandas_merge_asof(spark, left, right,
                                              direction, tol, seed):
    lrows = [(k, _ts(t)) for k, ts in enumerate(left) for t in ts]
    rrows = [
        (k, _ts(t), (seed + 31 * k + t) % 997)
        for k, ts in enumerate(right) for t in ts
    ]
    ldf = spark.createDataFrame(lrows, "sym long, t timestamp")
    rdf = spark.createDataFrame(rrows, "sym long, rt timestamp, px long")
    got = {
        (r.sym, r.t): r.px
        for r in as_of_join(
            ldf, rdf, on="sym", left_time="t", right_time="rt",
            right_values=["px"], direction=direction,
            tolerance=None if tol is None else f"{tol} seconds",
        ).collect()
    }
    lpd = pd.DataFrame(lrows, columns=["sym", "t"]).sort_values("t")
    rpd = pd.DataFrame(rrows, columns=["sym", "rt", "px"]).sort_values("rt")
    ref = pd.merge_asof(
        lpd, rpd, left_on="t", right_on="rt", by="sym",
        direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    expected = {
        (int(r.sym), r.t.to_pydatetime()):
            None if pd.isna(r.px) else int(r.px)
        for r in ref.itertuples()
    }
    assert got == expected

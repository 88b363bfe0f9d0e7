"""Hypothesis twins: interval_overlap_join brute force; gap_fill+LOCF
vs a pandas date-spine reindex/ffill.

interval_overlap_join's exactly-once claim rule (first shared bin) is
the subtle part — random closed intervals across bin widths must yield
each overlapping pair EXACTLY once, identical to the quadratic
definition. gap_fill_daily + forward_fill compose the densify→LOCF
pipeline; pandas reindex+ffill is the reference.
"""

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_analysis_for_stock_market_data_spark.operators.joins import (
    interval_overlap_join,
)
from big_data_analysis_for_stock_market_data_spark.operators.windows import (
    forward_fill,
    gap_fill_daily,
)

SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 25)),  # (lo, length)
    min_size=1, max_size=10,
)


@given(li=intervals, ri=intervals, bin_width=st.sampled_from([1, 3, 7, 64]))
@SETTINGS
def test_interval_overlap_join_matches_bruteforce(spark, li, ri, bin_width):
    lrows = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(li)]
    rrows = [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ri)]
    ldf = spark.createDataFrame(lrows, "lid long, l_lo long, l_hi long")
    rdf = spark.createDataFrame(rrows, "rid long, r_lo long, r_hi long")
    out = interval_overlap_join(
        ldf, rdf, "l_lo", "l_hi", "r_lo", "r_hi", bin_width
    ).select("lid", "rid").collect()
    got = [(r.lid, r.rid) for r in out]
    expected = {
        (i, j)
        for i, llo, lhi in lrows
        for j, rlo, rhi in rrows
        if llo <= rhi and rlo <= lhi
    }
    assert len(got) == len(set(got)), "pair claimed more than once"
    assert set(got) == expected


events_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 50),
              st.sampled_from("abc")),
    min_size=1, max_size=14, unique_by=lambda e: (e[0], e[1]),
)


@given(events=events_strategy,
       pattern=st.sampled_from([
           "a>b", "a>.*>c", "a(>b)+", "(a>)+b", "b", "a>b>c",
       ]))
@SETTINGS
def test_sequence_pattern_match_matches_python_re(spark, events, pattern):
    """MATCH_RECOGNIZE-lite must count the same left-to-right
    non-overlapping matches as Python re on the same ordered chain
    (patterns stay in the Java-regex ∩ RE2 ∩ Python common subset)."""
    import re

    from big_data_analysis_for_stock_market_data_spark.operators.windows import (
        sequence_pattern_match,
    )

    df = spark.createDataFrame(events, "uid long, ts long, step string")
    got = {
        r.uid: (r.n_events, r.event_chain, r.n_matches)
        for r in sequence_pattern_match(
            df, ["uid"], "ts", "step", pattern
        ).collect()
    }
    chains = {}
    for uid, ts, step in sorted(events):
        chains.setdefault(uid, []).append(step)
    expected = {
        uid: (len(steps), ">".join(steps),
              len(re.findall(pattern, ">".join(steps))))
        for uid, steps in chains.items()
    }
    assert got == expected


day_series = st.dictionaries(
    st.integers(0, 40),                      # day offset
    st.one_of(st.none(), st.integers(-99, 99)),  # observed value (or null)
    min_size=1, max_size=10,
)


@given(s0=day_series, s1=day_series)
@SETTINGS
def test_gap_fill_then_locf_matches_pandas(spark, s0, s1):
    base = dt.date(2024, 3, 1)
    rows = [
        (k, base + dt.timedelta(days=d), v)
        for k, series in enumerate((s0, s1))
        for d, v in series.items()
    ]
    df = spark.createDataFrame(rows, "sym long, day date, px long")
    dense = gap_fill_daily(df, ["sym"], "day")
    got = {
        (r.sym, r.day): r.px
        for r in forward_fill(dense, ["sym"], "day", ["px"]).collect()
    }
    expected = {}
    for k, series in enumerate((s0, s1)):
        idx = pd.date_range(
            base + dt.timedelta(days=min(series)),
            base + dt.timedelta(days=max(series)), freq="D",
        )
        ser = pd.Series(
            {base + dt.timedelta(days=d): v for d, v in series.items()},
            dtype="Int64",  # nullable ints: ffill without object-dtype
        ).reindex([d.date() for d in idx]).ffill()
        for day, v in ser.items():
            expected[(k, day)] = None if pd.isna(v) else int(v)
    assert got == expected

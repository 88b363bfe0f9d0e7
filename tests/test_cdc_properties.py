"""Hypothesis twins for the CDC / SCD-2 temporal family.

apply_cdc (latest-change-wins + tombstone drop), scd2_history
(effective-dated versions) and temporal_join (point-in-time lookup,
the anti-time-travel join) vs plain-Python folds on random change
streams — including same-timestamp ties (broken by the seq column),
zero-width versions they produce, and facts before the first version.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
    apply_cdc,
    scd2_history,
    temporal_join,
)

SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EPOCH = dt.datetime(2024, 6, 1)


def _ts(sec: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


changes = st.lists(
    st.tuples(
        st.integers(0, 2),            # key
        st.integers(0, 20),           # ts seconds (ties likely)
        st.integers(-50, 50),         # value
        st.sampled_from(["I", "U", "U", "D"]),
    ),
    min_size=1, max_size=14,
)


@given(stream=changes)
@SETTINGS
def test_apply_cdc_matches_python_fold(spark, stream):
    rows = [
        (k, _ts(t), i, v, op) for i, (k, t, v, op) in enumerate(stream)
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, seq long, v long, op string"
    )
    got = {
        r.k: r.v
        for r in apply_cdc(df, ["k"], ["ts", "seq"], ["v"]).collect()
    }
    latest = {}
    for k, ts, seq, v, op in sorted(rows, key=lambda r: (r[1], r[2])):
        latest[k] = (v, op)
    expected = {k: v for k, (v, op) in latest.items() if op != "D"}
    assert got == expected


@given(stream=changes, facts=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 22)),
    min_size=1, max_size=10, unique=True,
))
@SETTINGS
def test_scd2_temporal_join_matches_python(spark, stream, facts):
    dim_rows = [
        (k, _ts(t), i, v) for i, (k, t, v, _op) in enumerate(stream)
    ]
    dim = spark.createDataFrame(
        dim_rows, "k long, ts timestamp, seq long, v long"
    )
    hist = scd2_history(dim, ["k"], ["ts", "seq"], ["v"])
    fact_rows = [(k, _ts(t)) for k, t in facts]
    fact = spark.createDataFrame(fact_rows, "k long, ft timestamp")
    got = {
        (r.k, r.ft): r.v if r.valid_from is not None else None
        for r in temporal_join(fact, hist, ["k"], "ft").collect()
    }
    # Python: versions per key in (ts, seq) order; valid_to = next ts
    versions = {}
    for k, ts, seq, v in sorted(dim_rows, key=lambda r: (r[1], r[2])):
        versions.setdefault(k, []).append([ts, None, v])
    for chain in versions.values():
        for cur, nxt in zip(chain, chain[1:]):
            cur[1] = nxt[0]
    expected = {}
    for k, ft in fact_rows:
        hit = None
        for vf, vt, v in versions.get(k, []):
            if vf <= ft and (vt is None or ft < vt):
                hit = v
        expected[(k, ft)] = hit
    assert got == expected

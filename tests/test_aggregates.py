"""Unit tests for aggregate operators and quality scans (SURVEY.md §2.4)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_analysis_for_stock_market_data_spark.operators import aggregates as A


def test_duplicate_stats(spark):
    df = spark.createDataFrame(
        [Row(t="a"), Row(t="a"), Row(t="b"), Row(t="c"), Row(t="c"), Row(t="c")]
    )
    r = A.duplicate_stats(df, subset=["t"]).first()
    assert (r.n_rows, r.n_distinct, r.n_duplicates) == (6, 3, 3)


def test_null_stats_one_pass(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=None, b="x"), Row(a=3, b=None)],
        schema="a int, b string",
    )
    r = A.null_stats(df).first()
    assert (r.n_rows, r.nulls_a, r.nulls_b) == (3, 1, 2)


def test_assert_clean_raises_on_duplicates(spark):
    df = spark.createDataFrame([Row(t="a"), Row(t="a")])
    with pytest.raises(ValueError, match="duplicate"):
        A.assert_clean(df)


def test_assert_clean_raises_on_nulls(spark):
    df = spark.createDataFrame([Row(t="a"), Row(t=None)], schema="t string")
    with pytest.raises(ValueError, match="nulls"):
        A.assert_clean(df)


def test_grouped_avg_matches_manual(spark):
    df = spark.createDataFrame(
        [Row(k="x", v=1.0), Row(k="x", v=3.0), Row(k="y", v=10.0)]
    )
    out = {
        r.k: r.avg_v
        for r in A.grouped_avg(df, "k", {"v": "avg_v"}, order_by_keys=True).collect()
    }
    assert out == {"x": 2.0, "y": 10.0}


def test_moments_on_symmetric_data(spark):
    df = spark.createDataFrame([Row(v=float(x)) for x in (-2, -1, 0, 1, 2)])
    r = A.moments(df, ["v"]).first()
    assert abs(r.skew_v) < 1e-12          # symmetric → zero skew
    assert r.kurt_v == pytest.approx(-1.3)  # uniform-ish platykurtic


def test_approx_distinct_within_rsd(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_for_stock_market_data_spark.queries import load

    li = load(spark, "/root/testdata/sf0.001", "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.count_distinct("l_orderkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= 0.05 * row.exact


def test_summary_stats_matches_describe_fields(spark):
    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        summary_stats,
    )
    from pyspark.sql import functions as F

    df = spark.range(100).select((F.col("id") * 2.0).alias("x"))
    row = summary_stats(df, ["x"]).head()
    assert row["count_x"] == 100
    assert row["mean_x"] == 99.0
    assert row["min_x"] == 0.0 and row["max_x"] == 198.0
    assert abs(row["stddev_x"] - df.agg(F.stddev_samp("x")).head()[0]) < 1e-9


def test_latest_by_key_scd1(spark):
    from pyspark.sql import Row

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        latest_by_key,
    )

    df = spark.createDataFrame([
        Row(k="a", ts=1, eid=1, v=10.0),
        Row(k="a", ts=3, eid=2, v=30.0),   # survivor: max ts
        Row(k="a", ts=3, eid=1, v=31.0),   # same ts, smaller eid loses
        Row(k="b", ts=5, eid=9, v=50.0),
    ])
    got = {r.k: (r.ts, r.eid, r.v) for r in latest_by_key(
        df, keys=["k"], order=["ts", "eid"], payload=["ts", "eid", "v"]
    ).collect()}
    assert got == {"a": (3, 2, 30.0), "b": (5, 9, 50.0)}


def test_incremental_merge_equals_direct(spark):
    """merge(partial(splits)) must be bit-identical to partial(whole), for
    any split and any merge tree (operators/incremental.py)."""
    import random

    from big_data_analysis_for_stock_market_data_spark.operators import (
        incremental as inc,
    )

    rng = random.Random(7)
    rows = [
        Row(k=rng.choice("abc"), v=round(rng.uniform(-100, 100), 6))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, schema="k string, v double")
    direct = inc.partial_agg(df, ["k"], ["v"])

    # arbitrary 3-way split by hash, merged as ((s0+s1)+s2)
    parts = [
        df.filter((F.crc32(F.col("v").cast("string")) % 3) == i)
        for i in range(3)
    ]
    states = [inc.partial_agg(p, ["k"], ["v"]) for p in parts]
    merged = inc.merge_partials(
        [inc.merge_partials(states[:2], ["k"], ["v"]), states[2]], ["k"], ["v"]
    )

    def canon(d):
        return sorted(tuple(r) for r in d.collect())

    assert canon(merged) == canon(direct)
    # state types stable under re-merge (nullability legitimately differs:
    # SUM over a merged state is nullable where COUNT is not)
    assert [(f.name, f.dataType) for f in merged.schema] == [
        (f.name, f.dataType) for f in direct.schema
    ]

    fin = inc.finalize(merged, ["v"]).collect()
    by_k = {r.k: r for r in fin}
    import math

    for r in df.groupBy("k").agg(
        F.avg("v").alias("a"), F.count("v").alias("c")
    ).collect():
        assert by_k[r.k].cnt_v == r.c
        assert math.isclose(by_k[r.k].avg_v, r.a, rel_tol=1e-9)


def test_scd2_history_and_snapshot(spark):
    """Version chain per key: contiguous valid ranges, single current row,
    and the as-of read returns the version live at the instant."""
    from datetime import datetime as DT

    from big_data_analysis_for_stock_market_data_spark.operators import (
        aggregates as A2,
    )

    df = spark.createDataFrame(
        [
            Row(k="a", ts=DT(2024, 1, 1), eid=1, v=10.0),
            Row(k="a", ts=DT(2024, 1, 3), eid=2, v=20.0),
            Row(k="a", ts=DT(2024, 1, 5), eid=3, v=30.0),
            Row(k="b", ts=DT(2024, 1, 2), eid=4, v=99.0),
        ]
    )
    hist = A2.scd2_history(df, ["k"], ["ts", "eid"], ["v", "eid"])
    rows = {(r.k, r.eid): r for r in hist.collect()}
    assert rows[("a", 1)].valid_to == DT(2024, 1, 3)
    assert rows[("a", 2)].valid_to == DT(2024, 1, 5)
    assert rows[("a", 3)].valid_to is None and rows[("a", 3)].is_current
    assert rows[("b", 4)].is_current
    # ranges tile: every non-current valid_to equals the next valid_from
    assert sum(r.is_current for r in rows.values()) == 2

    snap = {(r.k): r.v for r in A2.snapshot_as_of(hist, DT(2024, 1, 4)).collect()}
    assert snap == {"a": 20.0, "b": 99.0}
    # before a key exists it is absent from the snapshot
    early = {r.k: r.v for r in A2.snapshot_as_of(hist, DT(2024, 1, 1, 12)).collect()}
    assert early == {"a": 10.0}


def test_groupwise_ols_matches_numpy(spark):
    """Closed-form integer-moment fit equals numpy lstsq per group; a
    constant-x group yields null slope."""
    import numpy as np

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        groupwise_ols,
    )

    rows = []
    rng = np.random.default_rng(3)
    pts = {}
    for g in ("a", "b"):
        xs = rng.integers(0, 500, 40)
        ys = (3 if g == "a" else -7) * xs + 100 + rng.integers(-20, 20, 40)
        pts[g] = (xs, ys)
        rows += [Row(g=g, x=int(x), y=int(y)) for x, y in zip(xs, ys)]
    rows += [Row(g="flat", x=5, y=1), Row(g="flat", x=5, y=9)]  # zero x-var
    df = spark.createDataFrame(rows)
    got = {r.g: r for r in groupwise_ols(df, ["g"], F.col("x"), F.col("y")).collect()}

    for g, (xs, ys) in pts.items():
        m, b = np.polyfit(xs.astype(float), ys.astype(float), 1)
        assert abs(got[g].slope - m) < 1e-9
        assert abs(got[g].intercept - b) < 1e-6
    assert got["flat"].slope is None and got["flat"].intercept is None


def test_funnel_steps_ordering_semantics(spark):
    """Strictly-after chaining: a purchase BEFORE the first click does not
    count; users without the entry step are outside the funnel."""
    from datetime import datetime as DT

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        funnel_steps,
    )

    rows = [
        # u1 completes in order
        Row(u=1, ts=DT(2024, 1, 1, 9), e="view"),
        Row(u=1, ts=DT(2024, 1, 1, 10), e="click"),
        Row(u=1, ts=DT(2024, 1, 1, 11), e="purchase"),
        # u2: purchase precedes the click -> chain stops at click
        Row(u=2, ts=DT(2024, 1, 1, 9), e="view"),
        Row(u=2, ts=DT(2024, 1, 1, 9, 30), e="purchase"),
        Row(u=2, ts=DT(2024, 1, 1, 10), e="click"),
        # u3 never views -> outside the funnel
        Row(u=3, ts=DT(2024, 1, 1, 8), e="click"),
        Row(u=3, ts=DT(2024, 1, 1, 9), e="purchase"),
    ]
    df = spark.createDataFrame(rows)
    got = {r.u: r for r in funnel_steps(
        df, ["u"], "ts", "e", ["view", "click", "purchase"]
    ).collect()}
    assert set(got) == {1, 2}
    assert got[1].steps_reached == 3
    assert got[2].steps_reached == 2 and got[2].step3_ts is None


def test_incremental_hll_distinct_merges_exactly(spark):
    """The HLL sketch in the MV state is merge-associative: the estimate
    from merged split-sketches equals the estimate from the whole (the
    Datasketches HLL union is deterministic), and on small cardinalities
    the estimate is exact."""
    from big_data_analysis_for_stock_market_data_spark.operators import (
        incremental as inc,
    )

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 2.0).alias("v"),
        (F.col("id") % 211).alias("u"),
    )
    whole = inc.finalize(
        inc.partial_agg(df, ["k"], ["v"], distinct=["u"]), ["v"], distinct=["u"]
    )
    parts = [df.filter((F.col("id") % 2) == i) for i in range(2)]
    states = [inc.partial_agg(p, ["k"], ["v"], distinct=["u"]) for p in parts]
    merged = inc.finalize(
        inc.merge_partials(states, ["k"], ["v"], distinct=["u"]),
        ["v"], distinct=["u"],
    )
    w = {r.k: r.approx_distinct_u for r in whole.collect()}
    m = {r.k: r.approx_distinct_u for r in merged.collect()}
    assert w == m
    assert all(v == 211 for v in w.values())  # exact at small cardinality


def test_apply_cdc_tombstones_and_temporal_join(spark):
    """Latest-change-wins with delete tombstones; point-in-time lookup
    picks the version valid at the fact timestamp, never a future one."""
    from datetime import datetime as DT

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        apply_cdc,
        scd2_history,
        temporal_join,
    )

    changes = spark.createDataFrame(
        [
            Row(k="a", ts=DT(2024, 1, 1), eid=1, v=1.0, op="I"),
            Row(k="a", ts=DT(2024, 1, 2), eid=2, v=2.0, op="U"),
            Row(k="b", ts=DT(2024, 1, 1), eid=3, v=9.0, op="I"),
            Row(k="b", ts=DT(2024, 1, 3), eid=4, v=0.0, op="D"),  # tombstone
        ]
    )
    got = {r.k: r.v for r in apply_cdc(
        changes, ["k"], ["ts", "eid"], ["ts", "v"]
    ).collect()}
    assert got == {"a": 2.0}  # b's latest change is a delete

    hist = scd2_history(
        changes.filter(F.col("op") != "D"), ["k"], ["ts", "eid"], ["v"]
    )
    facts = spark.createDataFrame(
        [
            Row(k="a", fts=DT(2024, 1, 1, 12)),  # only v=1.0 existed then
            Row(k="a", fts=DT(2024, 1, 5)),      # current version v=2.0
            Row(k="c", fts=DT(2024, 1, 5)),      # no history -> null
        ]
    )
    out = {(r.k, r.fts): r.v for r in temporal_join(
        facts, hist, ["k"], "fts"
    ).collect()}
    assert out[("a", DT(2024, 1, 1, 12))] == 1.0
    assert out[("a", DT(2024, 1, 5))] == 2.0
    assert out[("c", DT(2024, 1, 5))] is None


def test_cohort_transition_histogram_small_cases(spark):
    from datetime import datetime as DT

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        cohort_retention,
        fixed_width_histogram,
        transition_matrix,
    )

    ev = spark.createDataFrame(
        [
            Row(u=1, ts=DT(2024, 1, 1, 9), e="view", v=0.0),
            Row(u=1, ts=DT(2024, 1, 3, 9), e="click", v=5.0),
            Row(u=1, ts=DT(2024, 1, 3, 10), e="view", v=10.0),
            Row(u=2, ts=DT(2024, 1, 2, 9), e="view", v=10.0),
        ]
    )
    coh = {(str(r.cohort_day), r.day_offset): r.n_users
           for r in cohort_retention(ev, "u", "ts").collect()}
    assert coh == {
        ("2024-01-01", 0): 1, ("2024-01-01", 2): 1, ("2024-01-02", 0): 1,
    }

    tm = {(r.from_state, r.to_state): r.n for r in transition_matrix(
        ev, "u", "ts", "e", order=["ts"]
    ).collect()}
    assert tm == {("view", "click"): 1, ("click", "view"): 1}

    # values 0,5,10,10 over [0,10] in 2 bins: [0,5) -> 1, [5,10] -> 3
    h = {r.bin: (r.n_rows, r.bin_lo) for r in
         fixed_width_histogram(ev, "v", 2).collect()}
    assert h == {0: (1, 0.0), 1: (3, 5.0)}

    # degenerate inputs (empty / all-null) have no binnable range — they
    # yield an empty result, not a TypeError from None arithmetic; null
    # values have no bin and are excluded rather than landing in the
    # last bin via least()'s null-skipping
    assert fixed_width_histogram(ev.filter("v < -1"), "v", 2).count() == 0
    assert fixed_width_histogram(
        ev.select(F.lit(None).cast("double").alias("v")), "v", 2
    ).count() == 0
    with_null = ev.select("v").union(
        spark.createDataFrame([(None,)], "v double")
    )
    h2 = {r.bin: r.n_rows
          for r in fixed_width_histogram(with_null, "v", 2).collect()}
    assert h2 == {0: 1, 1: 3}


def test_rolling_active_counts_step_function(spark):
    """Hand-checked 3-day-window step function: islands merge when gaps <
    window; expiries decrement; the step function matches a brute-force
    per-day distinct count at every delta day."""
    from datetime import datetime as DT, timedelta

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        rolling_active_counts,
    )

    rows = [
        Row(u=1, ts=DT(2024, 1, 1)),
        Row(u=1, ts=DT(2024, 1, 2)),   # island [1,2] -> covers 1..4
        Row(u=1, ts=DT(2024, 1, 10)),  # new island -> covers 10..12
        Row(u=2, ts=DT(2024, 1, 3)),   # covers 3..5
    ]
    df = spark.createDataFrame(rows)
    steps = {str(r.day): r.active_count for r in rolling_active_counts(
        df, "u", "ts", window_days=3
    ).collect()}

    # brute force at each delta day
    import datetime as _dt
    acts = {1: [_dt.date(2024, 1, 1), _dt.date(2024, 1, 2), _dt.date(2024, 1, 10)],
            2: [_dt.date(2024, 1, 3)]}
    for day_str, got in steps.items():
        t = _dt.date.fromisoformat(day_str)
        brute = sum(
            1 for u, ds in acts.items()
            if any(t - timedelta(days=2) <= d <= t for d in ds)
        )
        assert got == brute, (day_str, got, brute)
    assert steps["2024-01-01"] == 1 and steps["2024-01-03"] == 2
    assert steps["2024-01-05"] == 1 and steps["2024-01-06"] == 0


def test_count_min_sketch_never_undercounts_and_merges(spark):
    rows = [Row(k=i % 7) for i in range(140)] + [Row(k=99)]
    df = spark.createDataFrame(rows)
    counters = A.count_min_sketch(df, "k", depth=4, width=64)
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["cms_estimate"]
        for r in A.cms_estimate(counters, keys, "k", depth=4, width=64).collect()
    }
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # CMS point queries never undercount
    assert all(est[k] >= exact[k] for k in exact)
    # with 8 keys in a 4x64 sketch there are no collisions: estimates exact
    assert est == exact
    # MERGE property: sketch(A) + sketch(B) cell-wise == sketch(A union B)
    a, b = df.filter(F.col("k") < 3), df.filter(F.col("k") >= 3)
    merged = (
        A.count_min_sketch(a, "k", depth=4, width=64)
        .unionByName(A.count_min_sketch(b, "k", depth=4, width=64))
        .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = counters
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_hll_union_consistent_with_direct_sketch(spark):
    df = spark.createDataFrame([Row(g=i % 4, v=i) for i in range(2000)])
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("e")
    ).first()["e"]
    unioned = (
        df.groupBy("g").agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()["e"]
    )
    # merging per-group sketches must equal sketching the whole set
    assert unioned == direct
    # HLL error envelope at default lgK: well within 5% of 2000
    assert abs(direct - 2000) / 2000 < 0.05


def test_acf_lags_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import acf_lags

    rng = np.random.default_rng(7)
    x = np.round(np.cumsum(rng.normal(0, 1, 200)) + 50, 2)
    pdf = pd.DataFrame({"k": 1, "t": np.arange(200), "v": x})
    out = acf_lags(spark.createDataFrame(pdf), "k", "t", "v", lags=(1, 5))
    row = out.collect()[0]
    for lag, got in ((1, row.acf1), (5, row.acf5)):
        a, b = x[lag:], x[:-lag]
        exp = np.corrcoef(a, b)[0, 1]
        assert abs(got - exp) < 1e-9


def test_sharpe_of_diffs_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        sharpe_of_diffs,
    )

    rng = np.random.default_rng(11)
    x = np.round(rng.normal(100, 5, 150), 2)
    pdf = pd.DataFrame({"k": "a", "t": np.arange(150), "v": x})
    row = sharpe_of_diffs(spark.createDataFrame(pdf), "k", "t", "v").collect()[0]
    d = np.diff(x)
    assert row.n_diffs == len(d)
    assert abs(row.mean_diff - d.mean()) < 1e-9
    assert abs(row.std_diff - d.std(ddof=1)) < 1e-9
    assert abs(row.sharpe - d.mean() / d.std(ddof=1)) < 1e-9


def test_sharpe_of_diffs_constant_series_null(spark):
    import pandas as pd

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        sharpe_of_diffs,
    )

    pdf = pd.DataFrame({"k": "a", "t": range(5), "v": [3.0] * 5})
    row = sharpe_of_diffs(spark.createDataFrame(pdf), "k", "t", "v").collect()[0]
    assert row.std_diff == 0.0 and row.sharpe is None


def test_group_entropy_known_values(spark):
    import math

    import pandas as pd

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        group_entropy,
    )

    pdf = pd.DataFrame(
        {
            "k": ["u"] * 4 + ["v"] * 3,
            "cls": ["a", "a", "b", "b", "x", "x", "x"],
        }
    )
    rows = {r.k: r for r in group_entropy(spark.createDataFrame(pdf), "k", "cls").collect()}
    # uniform over 2 classes -> exactly 1 bit -> two terms of 0.5e9
    assert rows["u"].n_rows == 4 and rows["u"].n_classes == 2
    assert rows["u"].entropy_nano == 10**9
    # single class -> zero entropy
    assert rows["v"].n_rows == 3 and rows["v"].n_classes == 1
    assert rows["v"].entropy_nano == 0


def test_sharpe_of_diffs_two_row_key_no_ansi_error(spark):
    import pandas as pd

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        sharpe_of_diffs,
    )

    # exactly one diff per key: no sample variance -> nulls, not a
    # divide-by-zero error under ANSI mode
    pdf = pd.DataFrame({"k": ["a", "a"], "t": [1, 2], "v": [1.0, 2.0]})
    row = sharpe_of_diffs(spark.createDataFrame(pdf), "k", "t", "v").collect()[0]
    assert row.n_diffs == 1 and row.mean_diff == 1.0
    assert row.std_diff is None and row.sharpe is None


def test_welch_ttest_matches_closed_form(spark):
    import math

    import pandas as pd

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        welch_ttest,
    )

    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.5, 2.5, 3.5, 5.0]
    pdf = pd.DataFrame(
        {"g": ["a"] * len(a) + ["b"] * len(b) + ["zz"], "v": a + b + [99.0]}
    )
    row = welch_ttest(spark.createDataFrame(pdf), "g", "v", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2a, se2b = va / na, vb / nb
    t = (ma - mb) / math.sqrt(se2a + se2b)
    dfw = (se2a + se2b) ** 2 / (se2a**2 / (na - 1) + se2b**2 / (nb - 1))
    assert row.n_a == na and row.n_b == nb
    assert abs(row.mean_a - ma) < 1e-12 and abs(row.mean_b - mb) < 1e-12
    assert abs(row.t_stat - t) < 1e-9
    assert abs(row.df_welch - dfw) < 1e-9
    # the out-of-scope group ('zz') must not contaminate either side


def test_welch_ttest_degenerate_group_nulls(spark):
    import pandas as pd

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        welch_ttest,
    )

    # one observation in group b: no sample variance -> NULL t/df, not
    # an ANSI divide-by-zero error
    pdf = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 2.0, 5.0]})
    row = welch_ttest(spark.createDataFrame(pdf), "g", "v", "a", "b").collect()[0]
    assert row.n_a == 2 and row.n_b == 1
    assert row.t_stat is None and row.df_welch is None


def test_pareto_skyline_matches_definition(spark):
    """Two-stage distributed sweep == NOT-EXISTS dominance definition,
    with duplicate points and ties on each axis."""
    import itertools

    pts = [(1, 10.0), (1, 10.0), (2, 10.0), (2, 12.0), (3, 11.0),
           (3, 15.0), (5, 20.0), (5, 11.0), (4, 11.0)]
    df = spark.createDataFrame(
        [Row(sz=s, price=p) for s, p in pts]
    )
    got = {(r.sz, r.price) for r in
           A.pareto_skyline_2d(df, "sz", "price", n_buckets=4).collect()}
    distinct = set(pts)
    want = {
        p for p in distinct
        if not any(
            q[0] >= p[0] and q[1] <= p[1] and (q[0] > p[0] or q[1] < p[1])
            for q in distinct
        )
    }
    assert got == want
    # ties: (4, 11.0) is dominated by (5, 11.0); (2, 10.0) dominates (1, 10.0)
    assert (4, 11.0) not in got and (1, 10.0) not in got
    assert {(2, 10.0), (5, 11.0)} <= got

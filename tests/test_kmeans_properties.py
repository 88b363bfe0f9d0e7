"""Hypothesis twins: deterministic_kmeans vs a pure-Python Lloyd
replay, and exact_rank_narrow vs sorted()[k-1].

deterministic_kmeans is the engine-deterministic coarse quantizer under
the IVF / IVF-PQ / SemDeDup scale paths; its spec (md5-bucket init
order, argmin-ties-to-lowest-cluster, DECIMAL(18,9)-exact mean update,
fixed iteration count, empty clusters keep their centroid) exists
precisely so ANY engine can replay it. This twin replays it in plain
Python on random dyadic-valued vectors (multiples of 1/4 — exact in
float, double, and DECIMAL(18,9), so both engines compute identical
arithmetic) and requires bit-identical centroids.
"""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_analysis_for_stock_market_data_spark.operators.simsearch import (
    deterministic_kmeans,
)

SETTINGS = settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ranked_values = st.one_of(
    st.lists(st.integers(-10**12, 10**12), min_size=1, max_size=60),
    st.lists(st.integers(-3, 3), min_size=1, max_size=60),  # dense dups
)


@given(vals=ranked_values, kfrac=st.floats(0.0, 1.0))
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_rank_narrow_selects_true_order_statistic(spark, vals, kfrac):
    """The recursive 1024-bucket narrowing must select exactly
    sorted(vals)[k-1] for any k — duplicates, all-equal columns, and
    huge sparse ranges included (the bucket-boundary regimes)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_analysis_for_stock_market_data_spark.operators.aggregates import (
        exact_rank_narrow,
    )

    k = max(1, min(len(vals), int(round(kfrac * len(vals))) or 1))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    survivors, kdf = exact_rank_narrow(df, "x", k=k, rounds=2)
    picked = (
        survivors.withColumn(
            "__rn", F.row_number().over(Window.orderBy(F.col("x").asc()))
        )
        .join(kdf, F.col("__rn") == F.col("k"))
        .select("x")
        .collect()
    )
    assert [r.x for r in picked] == [sorted(vals)[k - 1]]


# integer quarters, converted to floats inside the test — a named or
# lambda .map here would route through hypothesis's lambda-source
# introspection, which breaks if the file is edited while a run is live
vectors = st.lists(
    st.lists(st.integers(-8, 8), min_size=2, max_size=2),
    min_size=3, max_size=10,
)


def _bucket(vid: int, seed: int = 42) -> int:
    h = hashlib.md5(f"{vid}:{seed}".encode()).hexdigest()
    return int(h[:8], 16) % 10_000


def _kmeans_reference(vecs, n_clusters, n_iters):
    ids = sorted(range(len(vecs)), key=lambda i: (_bucket(i), i))
    cents = {k: list(vecs[ids[k]]) for k in range(min(n_clusters, len(vecs)))}
    for _ in range(n_iters):
        members = {}
        for i, v in enumerate(vecs):
            best = min(
                cents,
                key=lambda k: (
                    sum((a - b) * (a - b) for a, b in zip(v, cents[k])), k
                ),
            )
            members.setdefault(best, []).append(v)
        for k in cents:
            if k in members:  # empty clusters keep the previous centroid
                m = members[k]
                cents[k] = [
                    sum(v[d] for v in m) / len(m) for d in range(len(m[0]))
                ]
    return cents


@given(vecs=vectors, n_clusters=st.sampled_from([2, 3]),
       n_iters=st.sampled_from([1, 2]))
@SETTINGS
def test_deterministic_kmeans_matches_python_replay(spark, vecs, n_clusters,
                                                    n_iters):
    vecs = [[q / 4.0 for q in v] for v in vecs]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.cluster: list(r.centroid)
        for r in deterministic_kmeans(
            df, n_clusters=n_clusters, n_iters=n_iters
        ).collect()
    }
    expected = _kmeans_reference(vecs, n_clusters, n_iters)
    assert got == expected

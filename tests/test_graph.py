"""Graph-operator tests (operators/graph.py): integer PageRank vs a pure
Python replication of the same integer recurrence."""


def _py_pagerank_nano(edges, n_iters=3, damping_pct=85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    pr = {v: 1_000_000_000 // n for v in nodes}
    base = (100 - damping_pct) * 1_000_000_000 // (100 * n)
    for _ in range(n_iters):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += pr[u] // outdeg[u]
        pr = {v: base + damping_pct * s[v] // 100 for v in nodes}
    return pr


def test_pagerank_nano_matches_python_replication(spark):
    from big_data_analysis_for_stock_market_data_spark.operators.graph import (
        pagerank_nano,
    )

    # undirected triangle + a pendant: 1-2, 2-3, 1-3, 3-4 (both ways)
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = und + [(v, u) for u, v in und]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.pr_nano for r in pagerank_nano(df, n_iters=3).collect()}
    assert got == _py_pagerank_nano(edges)
    # the hub (node 3: degree 3) outranks the pendant and the others
    assert got[3] == max(got.values()) and got[4] == min(got.values())


def test_pagerank_nano_mass_approximately_conserved(spark):
    """Total integer mass stays within quantization loss of 1e9 (each
    node loses < 1 nano per floor division per round)."""
    from big_data_analysis_for_stock_market_data_spark.operators.graph import (
        pagerank_nano,
    )
    import pytest

    und = [(i, (i + 1) % 6) for i in range(6)]  # 6-cycle
    edges = und + [(v, u) for u, v in und]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.pr_nano for r in pagerank_nano(df, n_iters=3).collect()}
    total = sum(got.values())
    assert 1_000_000_000 - 100 <= total <= 1_000_000_000
    # symmetric cycle: all ranks equal
    assert len(set(got.values())) == 1

    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_nano(df, damping_pct=0)


def test_bfs_hops_min_distance(spark):
    from big_data_analysis_for_stock_market_data_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5 plus shortcut 1-4: node 4 is 1 hop, not 3
    eo = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)]
    edges = spark.createDataFrame(
        eo + [(v, u) for u, v in eo], "u long, v long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.hops
        for r in bfs_hops(edges, seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_hops_bound_and_multi_seed(spark):
    from big_data_analysis_for_stock_market_data_spark.operators.graph import bfs_hops

    # chain 10-11-12-13-14; seeds at both ends, bound 1
    eo = [(10, 11), (11, 12), (12, 13), (13, 14)]
    edges = spark.createDataFrame(
        eo + [(v, u) for u, v in eo], "u long, v long"
    )
    seeds = spark.createDataFrame([(10,), (14,)], "node long")
    got = {
        r.node: r.hops
        for r in bfs_hops(edges, seeds, max_hops=1).collect()
    }
    assert got == {10: 0, 14: 0, 11: 1, 13: 1}

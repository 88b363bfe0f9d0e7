"""Brute-force twins for the r08 grouped-pairs/checkpoint restructures.

The r08 subtree sweep rewrote the candidate-generation shape of the
inverted-index dedup operators (posting self-join → one grouped shuffle
+ in-group ordered-pair explode) and kept BPE training on per-round
checkpoints. Each rewrite was verified against its DuckDB oracle at two
SFs; these properties pin the SEMANTICS against independent pure-Python
reference implementations on random corpora, so any future plan-shape
change that silently alters pair generation, the doc-freq cap, or the
merge tie-break fails here first.
"""

import re

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from big_data_analysis_for_stock_market_data_spark.operators import dedup as dd
from big_data_analysis_for_stock_market_data_spark.operators.text import (
    bpe_train_merges,
)

SETTINGS = settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny alphabet with whitespace → dense window/shingle collisions, the
# regime where pair generation and the doc-freq cap actually bind.
docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24),
    min_size=2, max_size=6,
)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def _shingles(text: str, n: int) -> set:
    toks = _tokens(text)
    return {
        " ".join(toks[i:i + n])
        for i in range(max(len(toks) - n, 0) + 1)
    }


def _windows(text: str, window: int) -> set:
    norm = text.strip().lower()
    if len(norm) < window:
        return set()
    return {norm[i:i + window] for i in range(len(norm) - window + 1)}


@given(docs=docs_strategy, window=st.sampled_from([2, 3, 4]),
       cap=st.sampled_from([2, 64]))
@SETTINGS
def test_exact_substring_pairs_matches_bruteforce(spark, docs, window, cap):
    rows = [(i, t) for i, t in enumerate(docs)]
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in dd.exact_substring_pairs(
            spark.createDataFrame(rows, "doc_id long, text string"),
            window=window, max_doc_freq=cap,
        ).collect()
    }
    wins = {i: _windows(t, window) for i, t in rows}
    doc_freq = {}
    for ws in wins.values():
        for w in ws:
            doc_freq[w] = doc_freq.get(w, 0) + 1
    expected = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            shared = sum(
                1 for w in wins[a] & wins[b] if doc_freq[w] <= cap
            )
            if shared:
                expected[(a, b)] = shared
    assert got == expected


@given(docs=docs_strategy, n=st.sampled_from([1, 2, 3]),
       threshold=st.sampled_from([0.0, 0.5, 0.9]),
       cap=st.sampled_from([2, 100]))
@SETTINGS
def test_ngram_jaccard_matches_bruteforce(spark, docs, n, threshold, cap):
    rows = [(i, t) for i, t in enumerate(docs)]
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_near_dups(
            spark.createDataFrame(rows, "doc_id long, text string"),
            n_shingle=n, threshold=threshold, max_doc_freq=cap,
        ).collect()
    }
    sh = {i: _shingles(t, n) for i, t in rows}
    doc_freq = {}
    for s in sh.values():
        for g in s:
            doc_freq[g] = doc_freq.get(g, 0) + 1
    expected = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            # candidate iff the pair shares an indexable shingle
            # (2 <= doc freq <= cap); jaccard verifies on FULL sets
            if not any(
                2 <= doc_freq[g] <= cap for g in sh[a] & sh[b]
            ):
                continue
            jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if jac >= threshold:
                expected[(a, b)] = jac
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-12


@given(edges=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1, max_size=12,
))
@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    """Iterative min-label propagation must converge to the same
    clustering as a sequential union-find on random (multi/self-)edge
    lists — including chain graphs deeper than one propagation round."""
    got = {
        r.doc_id: r.component
        for r in dd.connected_components(
            spark.createDataFrame(edges, "id_a long, id_b long")
        ).collect()
    }
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}
    assert got == expected


@given(edges=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1, max_size=14,
), seeds=st.sets(st.integers(0, 9), min_size=1, max_size=3),
    max_hops=st.sampled_from([1, 2, 4]))
@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bfs_hops_matches_python_bfs(spark, edges, seeds, max_hops):
    """Level-synchronous BFS must report the same bounded min-hop
    distances as a sequential BFS on random directed (multi/self-)edge
    graphs, seeds included at 0."""
    from big_data_analysis_for_stock_market_data_spark.operators.graph import bfs_hops

    got = {
        r.node: r.hops
        for r in bfs_hops(
            spark.createDataFrame(edges, "u long, v long"),
            spark.createDataFrame([(s,) for s in seeds], "node long"),
            max_hops,
        ).collect()
    }
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    expected = {s: 0 for s in seeds}
    frontier = set(seeds)
    for level in range(1, max_hops + 1):
        frontier = {
            v for u in frontier for v in adj.get(u, ())
            if v not in expected
        }
        for v in frontier:
            expected[v] = level
    assert got == expected


def _bpe_reference(docs: list, n_merges: int):
    """Sennrich-style BPE with the engine's documented tie-break
    (count DESC, left ASC, right ASC) and left-to-right non-overlapping
    merging; returns None if any round finds no pair."""
    freq = {}
    for t in docs:
        for w in _tokens(t):
            freq[w] = freq.get(w, 0) + 1
    segs = {w: [c for c in w] for w in freq}
    rules = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq[w]
        if not counts:
            return None
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rank, a, b, a + b, cnt))
        for w, syms in segs.items():
            acc = []
            for s in syms:
                if acc and acc[-1] == a and s == b:
                    acc[-1] = a + b
                else:
                    acc.append(s)
            segs[w] = acc
    return rules


@given(docs=st.lists(st.text(alphabet="abc ", min_size=1, max_size=20),
                     min_size=1, max_size=4),
       n_merges=st.sampled_from([1, 2, 3]))
@SETTINGS
def test_bpe_train_matches_reference(spark, docs, n_merges):
    expected = _bpe_reference(docs, n_merges)
    assume(expected is not None)  # a round with no adjacent pair left
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train_merges(
            spark.createDataFrame([(t,) for t in docs], "text string"),
            n_merges=n_merges,
        ).collect()
    ]
    assert got == expected

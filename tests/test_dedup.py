"""Dedup operator tests: exact, MinHash+LSH, SimHash (operators/dedup.py)."""

from pyspark.sql import Row

from big_data_analysis_for_stock_market_data_spark.operators import dedup as D

BASE = (
    "spark executes declarative dataframe plans with catalyst optimizing "
    "predicate pushdown column pruning and join selection across stages"
)
NEAR = BASE.replace("join selection", "join strategy")  # 1-token edit
FAR = (
    "completely different text about cooking pasta with tomatoes basil "
    "garlic olive oil and a pinch of salt simmered slowly"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=BASE),
            Row(doc_id=2, text=BASE),            # exact dup of 1
            Row(doc_id=3, text=NEAR),            # near dup of 1
            Row(doc_id=4, text=FAR),
            Row(doc_id=5, text="  Spark   Executes declarative dataframe plans "
                               "with catalyst optimizing predicate pushdown "
                               "column pruning and join selection across stages"),
        ]
    )


def test_exact_dedup_keeps_lowest_id(spark):
    out = D.exact_dedup(_docs(spark))
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4, 5]  # doc 2 removed; doc 5 differs in raw bytes


def test_exact_dedup_normalized_collapses_whitespace_case(spark):
    out = D.exact_dedup(_docs(spark), normalized=True)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4]  # doc 5 now collapses into doc 1 as well


def test_duplicate_groups_report(spark):
    rows = D.duplicate_groups(_docs(spark)).collect()
    assert len(rows) == 1
    assert rows[0].n_copies == 2 and rows[0].keep_id == 1


def test_minhash_finds_near_dup_not_far(spark):
    out = D.minhash_near_dups(_docs(spark), threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert all(4 not in p for p in pairs)
    jac = {(r.id_a, r.id_b): r.jaccard for r in out}
    assert jac[(1, 2)] == 1.0
    assert 0.5 <= jac[(1, 3)] < 1.0


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="one two")])
    sh = D.with_shingles(df, n=3).first().shingles
    assert sh == ["one two"]


def test_simhash_hamming_zero_for_same_tokens(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=BASE), Row(doc_id=2, text=BASE.upper())]
    )
    out = D.simhash_near_dups(df, max_hamming=0).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in out] == [(1, 2, 0)]


def test_simhash_near_detects_small_edit(spark):
    out = D.simhash_near_dups(_docs(spark), max_hamming=12).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in out}
    assert pairs.get((1, 3), 99) <= 12   # 1-token edit → small hamming
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard_superset_of_minhash(spark):
    from big_data_analysis_for_stock_market_data_spark.operators import dedup as dd
    from big_data_analysis_for_stock_market_data_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    mh = {
        (r.id_a, r.id_b)
        for r in dd.minhash_near_dups(docs, threshold=0.5).collect()
    }
    ng = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_near_dups(docs, threshold=0.5).collect()
    }
    # exact inverted-index recall can only add pairs LSH banding missed
    assert mh <= ng
    # and every returned pair really clears the threshold
    for r in dd.ngram_jaccard_near_dups(docs, threshold=0.5).collect():
        assert r.jaccard >= 0.5


def test_connected_components_clusters(spark):
    from big_data_analysis_for_stock_market_data_spark.operators import dedup as dd

    # two chains and an isolated pair: {1-2-3-4}, {10-11}, {20-21-22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        "id_a long, id_b long",
    )
    got = {
        r.doc_id: r.component
        for r in dd.connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }

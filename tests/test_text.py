"""Text-analysis operator tests (operators/text.py)."""

from pyspark.sql import Row

from big_data_analysis_for_stock_market_data_spark.operators import text as T


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_quality_stats_crafted(spark):
    df = _docs(spark, ["The cat, and 42 dogs!", ""])
    r = {x.doc_id: x for x in T.quality_stats(df).collect()}
    doc = r[0]
    assert doc.n_chars_calc == 21
    assert doc.n_tokens == 5          # the cat, and 42 dogs!
    assert doc.digit_ratio == 2 / 21
    assert doc.punct_ratio == 2 / 21  # comma + bang
    assert doc.stopword_ratio == 2 / 5  # 'the', 'and'
    empty = r[1]
    assert empty.n_tokens == 0
    assert empty.alpha_ratio is None and empty.mean_token_len is None


def test_lang_id_picks_stopword_language(spark):
    df = _docs(spark, [
        "the quick fox is in the yard with a hat",
        "der hund ist nicht mit der katze und das haus",
        "le chat est dans la maison et les jardins pour",
        "xyzzy plugh qwerty",
    ])
    got = [r.lang_pred for r in T.lang_id(df).orderBy("doc_id").collect()]
    assert got == ["en", "de", "fr", "und"]


def test_token_count_bpe(spark):
    df = _docs(spark, ["ab1 2c,d", "hello"])
    got = {r.doc_id: r.n_bpe_tokens
           for r in T.token_count_bpe(df).collect()}
    assert got == {0: 6, 1: 1}  # ab,1,2,c,',',d


def test_fingerprint_normalization_invariance(spark):
    df = _docs(spark, ["Hello  World", "hello world", "hello  world!"])
    got = [r.fingerprint for r in T.fingerprint_md5(df).orderBy("doc_id").collect()]
    assert got[0] == got[1]       # case/whitespace-insensitive
    assert got[0] != got[2]       # content-sensitive


def test_rolling_fingerprint_order_sensitive(spark):
    df = _docs(spark, ["a b c", "c b a", "a b c"])
    got = [r.rolling_fp for r in T.fingerprint_rolling(df).orderBy("doc_id").collect()]
    assert got[0] == got[2]
    assert got[0] != got[1]       # order matters (unlike bag-of-words md5)
    assert all(0 <= g < 1_000_000_007 for g in got)

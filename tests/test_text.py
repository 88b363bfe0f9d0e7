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


def test_chunk_text_grid_and_tail(spark):
    # 300 chars, chunk 200 / overlap 64 -> stride 136 -> ceil(236/136) = 2
    long = "x" * 300
    df = _docs(spark, [long, "short", "", None])
    rows = T.chunk_text(df, chunk_chars=200, overlap=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 2
    first, second = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert (first.chunk_start, first.chunk_len) == (0, 200)
    assert (second.chunk_start, second.chunk_len) == (136, 164)
    # overlap: last 64 chars of chunk 0 == first 64 of chunk 1
    assert first.chunk_text[136:] == second.chunk_text[:64]
    # short doc -> exactly one whole-text chunk; empty/null -> none
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "short"
    assert 2 not in by_doc and 3 not in by_doc


def test_chunk_text_rejects_bad_overlap(spark):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        T.chunk_text(_docs(spark, ["a"]), chunk_chars=10, overlap=10)


def test_pack_sequences_bins(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([
        Row(doc_id=i, shard="a", n=n)
        for i, n in enumerate([500, 500, 500, 600, 2500, 100])
    ])
    got = {
        r.doc_id: (r.prefix_tokens, r.pack_bin)
        for r in T.pack_sequences(
            df, token_col="n", shard_col="shard", order_col="doc_id",
            budget=1000,
        ).collect()
    }
    # prefix sums: 0,500,1000,1500,2100,4600 -> bins 0,0,1,1,2,4
    assert got == {0: (0, 0), 1: (500, 0), 2: (1000, 1),
                   3: (1500, 1), 4: (2100, 2), 5: (4600, 4)}


def test_pack_sequences_shards_independent(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([
        Row(doc_id=0, shard="a", n=900), Row(doc_id=1, shard="b", n=900),
        Row(doc_id=2, shard="a", n=900), Row(doc_id=3, shard="b", n=900),
    ])
    got = {r.doc_id: r.pack_bin for r in T.pack_sequences(
        df, token_col="n", shard_col="shard", order_col="doc_id", budget=1000
    ).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}  # each shard's prefix restarts


def test_redact_pii_classes_and_order(spark):
    df = _docs(spark, [
        "mail bob@example.com or +1 555-123-4567 from 192.168.0.1 ok",
        "no pii here",
    ])
    r = {x.doc_id: x for x in T.redact_pii(df).collect()}
    hit = r[0]
    assert (hit.n_emails, hit.n_ips, hit.n_phones) == (1, 1, 1)
    assert hit.redacted == "mail <EMAIL> or <PHONE> from <IP> ok"
    clean = r[1]
    assert (clean.n_emails, clean.n_ips, clean.n_phones) == (0, 0, 0)
    assert clean.redacted == "no pii here"


def test_curate_documents_reasons(spark):
    good = "the cat and the dog sat with a fine hat for tea"
    df = _docs(spark, [
        good,                               # 0 kept
        good,                               # 1 duplicate of 0
        "",                                 # 2 empty
        "tiny doc",                         # 3 too_few_tokens
        "1234 5678 9012 3456 7890 12345",   # 4 low_alpha
        "zebra quokka xylophone quartz vex" # 5 low_stopword
    ])
    got = {r.doc_id: (r.keep, r.reason)
           for r in T.curate_documents(df).collect()}
    assert got == {
        0: (True, "kept"), 1: (False, "duplicate"), 2: (False, "empty"),
        3: (False, "too_few_tokens"), 4: (False, "low_alpha"),
        5: (False, "low_stopword"),
    }


def test_vocab_coverage_exact_small_case(spark):
    """Hand-computed vocab + OOV: vocab of size 2 keeps the two most
    frequent tokens ('a', 'b'); every other token occurrence is OOV."""
    from big_data_analysis_for_stock_market_data_spark.operators.text import (
        vocab_coverage,
    )

    df = spark.createDataFrame(
        [
            ("en", "a a a b b c"),
            ("fr", "a b d d"),
        ],
        "lang string, text string",
    )
    got = {r.lang: r for r in vocab_coverage(df, 2, by=["lang"]).collect()}
    # freq: a=4, b=3, d=2, c=1 -> vocab {a, b}
    assert (got["en"].total_tokens, got["en"].oov_tokens) == (6, 1)
    assert (got["fr"].total_tokens, got["fr"].oov_tokens) == (4, 2)


def test_tfidf_topterms_hand_case(spark):
    """Tiny corpus with a known discriminative term: the term unique to a
    document outranks corpus-wide terms; terms in every document get
    idf = ln(1) = 0."""
    from big_data_analysis_for_stock_market_data_spark.operators.text import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [
            (1, "apple banana common"),
            (2, "cherry banana common"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=1).collect()
    top = {r.doc_id: (r.term, r.score_nano) for r in out}
    assert top[1][0] == "apple" and top[2][0] == "cherry"
    # doc 3 has only the everywhere-term: idf 0 -> score 0
    assert top[3] == ("common", 0)
    # sanity: ln(3/1)/3 * 1e9 for the unique terms
    import math
    expect = round(round(math.log(3.0) * 1e9) / 3)
    assert abs(top[1][1] - expect) <= 1


def test_unigram_logprob_hand_computed(spark):
    """Corpus: 'a a b' + 'b c' -> p(a)=2/5, p(b)=2/5, p(c)=1/5; per-doc
    sums of round(log10(p)*1e9) as exact integers."""
    import math

    from big_data_analysis_for_stock_market_data_spark.operators.text import (
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.sum_logp_nano)
           for r in unigram_logprob(docs).collect()}
    lp = lambda p: round(math.log10(p) * 1e9)
    assert got == {
        1: (3, 2 * lp(2 / 5) + lp(2 / 5)),
        2: (2, lp(2 / 5) + lp(1 / 5)),
    }


def test_repetition_stats_crafted(spark):
    docs = _docs(spark, ["a b a b a b", "x y z", "q", ""])
    out = {r["doc_id"]: r for r in T.repetition_stats(docs, n=2).collect()}
    # "a b a b a b": bigrams = 3x"a b" + 2x"b a" -> 5 total, top 3, all dup
    r0 = out[0]
    assert (r0["n_grams"], r0["top_gram_count"], r0["dup_gram_count"]) == (5, 3, 5)
    assert r0["top_gram_frac"] == 3 / 5 and r0["dup_gram_frac"] == 1.0
    # "x y z": two distinct bigrams, no repetition
    r1 = out[1]
    assert (r1["n_grams"], r1["dup_gram_count"]) == (2, 0)
    assert r1["top_gram_frac"] == 0.5 and r1["dup_gram_frac"] == 0.0
    # sub-n docs keep their spine row with 0 grams and NULL fractions
    for i in (2, 3):
        assert out[i]["n_grams"] == 0 and out[i]["top_gram_frac"] is None


def test_bigram_logprob_tiny_corpus(spark):
    import math

    from big_data_analysis_for_stock_market_data_spark.operators.text import (
        bigram_logprob,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    # corpus pairs: doc1 -> (a,b) (b,a) (a,b); doc2 -> (a,b)
    # c(a,b)=3, c(b,a)=1; c(a,.)=3, c(b,.)=1; unigrams: a=3,b=3,x=1, N=7
    def nano(cab, ca, cb):
        p = 0.8 * (cab / ca) + 0.2 * (cb / 7.0)
        return round(math.log10(p) * 1e9)

    ab, ba = nano(3, 3, 3), nano(1, 1, 3)
    assert rows[1].n_bigrams == 3 and rows[1].sum_logp_nano == 2 * ab + ba
    assert rows[2].n_bigrams == 1 and rows[2].sum_logp_nano == ab
    # single-token doc keeps its spine row with no pairs
    assert rows[3].n_bigrams == 0 and rows[3].sum_logp_nano is None


def test_bpe_train_merges_classic_and_overlap(spark):
    from big_data_analysis_for_stock_market_data_spark.operators.text import (
        bpe_train_merges,
    )

    # Sennrich's classic shape: 'lo' wins first (freq-weighted), then
    # 'low'; ties broken (count DESC, left ASC, right ASC).
    df = spark.createDataFrame(
        [("low low low lower lower newest",), ("newest newest widest",)],
        ["text"],
    )
    rules = [tuple(r) for r in bpe_train_merges(df, n_merges=2).collect()]
    assert rules[0][0] == 1 and rules[0][4] >= rules[1][4]
    # every merged token is left||right and ranks are 1..n in order
    for i, (rank, left, right, merged, cnt) in enumerate(rules):
        assert rank == i + 1 and merged == left + right and cnt > 0

    # counting is OVERLAPPING (3 (a,a) pairs per 'aaaa' x freq 3 = 9, the
    # classic zip(word, word[1:]) count) but the MERGE is non-overlapping
    # left-to-right: 'aaaa' -> [aa, aa], so the next round's top pair is
    # (aa, aa) with count 3 — never (a, aa)
    df2 = spark.createDataFrame([("aaaa aaaa aaaa",)], ["text"])
    r2 = [tuple(r) for r in bpe_train_merges(df2, n_merges=2).collect()]
    assert (r2[0][1], r2[0][2], r2[0][4]) == ("a", "a", 9)
    assert (r2[1][1], r2[1][2], r2[1][4]) == ("aa", "aa", 3)


def test_bpe_tokenize_counts_hand_case(spark):
    from big_data_analysis_for_stock_market_data_spark.operators.text import (
        bpe_tokenize_counts,
    )

    # corpus: 'aaab aaab ab' -> merges learned on it; every word's
    # subword count shrinks accordingly, characters are conserved
    df = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab"), (3, "")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_words, r.n_subwords, r.sum_subword_chars)
           for r in bpe_tokenize_counts(df, n_merges=2).collect()}
    # characters conserved through segmentation: doc1 = 4+4+2 = 10 chars
    assert got[1][0] == 3 and got[1][2] == 10
    assert got[2][0] == 1 and got[2][2] == 4
    assert got[3] == (0, 0, 0)
    # after 2 merges every 'aaab' is at most 2 subwords
    assert got[2][1] <= 2
    assert got[1][1] <= 2 + 2 + 2


def test_canonicalize_url_normalizations(spark):
    """Every noise axis collapses: case, default port, www, trailing
    slash, utm params, param order, fragment; non-default ports and
    non-utm params survive."""
    cases = [
        # (input, expected canonical)
        ("HTTPS://WWW.Ex.COM:443/a/?utm_source=x&b=2&a=1#f",
         "https://ex.com/a?a=1&b=2"),
        ("http://ex.com:80/a", "http://ex.com/a"),
        ("http://ex.com:8080/a", "http://ex.com:8080/a"),
        ("https://ex.com/a/b/", "https://ex.com/a/b"),
        ("https://ex.com/?z=1&y=2", "https://ex.com?y=2&z=1"),
        ("https://ex.com/p?utm_source=a&utm_medium=b", "https://ex.com/p"),
        ("https://ex.com", "https://ex.com"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u, w) for u, w in cases], "url string, want string")
    out = df.select("want", T.canonicalize_url(F.col("url")).alias("got")).collect()
    for r in out:
        assert r.got == r.want, f"{r.got!r} != {r.want!r}"


def test_canonicalize_url_dedups_variants(spark):
    """Two transport-noise variants of one URL share a canonical key."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("HTTPS://WWW.Ex.COM:443/p/?b=2&a=1#x",),
         ("https://ex.com/p?a=1&b=2",)],
        "url string",
    )
    n = (df.select(T.canonicalize_url(F.col("url")).alias("c"))
           .distinct().count())
    assert n == 1

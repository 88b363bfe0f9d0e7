"""Text-analysis operators (north-star surface: language-ID, quality
scoring, token counting, fingerprinting) — BASELINE.json's LLM-data-pipeline
extension, absent from the reference (SURVEY.md §2.7-F6 notes the gap).

Everything here is pure Column expressions (JVM, codegen'd): at 100 TB the
text table is scanned once, all stats come out of one projection, and
nothing crosses into Python. Language-ID uses stopword-hit scoring — the
classic cheap n-gram-free heuristic — with the stopword lists shared between
the Spark implementation and the SQL oracle generator so the two can never
drift.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Per-language stopword markers for the score-and-argmax heuristic.
#: Deliberately small: the operator's value is the *mechanism* (vectorized
#: scoring at scale); swapping richer lists in is data, not code.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "a"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "de", "que", "los", "una", "con", "por", "para", "es"),
    "pt": ("o", "a", "de", "que", "os", "uma", "com", "por", "para", "não"),
}

#: BPE-ish token pattern: letter runs, digit runs, single punctuation marks.
#: Kept to RE2-compatible constructs so Spark (Java regex) and DuckDB (RE2)
#: agree.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_WS = r"\s+"


def tokens_col(col: Column) -> Column:
    """Whitespace tokens of lowercased trimmed text; empty text → empty
    array (split of '' yields [''], which we filter)."""
    raw = F.split(F.trim(F.lower(col)), _WS)
    return F.filter(raw, lambda t: t != "")


def with_tokens(df: DataFrame, col: str = "text", out: str = "tokens") -> DataFrame:
    return df.withColumn(out, tokens_col(F.col(col)))


def quality_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document quality signals: lengths, word counts, character-class
    ratios, stopword ratio (English list), mean token length. All ratios
    guarded for empty documents."""
    c = F.col(col)
    toks = tokens_col(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("alpha_ratio", F.try_divide(n_alpha.cast("double"), n_chars))
        .withColumn("digit_ratio", F.try_divide(n_digit.cast("double"), n_chars))
        .withColumn("punct_ratio", F.try_divide(n_punct.cast("double"), n_chars))
        .withColumn("stopword_ratio", F.try_divide(n_stop.cast("double"), n_tokens))
        .withColumn(
            "mean_token_len",
            F.try_divide(
                F.aggregate(
                    toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t),
                ).cast("double"),
                n_tokens,
            ),
        )
    )


def token_count_bpe(df: DataFrame, col: str = "text",
                    out: str = "n_bpe_tokens") -> DataFrame:
    """Token count under the BPE-ish regex (letter runs / digit runs /
    punctuation marks) — the cheap proxy for LLM token budgeting."""
    return df.withColumn(
        out, F.regexp_count(F.col(col), F.lit(TOKEN_PATTERN)).cast("long")
    )


def lang_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: score(lang) = |tokens ∈ stopwords(lang)|;
    argmax with deterministic lexicographic tiebreak; 'und' (undetermined)
    when no list scores > 0."""
    toks = tokens_col(F.col(col))
    scores: list[tuple[str, Column]] = []
    for lang in sorted(LANG_STOPWORDS):
        arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t))))
        )
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # reversed so earlier (lexicographically smaller) langs win ties
    for lang, s in reversed(scores):
        pred = F.when(s == best, F.lit(lang)).otherwise(pred)
    return df.withColumn(out, F.when(best > 0, pred).otherwise(F.lit("und")))


def lang_id_oracle_sql(text_expr: str = "text") -> str:
    """DuckDB SQL computing the same prediction from the same lists —
    generated from LANG_STOPWORDS so Spark and oracle cannot drift."""
    toks = (
        f"list_filter(string_split_regex(trim(lower({text_expr})), '\\s+'),"
        " t -> t <> '')"
    )
    score_exprs = {}
    for lang in sorted(LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score_exprs[lang] = (
            f"len(list_filter({toks}, t -> list_contains([{words}], t)))"
        )
    greatest = "GREATEST(" + ", ".join(score_exprs.values()) + ")"
    case = "CASE "
    for lang in sorted(LANG_STOPWORDS):
        case += f"WHEN {score_exprs[lang]} = {greatest} THEN '{lang}' "
    case += "END"
    return f"CASE WHEN {greatest} > 0 THEN ({case}) ELSE 'und' END"


def fingerprint_md5(df: DataFrame, col: str = "text",
                    out: str = "fingerprint") -> DataFrame:
    """Normalized-content fingerprint: md5 of the whitespace-normalized
    lowercased text — the canonical exact-dedup key."""
    norm = F.concat_ws(" ", tokens_col(F.col(col)))
    return df.withColumn(out, F.md5(norm.cast("binary")))


def chunk_text(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 200,
    overlap: int = 64,
) -> DataFrame:
    """Fixed-size character chunking with overlap — the context-window
    splitter of an LLM-training ingest pipeline.

    Chunks start at offsets 0, stride, 2·stride, … (stride = chunk_chars −
    overlap); every chunk is ``chunk_chars`` long except the tail. A document
    of ≤ chunk_chars characters yields exactly one chunk; empty/null text
    yields none. Entirely JVM-side: the offset array is built with
    ``sequence``/``transform`` and exploded with ``inline`` — no shuffle at
    all, the op is a flatMap over the scan, so at 100 TB it scales with
    input bytes and never repartitions. Fan-out is bounded by
    len(text)/stride per row.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    stride = chunk_chars - overlap
    c = F.col(col)
    n = F.length(c)
    n_chunks = F.when(n.isNull() | (n <= 0), F.lit(0)).otherwise(
        F.greatest(
            F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
        )
    )
    piece = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(0), (n_chunks - F.lit(1)).cast("long")),
            lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                (i * stride).cast("long").alias("chunk_start"),
                c.substr(
                    (i * stride + 1).cast("int"), F.lit(chunk_chars)
                ).alias("chunk_text"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_idx:long,chunk_start:long,chunk_text:string>>"
    ))
    exploded = df.select(F.col(id_col), F.inline(piece))
    return exploded.withColumn(
        "chunk_len", F.length("chunk_text").cast("long")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    shard_col: str,
    order_col: str,
    budget: int,
) -> DataFrame:
    """Greedy contiguous sequence packing: within each shard, walk documents
    in ``order_col`` order and assign each to training-batch bin
    ``floor(exclusive_prefix_tokens / budget)`` — documents stay contiguous,
    every bin holds ~budget tokens (a doc longer than the budget owns its
    bins alone).

    Scale shape: ONE window (partitionBy shard, orderBy order_col) — the
    shuffle is keyed on the shard column, so parallelism equals shard count
    and no global total order is ever required. This is how packing runs on
    a 1000-executor cluster: shard first (any stable key — source, path,
    hash bucket), pack within shards independently.
    """
    w = Window.partitionBy(shard_col).orderBy(order_col)
    cum = F.sum(token_col).over(w)
    prev = (cum - F.col(token_col)).cast("long")
    return (
        df.withColumn("prefix_tokens", prev)
        .withColumn(
            "pack_bin", F.floor(prev / F.lit(budget)).cast("long")
        )
    )


#: PII patterns kept to constructs Java regex and DuckDB's RE2 interpret
#: identically (no backrefs, no lookaround).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 -]{7,}[0-9]"


def redact_pii(df: DataFrame, col: str = "text",
               out: str = "redacted") -> DataFrame:
    """Regex PII scrubbing (emails → <EMAIL>, IPv4 → <IP>, intl phone
    numbers → <PHONE>) with per-class match counts. Pure ``regexp_replace``
    / ``regexp_count`` Column expressions — codegen'd, zero Python, applied
    in precedence order (email before phone so '+'-less digit runs inside
    addresses can't double-match)."""
    c = F.col(col)
    n_email = F.regexp_count(c, F.lit(PII_EMAIL)).cast("long")
    after_email = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    n_ip = F.regexp_count(after_email, F.lit(PII_IPV4)).cast("long")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    n_phone = F.regexp_count(after_ip, F.lit(PII_PHONE)).cast("long")
    scrubbed = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return (
        df.withColumn("n_emails", n_email)
        .withColumn("n_ips", n_ip)
        .withColumn("n_phones", n_phone)
        .withColumn(out, scrubbed)
    )


def curate_documents(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.05,
) -> DataFrame:
    """The composite training-data curation gate: quality thresholds +
    exact near-duplicate removal in one pass, with an audit column naming
    the FIRST failed rule (empty | too_few_tokens | low_alpha |
    low_stopword | duplicate) — the lineage-preserving filter a 100 TB
    corpus pipeline needs (keep/drop is explainable per document, and the
    kept set is exactly reproducible).

    Plan shape: one scan computes every per-row signal; the only shuffle is
    the dedup window keyed on the md5 fingerprint (same key layout as
    ``dedup.exact_dedup``); duplicates resolve to the smallest ``id_col``.
    """
    c = F.col(col)
    toks = tokens_col(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    alpha_ratio = F.try_divide(n_alpha.cast("double"), n_chars)
    stop_ratio = F.try_divide(n_stop.cast("double"), n_tokens)
    fp = F.md5(F.concat_ws(" ", toks).cast("binary"))

    staged = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens_"),
        alpha_ratio.alias("alpha_ratio_"),
        stop_ratio.alias("stop_ratio_"),
        fp.alias("fp_"),
        (c.isNull() | (n_chars == 0)).alias("is_empty_"),
    )
    rank = F.row_number().over(
        Window.partitionBy("fp_").orderBy(F.col(id_col))
    )
    staged = staged.withColumn("fp_rank_", rank)
    reason = (
        F.when(F.col("is_empty_"), F.lit("empty"))
        .when(F.col("n_tokens_") < min_tokens, F.lit("too_few_tokens"))
        .when(F.col("alpha_ratio_") < min_alpha_ratio, F.lit("low_alpha"))
        .when(F.col("stop_ratio_") < min_stopword_ratio, F.lit("low_stopword"))
        .when(F.col("fp_rank_") > 1, F.lit("duplicate"))
    )
    return staged.select(
        F.col(id_col),
        reason.isNull().alias("keep"),
        F.coalesce(reason, F.lit("kept")).alias("reason"),
        F.col("n_tokens_").cast("long").alias("n_tokens"),
    )


def fingerprint_rolling(df: DataFrame, col: str = "text",
                        out: str = "rolling_fp",
                        modulus: int = 1_000_000_007,
                        base: int = 31,
                        token_hash: str = "xxhash64") -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token stream:
    h = Σ h(tok_i)·base^i (mod m), folded left-to-right with a higher-order
    ``aggregate`` — stays JVM-side; per-step pmod keeps values < m·base so
    ANSI long arithmetic can't overflow. ``token_hash='md5_60'`` swaps the
    per-token hash for the md5-derived 60-bit value (same md5 hex in every
    SQL engine), making the fingerprint externally reproducible — the same
    parity trick as dedup.simhash_signatures."""
    toks = tokens_col(F.col(col))
    if token_hash == "xxhash64":
        def h(t):
            return F.xxhash64(t)
    elif token_hash == "md5_60":
        def h(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")
    rolled = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * base + F.pmod(h(t), modulus), modulus),
    )
    return df.withColumn(out, rolled)


def vocab_coverage(
    df: DataFrame,
    vocab_size: int,
    col: str = "text",
    by: Sequence[str] = (),
) -> DataFrame:
    """Vocabulary coverage / OOV analysis: build the top-``vocab_size``
    token vocabulary by corpus frequency (lexicographic tie-break), then
    measure per-group token coverage — total occurrences, out-of-vocabulary
    occurrences, and the OOV rate. The tokenizer-budget planning step of a
    training pipeline: how much of the corpus does a k-entry vocab cover,
    and which language pays the OOV tax.

    Plan: one posting explode feeding (a) a grouped count + top-k for the
    vocab (TakeOrderedAndProject — the full frequency table is never
    globally sorted) and (b) a broadcast anti-ish left join scoring
    coverage. The vocab side is vocab_size rows — always broadcastable.
    OOV rate is a small-int ratio: engine-exact."""
    toks = tokens_col(F.col(col))
    posting = df.select(*by, F.explode(toks).alias("__tok"))
    vocab = (
        posting.groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("__tok"))
        .limit(vocab_size)
        .select("__tok", F.lit(True).alias("__in_vocab"))
    )
    scored = posting.join(F.broadcast(vocab), "__tok", "left")
    # Integer-only output: (oov_tokens, total_tokens) is arithmetic-proof
    # across engines and fetch paths; callers derive the rate themselves.
    # (A double ratio column survives fetchall but not every Arrow/pandas
    # export identically — keep verified surfaces integer-pure.)
    oov = F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
    out = scored.groupBy(*by).agg(
        F.count(F.lit(1)).alias("total_tokens"),
        oov.cast("long").alias("oov_tokens"),
    )
    return out.orderBy(*by) if by else out


def unigram_logprob(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 9,
) -> DataFrame:
    """Corpus-LM document quality score (the CCNet-style filter signal,
    reduced to its distributable core): train a unigram model ON the
    corpus itself — p(t) = count(t)/N — and score each document by its
    total token log-probability. Low-probability-dense docs (boilerplate,
    mangled encodings, keyword stuffing) score far below clean prose.

    Engine-exact by construction: each token's log10 p is quantized ONCE
    to integer nano-units (double→integer rounding is portable), and the
    per-doc figure is an INTEGER sum of those units — order-free, no
    float-summation drift.

    Plan (r12, guide §2.3 aggregate-before-shuffle / VERDICT r11 item 7):
    ONE corpus tokenize+explode pass. The (doc, term, count) table is the
    sufficient statistic for everything downstream — term frequency is
    its per-term count sum, the corpus total is the sum of those, a doc's
    token count is its per-doc count sum, and the per-doc score is the
    integer Σ count·logp_nano (logp_nano is quantized BEFORE summation,
    so weighting by count is exactly the old per-occurrence sum) — so it
    is computed once over the explode and localCheckpoint'ed (the tfidf
    precedent; the pre-r12 form ran the scan+tokenize+explode subtree
    THREE times: total, vocabulary, join-back). N stays IN the plan as a
    broadcast 1-row aggregate over the checkpointed stats (no driver
    scalar). Emits (id, n_tokens, sum_logp_nano); averages are derivable
    and deliberately not emitted as doubles."""
    scale = float(10 ** round_to)
    posting = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(col))).alias("term")
    )
    tf = (
        posting.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .localCheckpoint(eager=True)
    )
    total = tf.agg(F.sum("__cnt").cast("double").alias("__n_total"))
    freq = (
        tf.groupBy("term")
        .agg(F.sum("__cnt").alias("__cnt_t"))
        .crossJoin(F.broadcast(total))
    )
    logp_nano = F.round(
        F.log10(F.col("__cnt_t") / F.col("__n_total")) * scale, 0
    ).cast("long")
    return (
        tf.join(freq, "term")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_tokens"),
            F.sum(F.col("__cnt") * logp_nano).alias("sum_logp_nano"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 9,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF, in engine-exact FIXED POINT:
    tf = in-doc frequency ratio (exact small-int ratio), idf carried as
    integer nano-units round(ln(N/df)·1e9) — rounding a double to a nearby
    INTEGER is engine-exact, whereas rounding to decimal places is not
    (Spark rounds via exact BigDecimal, other engines via float multiply,
    and the two disagree exactly at quantization boundaries). The emitted
    ``score_nano`` = round(tf · idf_nano) is therefore reproducible
    bit-for-bit; rank ties break on the term. The (doc, term, count)
    table is the sufficient statistic for ALL THREE aggregates — doc
    length is its per-doc count sum, document frequency is its per-term
    row count (it is doc-term-distinct by construction) — so it is
    computed once over the posting explode and localCheckpoint'ed (r08:
    the three separate posting aggregates re-executed the scan+explode
    subtree each, 4 scans / 10 exchanges, now 2 / 6). N stays IN the
    plan as a broadcast 1-row count aggregate (no driver scalar).
    ``round_to`` sets the fixed-point scale (9 = nano)."""
    scale = float(10 ** round_to)
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    posting = df.select(F.col(id_col), F.explode(tokens_col(F.col(col))).alias("term"))
    tf = (
        posting.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy(id_col).agg(F.sum("__cnt").alias("__dlen"))
    dfq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(n_docs))
    )
    idf_nano = F.round(
        F.log(F.col("__n_docs") / F.col("__df")) * scale, 0
    ).cast("long")
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfq), "term")
        .select(
            id_col, "term",
            F.round(
                (F.col("__cnt").cast("double") / F.col("__dlen"))
                * idf_nano.cast("double"),
                0,
            ).cast("long").alias("score_nano"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_nano").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(id_col, "rank")
    )


def ngrams_col(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings; arrays
    shorter than ``n`` yield an empty array (guarding the DESCENDING
    sequence(1, 0) Spark would otherwise generate)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    n: int = 2,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style within-document repetition signals: for each document,
    the fraction of word n-gram occurrences that belong to (a) the single
    most frequent n-gram (``top_gram_frac``) and (b) any n-gram occurring
    more than once (``dup_gram_frac``). High values flag boilerplate,
    keyword stuffing, and template spam — the repetition filters of the
    Gopher/MassiveText quality rules (Rae et al. 2021, Table A1), reduced
    to their distributable core.

    Every document appears in the output: docs with fewer than ``n``
    tokens emit n_grams = 0 and NULL fractions (0/0 is undefined, not 0).
    Fractions are small-int ratios in doubles — engine-exact, no float
    summation. Plan: explode → two hash aggregates keyed by doc prefix
    (partial map-side combine applies) → one left join back to the doc
    spine. No windows, no global sort; scales linearly in corpus size."""
    grams = ngrams_col(tokens_col(F.col(col)), n)
    per_gram = (
        df.select(F.col(id_col), F.explode(grams).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    stats = per_gram.groupBy(id_col).agg(
        F.sum("__c").alias("n_grams"),
        F.max("__c").alias("top_gram_count"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
            "dup_gram_count"
        ),
    )
    spine = df.select(id_col)
    out = spine.join(stats, id_col, "left")
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0))
    return out.select(
        id_col,
        n_grams.alias("n_grams"),
        F.coalesce(F.col("top_gram_count"), F.lit(0)).alias("top_gram_count"),
        F.coalesce(F.col("dup_gram_count"), F.lit(0)).alias("dup_gram_count"),
        F.when(n_grams > 0,
               F.col("top_gram_count").cast("double") / n_grams)
        .alias("top_gram_frac"),
        F.when(n_grams > 0,
               F.col("dup_gram_count").cast("double") / n_grams)
        .alias("dup_gram_frac"),
    )


def bigram_logprob(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.8,
    round_to: int = 9,
) -> DataFrame:
    """Interpolated bigram-LM document score — the fluency signal one
    step up from ``unigram_logprob``: train bigram MLE on the corpus
    itself, back off to the unigram distribution,
    p(b|a) = lam * c(a,b)/c(a,·) + (1-lam) * c(b)/N, and score each doc
    by the sum of log10 p over its adjacent token pairs.

    Engine-exact like the unigram form: each PAIR's log10 p is quantized
    once to integer nano-units, the per-doc figure is an INTEGER sum.
    Plan (r08): one posexplode + one (doc, pos) window feed a PER-DOC
    pair-count table that is localCheckpoint'ed once — the bigram MLE
    table, its left-context rollup, the pair scores AND the per-doc sum
    all derive from it, so the expensive scan+explode+window subtree
    executes exactly once (the fork previously re-executed it per
    consumer: 6 parquet scans, now 3). The unigram table comes from a
    second pass over the tokens; the token total folds out of the
    unigram table as a broadcast 1-row aggregate (not a third corpus
    pass). One spine-preserving left join keeps a row for docs with
    < 2 tokens (0 bigrams, NULL score). Every shuffle key is a token or
    doc id — no global order, no driver scalars."""
    scale = float(10 ** round_to)
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(col))).alias("pos", "term"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        toks.withColumn("a", F.lag("term").over(w))
        .filter(F.col("a").isNotNull())
        .select(id_col, "a", F.col("term").alias("b"))
    )
    # (doc, a, b, k): the sufficient statistic for BOTH the corpus
    # bigram counts and the per-doc score; checkpointed so its lineage
    # runs once (size ~= distinct per-doc bigrams < corpus token count)
    pdoc = (
        pairs.groupBy(id_col, "a", "b")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)
    )
    big = pdoc.groupBy("a", "b").agg(F.sum("k").alias("cab"))
    lefts = big.groupBy("a").agg(F.sum("cab").alias("ca"))
    uni = toks.groupBy(F.col("term").alias("b")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    n_total = uni.agg(F.sum("cb").alias("nt"))
    p = (
        F.lit(lam) * (F.col("cab").cast("double") / F.col("ca").cast("double"))
        + F.lit(1.0 - lam)
        * (F.col("cb").cast("double") / F.col("nt").cast("double"))
    )
    scored = (
        big.join(lefts, "a")
        .join(uni, "b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "a", "b",
            F.round(F.log10(p) * scale, 0).cast("long").alias("logp_nano"),
        )
    )
    perdoc = (
        pdoc.join(scored, ["a", "b"])
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("logp_nano")).alias("sum_logp_nano"),
        )
    )
    return df.select(id_col).join(perdoc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "sum_logp_nano",
    )


def bpe_train_merges(
    df: DataFrame,
    n_merges: int = 4,
    col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over the corpus — the
    tokenizer-training step of an LLM data pipeline (Sennrich 2016),
    distributed: each round counts adjacent symbol pairs weighted by word
    frequency, then merges the most frequent pair everywhere,
    left-to-right non-overlapping.

    Distribution shape: the corpus collapses to the DISTINCT-WORD table
    (word, freq) after one explode+count — all |corpus| dependence ends
    there; each round is a pair explode + grouped sum over the
    vocabulary-sized frame, the winning rule rides as a broadcast 1-row
    aggregate (no driver scalar), and re-segmentation is a pure JVM array
    fold (SQL ``aggregate`` — no Python anywhere). Ties break on
    (count DESC, left ASC, right ASC) via min-of-struct with negated
    count, so the rule sequence is deterministic on any engine. At 100 TB
    the word count is the only shuffle that sees corpus cardinality;
    every round touches |vocab| rows.

    Returns (merge_rank, left, right, merged, pair_count), one row per
    learned rule, in rule order.
    """
    words = (
        df.select(F.explode(tokens_col(F.col(col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        # each round's winner AND the final rule union branch off this
        # frame — without the checkpoint the CORPUS explode re-executes
        # once per branch (n_merges+ full input passes at 100 TB); with
        # it, one corpus pass, and every later branch reads the
        # vocab-sized table (same pattern as graph.pagerank's edge table)
        .localCheckpoint(eager=True)
    )
    segs = words.select(
        "freq",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
    )
    rules = []
    for t in range(n_merges):
        counted = (
            segs.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = counted.agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), "a", "b")).alias("m")
        ).select(
            (-F.col("m.nc")).alias("__cnt"),
            F.col("m.a").alias("__a"),
            F.col("m.b").alias("__b"),
        )
        rules.append(
            best.select(
                F.lit(t + 1).alias("merge_rank"),
                F.col("__a").alias("left"),
                F.col("__b").alias("right"),
                F.concat("__a", "__b").alias("merged"),
                F.col("__cnt").alias("pair_count"),
            )
        )
        # left-to-right non-overlapping merge as a fold: append, unless
        # the accumulator's last element is `left` and the incoming
        # symbol is `right` — then replace the last element with the
        # merged token. "aaa" under (a,a) -> [aa, a], never [a, aa].
        merge_fold = (
            "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
            "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = __a "
            "          AND s = __b "
            "     THEN concat(slice(acc, 1, size(acc) - 1), "
            "                 array(concat(__a, __b))) "
            "     ELSE concat(acc, array(s)) END)"
        )
        # per-round checkpoint: rounds chain (seg3 = f(f(f(seg0)))), and
        # every round's winner branch plus the final rule union would
        # otherwise re-execute all prior rounds' aggregates (r06 plan
        # audit: 56 exchanges). Each checkpoint is the vocab-sized
        # segment table — tiny next to the corpus.
        segs = (
            segs.crossJoin(F.broadcast(best))
            .select("freq", F.expr(merge_fold).alias("syms"))
            .localCheckpoint(eager=True)
        )
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.orderBy("merge_rank")


def bpe_tokenize_counts(
    df: DataFrame,
    n_merges: int = 4,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the corpus-trained BPE merges (``bpe_train_merges``) back to
    every document — the tokenizer APPLY step: each word segments into
    the subwords produced by the ``n_merges`` learned rules in rank
    order. Emits per-document subword statistics (counts, not strings —
    the pipeline signal is sequence length for packing/budgeting).

    Plan: training as in ``bpe_train_merges`` (one corpus pass into the
    checkpointed distinct-word table; each round vocab-sized);
    application is a SECOND corpus pass — the doc-token explode joined
    to the vocab-sized segment table (AQE broadcasts it when small),
    which already holds every distinct word's segmentation. Two input
    passes total at any scale; checkpointing the exploded corpus instead
    would trade a rescan for materializing it, a loss at 100 TB.
    Returns (id, n_words, n_subwords, sum_subword_chars)."""
    words = (
        df.select(
            F.col(id_col),
            F.explode(tokens_col(F.col(col))).alias("w"),
        )
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )
    segs = vocab.select(
        "w", "freq",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
    )
    for _t in range(n_merges):
        counted = (
            segs.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = counted.agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), "a", "b")).alias("m")
        ).select(
            F.col("m.a").alias("__a"), F.col("m.b").alias("__b")
        )
        merge_fold = (
            "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
            "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = __a "
            "          AND s = __b "
            "     THEN concat(slice(acc, 1, size(acc) - 1), "
            "                 array(concat(__a, __b))) "
            "     ELSE concat(acc, array(s)) END)"
        )
        segs = (
            segs.crossJoin(F.broadcast(best))
            .select("w", "freq", F.expr(merge_fold).alias("syms"))
            .localCheckpoint(eager=True)
        )
    seg_sizes = segs.select(
        "w",
        F.size("syms").alias("__n_sub"),
        F.aggregate(
            F.transform(F.col("syms"), lambda s: F.length(s)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("__n_chars"),
    )
    scored = words.join(seg_sizes, "w")
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("__n_sub").cast("long").alias("n_subwords"),
        F.sum("__n_chars").cast("long").alias("sum_subword_chars"),
    )
    return df.select(id_col).join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_subwords", F.lit(0)).alias("n_subwords"),
        F.coalesce("sum_subword_chars", F.lit(0)).alias("sum_subword_chars"),
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for crawl-corpus dedup: lowercase scheme
    and authority, default port stripped (``:443`` for https, ``:80``
    for http), leading ``www.`` stripped, single trailing slash removed
    from the path, tracking parameters (``utm_*``) dropped, remaining
    query parameters SORTED (param order is transport noise), fragment
    dropped. Pure column expression over Spark's native ``parse_url`` —
    no UDF, fully codegen'd, so it runs at scan speed on 100 TB of crawl
    records. Two URLs that differ only in case, param order, tracking
    params, default port, www, or fragment canonicalize identically."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    auth = F.lower(F.parse_url(url, F.lit("AUTHORITY")))
    auth = F.when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).otherwise(auth)
    host = F.regexp_replace(auth, r"^www\.", "")
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), r"/$", ""
    )
    params = F.filter(
        F.split(F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    query = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )

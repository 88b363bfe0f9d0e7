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

from pyspark.sql import Column, DataFrame
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

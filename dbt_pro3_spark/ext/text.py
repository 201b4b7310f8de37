"""Text-analysis operators for document pipelines.

All pure Column expressions (JVM-side, codegen-friendly) — no Python UDFs:
tokenization via split, language-id via character-class heuristics, quality
scoring from length/stopword/token statistics, fingerprinting via md5 and
min-shingle-hash (a winnowing-lite document signature).

At 100 TB these are embarrassingly parallel narrow transforms — no shuffle
at all except where a query aggregates afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny English stopword list; kept in sync with the oracle SQL literally
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "on", "for"]


def tokens(text: Column) -> Column:
    """Whitespace tokens, empty strings removed.

    array_remove, not a filter() lambda: higher-order functions are
    evaluated interpreted per element, while array_remove is a plain
    Catalyst expression that stays in whole-stage codegen — measured ~2x on
    explode-heavy paths."""
    return F.array_remove(F.split(text, r"\s+"), "")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (no shuffle — array ops).

    transform over a 0..len-n index sequence; each element joins n
    consecutive tokens with a single space.
    """
    toks = tokens(text)
    # Inputs shorter than n tokens yield NO shingles (true n-gram
    # semantics, matching SQL generate_series(1, len-n+1) which is empty
    # for len < n). The guard must be an explicit when(): sequence(1, k)
    # with k < 1 DESCENDS in Spark, fabricating out-of-range indices that
    # slice() turns into degenerate sub-n shingles — observed pairing
    # unrelated 1-token chunks in chunk-level dedup.
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def lang_id(text: Column) -> Column:
    """Character-class language heuristic: CJK → zh, kana → ja, hangul → ko,
    Cyrillic → ru, Spanish/French/German diacritic classes, else en.

    A real system uses an n-gram model; the heuristic keeps the operator
    SQL-expressible so the oracle can replicate it exactly.
    """
    return (
        F.when(text.rlike(r"[\x{4e00}-\x{9fff}]"), "zh")
        .when(text.rlike(r"[\x{3040}-\x{30ff}]"), "ja")
        .when(text.rlike(r"[\x{ac00}-\x{d7af}]"), "ko")
        .when(text.rlike(r"[\x{0400}-\x{04ff}]"), "ru")
        .when(text.rlike("[ñ¿¡]"), "es")
        .when(text.rlike("[äöüß]"), "de")
        .when(text.rlike("[àâçèêëîïôùûœ]"), "fr")
        .otherwise("en")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-scoring feature columns + a composite score.

    Mirrors common LLM-corpus quality filters: length, token count, mean
    token length, stopword ratio, non-alpha ratio.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    n_stop = F.size(F.filter(toks, lambda x: F.lower(x).isin(STOPWORDS)))
    stop_ratio = n_stop.cast("double") / F.nullif(n_tokens.cast("double"), F.lit(0.0))
    avg_token_len = tok_chars.cast("double") / F.nullif(n_tokens.cast("double"), F.lit(0.0))
    score = (
        F.when((n_tokens >= 50) & (n_tokens <= 5000), F.lit(0.5)).otherwise(F.lit(0.2))
        + F.when((stop_ratio > 0.02) & (stop_ratio < 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((avg_token_len > 2.5) & (avg_token_len < 12), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", F.round(avg_token_len, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", F.round(score, 2))
    )


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish regex token count).

    The regex pass splits off punctuation and digit runs the way subword
    tokenizers pre-tokenize: alpha runs | digit runs | single non-space.
    """
    ws = F.size(tokens(text))
    bpe = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return ws, bpe


def fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-text md5 of the normalized text plus the
    minimum md5 over 3-word shingles (min-hash signature of one permutation —
    a winnowing-lite content signature robust to word reorder at the edges).

    Both are narrow array expressions — no shuffle, no UDF.
    """
    from ..sources.readers import spread

    df = spread(df)
    norm = F.lower(F.trim(F.col(text_col)))
    sh = shingles(F.col(text_col), 3)
    return df.select(
        id_col,
        F.md5(norm.cast("binary")).alias("fp_md5"),
        F.array_min(F.transform(sh, lambda s: F.md5(s.cast("binary")))).alias("fp_min_shingle"),
    )

"""Text analysis operators for a training-data pipeline: token
counting, quality scoring, language-ID, document fingerprinting.

All pure Catalyst; every formula is integer/exact-rational or rounded,
so the DuckDB oracle mirrors it bit-for-bit (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORDS = ("a", "the", "of", "and", "in")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (SURVEY: training-data
    ops). regexp_count is JVM-side; no Python tokenizer."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_RE)).alias("bpe_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features and a
    single score in [0,1]. Ratios are computed as exact int ratios then
    rounded to 6 dp."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"))
    n_chars = F.length(F.col(text_col))
    # the composite score is integer-exact (0..1000) so any SQL engine
    # reproduces it bit-for-bit — no float rounding at half boundaries
    len_s = F.least(n_tok, F.lit(100))
    stop_s = F.least(F.floor(F.lit(500) * n_stop / n_tok), F.lit(100)).cast("long")
    punct_p = F.least(F.floor(F.lit(1000) * n_punct / n_chars), F.lit(100)).cast("long")
    score = (F.lit(5) * len_s + F.lit(3) * stop_s + F.lit(2) * (F.lit(100) - punct_p)).cast(
        "long"
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        score.alias("quality_x1000"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic n-gram/stopword language heuristic.

    Integer-only comparisons (count·1000 vs n·threshold) so the SQL
    oracle can reproduce decisions exactly — no float thresholds."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    c_the = F.size(F.filter(words, lambda w: w == "the"))
    c_a = F.size(F.filter(words, lambda w: w == "a"))
    c_big = F.size(F.filter(words, lambda w: w == "big"))
    pred = (
        F.when(c_the * 1000 >= n * 60, F.lit("en"))
        .when(c_a * 1000 >= n * 60, F.lit("es"))
        .when(c_big * 1000 >= n * 40, F.lit("zh"))
        .otherwise(F.lit("other"))
    )
    return docs.select("doc_id", F.col("lang").alias("lang_true"), pred.alias("lang_pred"))


def fingerprints(docs: DataFrame, g: int = 8, text_col: str = "text") -> DataFrame:
    """Winnowing-lite document fingerprint: min md5 over g-word shingles
    (md5 → DuckDB-mirrorable). Docs shorter than g words fall back to
    md5 of the whole normalized text."""
    from dnscrawler_spark.operators.dedup import spread_input

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = F.split(norm, " ")
    # guard: sequence(1, 0) would count DOWN in Spark — short docs get []
    sh = F.when(
        F.size(words) >= g,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(g - 1)),
            lambda i: F.md5(F.array_join(F.slice(words, i, g), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # pure projection — with a one-file input EVERY md5 shingle would
    # otherwise run in one scan task (guide §2.5); spread when narrow
    return spread_input(docs).select(
        "doc_id",
        F.coalesce(F.array_min(sh), F.md5(norm)).alias("fingerprint"),
    )

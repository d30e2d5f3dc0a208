"""Text analysis for training-data pipelines — JVM-side exprs only.

Language-ID (stopword heuristic), quality scoring, token counting and
document fingerprinting over a ``documents``-shaped table.  Every
expression here is mirrorable in ANSI SQL (the DuckDB oracles in
``__spark_entry__.py`` reuse the same constants), and everything stays
inside whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Keep in sync with the SQL oracles.
EN_STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "it", "for", "on")
PUNCT_RE = r"[.,!?;:]"


def normalize_text(text: Column) -> Column:
    """lower + collapse whitespace + trim — the canonical text form."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    t = normalize_text(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (the BPE-ish upper bound is
    ~chars/4; see bpe_token_estimate)."""
    return F.size(tokens(text))


def bpe_token_estimate(text: Column) -> Column:
    """BPE-ish token estimate: word-pieces of <=4 chars + punctuation
    splits — deterministic arithmetic, matches the common chars/4
    heuristic while honoring word boundaries."""
    words = tokens(text)
    per_word = F.transform(
        words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long")
    )
    return F.coalesce(
        F.aggregate(per_word, F.lit(0).cast("long"), lambda a, x: a + x),
        F.lit(0).cast("long"),
    )


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.regexp_count(text, F.lit(PUNCT_RE)) / n
    )


def stopword_ratio(text: Column) -> Column:
    ws = tokens(text)
    n = F.size(ws)
    hits = F.size(F.filter(ws, lambda w: w.isin(*EN_STOPWORDS)))
    return F.when(n <= 0, F.lit(0.0)).otherwise(hits / n)


def lang_id(text: Column, threshold: float = 0.03) -> Column:
    """n-gram/stopword language heuristic: 'en' when the English
    stopword ratio clears the threshold, else 'unknown'.  (Extendable
    per-language; synthetic corpus here is English-ish.)"""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length saturation (60%% of the score at
    150+ tokens), low punctuation noise, stopword presence — the
    standard cheap pre-filter for web-crawl training text."""
    length_part = F.least(token_count(text) / F.lit(150.0), F.lit(1.0)) * 0.6
    punct_part = (F.lit(1.0) - F.least(punct_ratio(text) * 10, F.lit(1.0))) * 0.2
    stop_part = F.least(stopword_ratio(text) * 5, F.lit(1.0)) * 0.2
    return F.round(length_part + punct_part + stop_part, 6)


def fingerprint(text: Column) -> Column:
    """64-bit document fingerprint over the normalized text (rolling
    content hash; xxhash64 is the engine-wide identity hash)."""
    return F.xxhash64(normalize_text(text))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full feature set in one projection."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_token_estimate(t).alias("n_bpe_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )

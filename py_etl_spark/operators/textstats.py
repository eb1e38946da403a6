"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd) — language-ID heuristic,
quality scoring, token counting, document fingerprinting. Designed for
100 TB-scale corpora: no UDFs, no shuffles; every operator is a narrow
projection that runs map-side over the scan, so it parallelizes linearly
with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small, fixed stopword inventory per language for the n-gram/stopword
# language heuristic. Deliberately tiny + deterministic (the point is the
# Spark plumbing; swap in fastText/CLD3 via pandas_udf for production use).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def _tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty → empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(text)).cast("long")


def word_token_count(text: Column) -> Column:
    """BPE-ish word tokens: runs of alphanumerics (lowercased)."""
    t = F.lower(F.trim(text))
    cleaned = F.regexp_replace(t, r"[^a-z0-9]+", " ")
    return token_count(cleaned)


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.,;:!?'\"-]", "")).cast("long")


def stopword_count(text: Column, lang: str = "en") -> Column:
    """Occurrences of the language's marker stopwords as standalone tokens."""
    toks = _tokens(F.lower(text))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t))).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: length, punct and word-shape
    ratios (the standard cheap pre-filter before LLM training)."""
    n_chars = F.length(text).cast("double")
    n_tok = token_count(text).cast("double")
    punct_ratio = punct_count(text).cast("double") / F.greatest(n_chars, F.lit(1.0))
    avg_tok_len = n_chars / F.greatest(n_tok, F.lit(1.0))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.3)
    tok_ok = F.when((avg_tok_len >= 2.5) & (avg_tok_len <= 12.0), 1.0).otherwise(0.4)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.5)
    return F.round(len_ok * 0.4 + tok_ok * 0.4 + punct_ok * 0.2, 4)


def lang_guess(text: Column) -> Column:
    """Tiny deterministic language-ID: most marker-stopword hits wins;
    ties and zero-hit rows → 'und' (undetermined)."""
    scores = [(lang, stopword_count(text, lang)) for lang in LANG_MARKERS]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    # Later languages only win with a strictly higher score, so evaluation
    # order makes the tie-break deterministic (first language in dict wins).
    for lang, score in reversed(scores):
        guess = F.when((score == best) & (score > 0), F.lit(lang)).otherwise(guess)
    return guess


def fingerprint_md5(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat column family to a documents DataFrame."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.length(t).cast("long").alias("stat_n_chars"),
        token_count(t).alias("stat_n_tokens"),
        word_token_count(t).alias("stat_n_words"),
        punct_count(t).alias("stat_n_punct"),
        stopword_count(t).alias("stat_n_stopwords"),
        quality_score(t).alias("stat_quality"),
        lang_guess(t).alias("stat_lang_guess"),
        fingerprint_md5(t).alias("stat_fingerprint"),
    )

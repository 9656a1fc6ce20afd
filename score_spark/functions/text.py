"""Text-analysis column expressions for the documents pipeline.

Everything here returns Column expressions built from pyspark.sql.functions
higher-order functions — evaluated JVM-side with zero Python round-trips
(HOF lambdas are interpreted, not whole-stage-codegen'd, but stay orders of
magnitude faster than row-at-a-time Python UDFs), so the same expressions
hold at 100 TB.

Mirror rule for oracles: every helper has an exact DuckDB-SQL equivalent used
by the query registry (same tokenization, same rounding), so results
hash-match the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny multi-language stopword lists (public, common knowledge) used by both
# the quality scorer and the language-ID heuristic. Order matters for the
# oracle SQL mirrors in operators/textstats.py.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "une"],
    "de": ["der", "die", "und", "das", "ein", "nicht", "mit", "ist"],
    "es": ["el", "los", "y", "que", "una", "por", "con", "para"],
}

ALL_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})


def tokens(text: Column) -> Column:
    """Whitespace tokenization — split on single space, matching DuckDB's
    string_split(text, ' ')."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def sum_token_len(text: Column) -> Column:
    return F.aggregate(
        F.transform(tokens(text), lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )


def avg_token_len(text: Column, decimals: int = 4) -> Column:
    return F.round(sum_token_len(text) / token_count(text), decimals)


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column, words: list[str] | None = None) -> Column:
    wordlist = F.array(*[F.lit(w) for w in (words or ALL_STOPWORDS)])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(wordlist, t)))


def stopword_ratio(text: Column, decimals: int = 4) -> Column:
    return F.round(stopword_count(text) / token_count(text), decimals)


def non_alpha_ratio(text: Column, decimals: int = 4) -> Column:
    """Share of characters outside [a-z ]. DuckDB mirror:
    regexp_replace(text, '[a-z ]', '', 'g')."""
    return F.round(F.length(F.regexp_replace(text, "[a-z ]", "")) / F.length(text), decimals)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. DuckDB mirror in
    operators/dedup.py::_SHINGLE_SQL (1-indexed list arithmetic)."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_count(text, words) for lang, words in STOPWORDS.items()}


def predicted_lang(text: Column) -> Column:
    """Argmax over per-language stopword hits; deterministic tie-break by the
    fixed language order en > fr > de > es, 'und' (unknown) when all zero."""
    s = lang_scores(text)
    return (
        F.when((s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] > 0), "en")
        .when((s["fr"] >= s["de"]) & (s["fr"] >= s["es"]) & (s["fr"] > 0), "fr")
        .when((s["de"] >= s["es"]) & (s["de"] > 0), "de")
        .when(s["es"] > 0, "es")
        .otherwise("und")
    )

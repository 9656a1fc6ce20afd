"""Text-analysis column expressions for the documents pipeline.

Everything here returns Column expressions over JVM higher-order functions —
zero Python round-trips at execution (HOF lambdas are interpreted, not
whole-stage-codegen'd, but stay orders of magnitude faster than row-at-a-time
Python UDFs), so the same expressions hold at 100 TB.

Construction note: helpers build ONE SQL-expression string and parse it with
a single ``F.expr`` call instead of composing pyspark Column objects. The
resulting Catalyst expression tree is identical, but composing Columns costs
a Py4J round-trip per operator (~0.5-3 ms each; a stopword filter chain was
~13 ms, its ``F.expr`` twin 0.5 ms) — across a query registry that rebuilds
its plans per run, expression construction was a measurable slice of total
wall-clock. Helpers therefore take the COLUMN NAME (or any SQL fragment),
not a Column.

Mirror rule for oracles: every helper has an exact DuckDB-SQL equivalent used
by the query registry (same tokenization, same rounding), so results
hash-match the oracle.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column


def _q(text: str) -> str:
    """Backtick-quote a bare column identifier so names that collide with
    reserved words (or contain nothing SQL-special but still confuse the
    parser) resolve as columns. Anything more complex — dots, calls,
    operators, an already-quoted name — passes through verbatim: that is the
    documented escape hatch for callers handing in SQL fragments
    (ADVICE r5: a name with a space/quote/keyword was silently parsed as
    different SQL)."""
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", text):
        return f"`{text}`"
    return text

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


def _tokens_sql(text: str) -> str:
    """Whitespace tokenization — split on single space, matching DuckDB's
    string_split(text, ' ')."""
    return f"split({_q(text)}, ' ')"


def tokens(text: str = "text") -> Column:
    return F.expr(_tokens_sql(text))


def token_count(text: str = "text") -> Column:
    return F.expr(f"size({_tokens_sql(text)})")


def sum_token_len(text: str = "text") -> Column:
    return F.expr(
        f"aggregate(transform({_tokens_sql(text)}, t -> length(t)), 0, (acc, x) -> acc + x)"
    )


def avg_token_len(text: str = "text", decimals: int = 4) -> Column:
    return F.expr(
        f"round(aggregate(transform({_tokens_sql(text)}, t -> length(t)), 0,"
        f" (acc, x) -> acc + x) / size({_tokens_sql(text)}), {decimals})"
    )


def distinct_token_count(text: str = "text") -> Column:
    return F.expr(f"size(array_distinct({_tokens_sql(text)}))")


def _array_sql(words: list[str]) -> str:
    # escape single quotes so words like "don't" parse as SQL literals
    return "array(" + ", ".join("'" + w.replace("\\", "\\\\").replace("'", "\\'") + "'" for w in words) + ")"


def _stopword_count_sql(text: str, words: list[str] | None = None) -> str:
    arr = _array_sql(words or ALL_STOPWORDS)
    return f"size(filter({_tokens_sql(text)}, t -> array_contains({arr}, t)))"


def stopword_count(text: str = "text", words: list[str] | None = None) -> Column:
    return F.expr(_stopword_count_sql(text, words))


def stopword_ratio(text: str = "text", decimals: int = 4) -> Column:
    return F.expr(
        f"round({_stopword_count_sql(text)} / size({_tokens_sql(text)}), {decimals})"
    )


def non_alpha_ratio(text: str = "text", decimals: int = 4) -> Column:
    """Share of characters outside [a-z ]. DuckDB mirror:
    regexp_replace(text, '[a-z ]', '', 'g')."""
    return F.expr(
        f"round(length(regexp_replace({_q(text)}, '[a-z ]', '')) / length({_q(text)}), {decimals})"
    )


def shingles(text: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles. DuckDB mirror in
    operators/dedup.py::_SHINGLE_SQL (1-indexed list arithmetic)."""
    toks = _tokens_sql(text)
    grams = (
        f"transform(sequence(0, size({toks}) - {n}),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, {n})))"
    )
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN array_distinct({grams})"
        f" ELSE cast(array() AS array<string>) END"
    )


def _lang_score_sql(text: str, lang: str) -> str:
    return _stopword_count_sql(text, STOPWORDS[lang])


def lang_scores(text: str = "text") -> dict[str, Column]:
    return {lang: stopword_count(text, words) for lang, words in STOPWORDS.items()}


def predicted_lang(text: str = "text") -> Column:
    """Argmax over per-language stopword hits; deterministic tie-break by the
    fixed language order en > fr > de > es, 'und' (unknown) when all zero."""
    s = {lang: _lang_score_sql(text, lang) for lang in STOPWORDS}
    return F.expr(
        "CASE"
        f" WHEN {s['en']} >= {s['fr']} AND {s['en']} >= {s['de']}"
        f"  AND {s['en']} >= {s['es']} AND {s['en']} > 0 THEN 'en'"
        f" WHEN {s['fr']} >= {s['de']} AND {s['fr']} >= {s['es']} AND {s['fr']} > 0 THEN 'fr'"
        f" WHEN {s['de']} >= {s['es']} AND {s['de']} > 0 THEN 'de'"
        f" WHEN {s['es']} > 0 THEN 'es'"
        " ELSE 'und' END"
    )

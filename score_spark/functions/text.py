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
    different SQL).

    CONTRACT for non-identifier column NAMES (``a-b``, ``my col``): a raw
    string like "a-b" is indistinguishable from the SQL fragment a minus b,
    so this helper cannot quote it for you — pass it pre-backticked
    ("`a-b`") and it flows through as the (already safe) fragment. One
    regex cannot close that ambiguity; what it does close is the
    reserved-word/bare-name class."""
    # digit-leading names included (review r7): a column literally named
    # "2022" is never a valid bare SQL fragment on its own, and unquoted it
    # parses as a NUMERIC LITERAL — split(2022, ' ') silently token-counts
    # the constant instead of the column
    if re.fullmatch(r"[A-Za-z0-9_]+", text):
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


def _tokens_sql(text: str, tokens_col: str | None = None) -> str:
    """Whitespace tokenization — split on single space, matching DuckDB's
    string_split(text, ' ').

    ``tokens_col`` names a PRE-SPLIT array<string> column to use instead of
    re-splitting ``text``. This matters far beyond style: helper expressions
    embed the tokens fragment several times (a shingle slices it once PER
    ELEMENT), higher-order-function lambdas are interpreted (never
    whole-stage-codegen'd), and interpreted evaluation does no common-
    subexpression elimination — so an inlined split() re-runs on every
    reference, turning linear expressions quadratic in document length.
    Hoisting the split into one projected column (Catalyst's CollapseProject
    deliberately keeps multi-use aliases un-inlined) measured 2x on the
    repetition-stats query at sf0.1. Query-level pattern:
    ``df.select("*", tokens(text).alias("_toks"))`` then pass
    ``tokens_col="_toks"`` to every downstream helper."""
    if tokens_col is not None:
        return _q(tokens_col)
    return f"split({_q(text)}, ' ')"


def tokens(text: str = "text") -> Column:
    return F.expr(_tokens_sql(text))


def token_count(text: str = "text", tokens_col: str | None = None) -> Column:
    return F.expr(f"size({_tokens_sql(text, tokens_col)})")


def _sum_len_sql(toks: str) -> str:
    # ONE definition of the length-sum fragment (seed + lambda), shared by
    # sum/avg the way the stopword helpers share _stopword_count_sql.
    # BIGINT seed: an int seed made the fold accumulate in int32, silently
    # wrapping (ANSI off) or throwing (ANSI on) once a document's total
    # token characters pass 2^31 — the DuckDB mirror sums in HUGEINT, so
    # the two engines diverged exactly on the frames this module claims to
    # hold at scale (review r8)
    return (
        f"aggregate(transform({toks}, t -> length(t)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def sum_token_len(text: str = "text", tokens_col: str | None = None) -> Column:
    return F.expr(_sum_len_sql(_tokens_sql(text, tokens_col)))


def _scaled_round(expr: str, decimals: int) -> str:
    """Scale-then-round: round(x, dp) diverges between Spark and DuckDB on
    decimal-midpoint doubles (e.g. 57/800 = 0.07125 -> 0.0713 vs 0.0712 —
    review r9, same class profiling.py documents). Multiplying first makes
    both engines round the identical IEEE intermediate half-away-from-zero.
    Oracle mirrors MUST use the same form: round(expr * 10^dp) / 10^dp."""
    scale = float(10 ** decimals)
    return f"round(({expr}) * {scale}) / {scale}"


def avg_token_len(
    text: str = "text", decimals: int = 4, tokens_col: str | None = None
) -> Column:
    toks = _tokens_sql(text, tokens_col)
    return F.expr(_scaled_round(f"try_divide({_sum_len_sql(toks)}, size({toks}))", decimals))


def distinct_token_count(text: str = "text", tokens_col: str | None = None) -> Column:
    return F.expr(f"size(array_distinct({_tokens_sql(text, tokens_col)}))")


def _array_sql(words: list[str]) -> str:
    # escape single quotes so words like "don't" parse as SQL literals
    return "array(" + ", ".join("'" + w.replace("\\", "\\\\").replace("'", "\\'") + "'" for w in words) + ")"


def _stopword_count_sql(
    text: str, words: list[str] | None = None, tokens_col: str | None = None
) -> str:
    arr = _array_sql(words or ALL_STOPWORDS)
    return f"size(filter({_tokens_sql(text, tokens_col)}, t -> array_contains({arr}, t)))"


def stopword_count(
    text: str = "text", words: list[str] | None = None, tokens_col: str | None = None
) -> Column:
    return F.expr(_stopword_count_sql(text, words, tokens_col))


def stopword_ratio(
    text: str = "text", decimals: int = 4, tokens_col: str | None = None
) -> Column:
    return F.expr(_scaled_round(
        f"try_divide({_stopword_count_sql(text, tokens_col=tokens_col)},"
        f" size({_tokens_sql(text, tokens_col)}))", decimals
    ))


def non_alpha_ratio(text: str = "text", decimals: int = 4) -> Column:
    """Share of characters outside [a-z ]. DuckDB mirror:
    regexp_replace(text, '[a-z ]', '', 'g'). try_divide: an EMPTY document
    divides by length 0, which THROWS under ANSI mode (review r9, confirmed:
    one '' text row killed the whole job) — NULL mirrors DuckDB's
    division-by-zero semantics."""
    return F.expr(_scaled_round(
        f"try_divide(length(regexp_replace({_q(text)}, '[a-z ]', '')), length({_q(text)}))",
        decimals,
    ))


def shingles(text: str = "text", n: int = 3, tokens_col: str | None = None) -> Column:
    """Distinct word n-gram shingles. DuckDB mirror in
    operators/dedup.py::_SHINGLE_SQL (1-indexed list arithmetic).

    Pass ``tokens_col`` on any non-trivial input: the inlined split is
    referenced once per SHINGLE by the slice lambda (interpreted HOFs do no
    subexpression elimination — see ``_tokens_sql``), making the inline form
    quadratic in document length."""
    toks = _tokens_sql(text, tokens_col)
    grams = (
        f"transform(sequence(0, size({toks}) - {n}),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, {n})))"
    )
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN array_distinct({grams})"
        f" ELSE cast(array() AS array<string>) END"
    )


def _lang_score_sql(text: str, lang: str, tokens_col: str | None = None) -> str:
    return _stopword_count_sql(text, STOPWORDS[lang], tokens_col)


def lang_scores(text: str = "text", tokens_col: str | None = None) -> dict[str, Column]:
    return {
        lang: stopword_count(text, words, tokens_col) for lang, words in STOPWORDS.items()
    }


def lang_argmax_sql(s: dict[str, str]) -> str:
    """The language-ID CASE over per-language score FRAGMENTS (column names
    or SQL). GENERATED from the fragments' key order (STOPWORDS insertion
    order = tie-break priority: earlier wins ties), 'und' (unknown) when all
    zero — so adding a language to STOPWORDS extends the argmax instead of
    silently scoring-but-never-predicting it (review r7). Callers with
    non-trivial score expressions should project them into columns first:
    the first language's score is referenced once per branch, and
    interpreted filter passes re-run per reference."""
    langs = list(s)
    branches = []
    for i, lang in enumerate(langs):
        later = langs[i + 1 :]
        conds = [f"{s[lang]} >= {s[o]}" for o in later] + [f"{s[lang]} > 0"]
        branches.append(f" WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE" + "".join(branches) + " ELSE 'und' END"


def predicted_lang(text: str = "text", tokens_col: str | None = None) -> Column:
    """Argmax over per-language stopword hits, as one self-contained
    expression (each score inlined at every CASE reference — fine for ad-hoc
    use; hot paths should project ``lang_scores`` columns and apply
    ``lang_argmax_sql`` over the column names instead)."""
    s = {lang: _lang_score_sql(text, lang, tokens_col) for lang in STOPWORDS}
    return F.expr(lang_argmax_sql(s))

"""Text-analysis operators over the documents table: token statistics,
quality scoring, language ID, document fingerprinting.

Scale posture: every expression is a built-in higher-order function — one
scan, no shuffle until the final (tiny) aggregate, no Python. At 100 TB this
is a map-only stage that AQE coalesces; the only shuffled bytes are the
grouped aggregates' partial results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from score_spark.functions import text as TX
from score_spark.io import EXPLODE_BYTES_PER_TASK, fan_out, load_table, presentation_sort

# DuckDB mirrors of functions/text.py (1-indexed lists; list_* HOFs).
# length(), never strlen(): Spark's length counts CHARACTERS while
# DuckDB's strlen counts BYTES — any multibyte char (café) diverged
# the gate; DuckDB's length() is the character-exact mirror (review r8)
_TOKENS = "string_split(text, ' ')"
_NTOK = f"len({_TOKENS})"
_SUMLEN = f"CAST(list_sum(list_transform({_TOKENS}, t -> length(t))) AS BIGINT)"
_STOPLIST = "[" + ", ".join(f"'{w}'" for w in TX.ALL_STOPWORDS) + "]"
_NSTOP = f"len(list_filter({_TOKENS}, t -> list_contains({_STOPLIST}, t)))"


def _check_helper_collisions(
    df: DataFrame, helpers: tuple[str, ...], op: str = "text-stats operators"
) -> None:
    """The hoisted-projection helpers AND the appended output columns are
    injected with select('*', ...) and referenced by name downstream; an
    input frame that already carries any of these names would make the
    reference ambiguous (or silently bind to the wrong column). Fail loudly
    at the boundary instead (ADVICE r6; review r7 extended the check from
    the internal _toks/_ls_* names to the output names too). Both sides of
    the comparison lowercase — Spark resolves case-insensitively, so a
    case-variant collision is just as ambiguous (review r8: pipeline's
    hand-rolled copy dropped the candidate-side lower() and missed them).
    ``op`` names the caller in the error; shared by the pipeline operators
    so there is ONE audited implementation of this boundary rule."""
    lower = {c.lower() for c in df.columns}
    hit = [h for h in helpers if h.lower() in lower]
    if hit:
        raise ValueError(
            f"input columns collide with internal helper name(s) {hit}; "
            f"rename or drop them before calling {op}"
        )


def with_text_stats(df: DataFrame, text_col: str = "text", spread: bool = True) -> DataFrame:
    """Append per-document token statistics (all JVM built-ins).
    ``spread=False`` skips the round-robin fan-out for callers that already
    partitioned the input themselves (e.g. t01's range fusion).

    The split is hoisted into one ``_toks`` projection shared by every stat:
    interpreted HOFs re-evaluate an inlined split() on each reference (no
    subexpression elimination outside codegen — see text._tokens_sql), and
    CollapseProject keeps a multi-use alias un-inlined, so this is one
    tokenization per row instead of five."""
    _check_helper_collisions(
        df,
        (
            "_toks",
            "n_tokens",
            "n_uniq_tokens",
            "avg_token_len",
            "stopword_ratio",
            "non_alpha_ratio",
        ),
    )
    # several regex/split passes per row: ~10-50x a plain byte scan
    base = fan_out(df, min_bytes_per_task=EXPLODE_BYTES_PER_TASK) if spread else df
    toked = base.select("*", TX.tokens(text_col).alias("_toks"))
    return toked.select(
        *base.columns,
        TX.token_count(tokens_col="_toks").alias("n_tokens"),
        TX.distinct_token_count(tokens_col="_toks").alias("n_uniq_tokens"),
        TX.avg_token_len(tokens_col="_toks").alias("avg_token_len"),
        TX.stopword_ratio(tokens_col="_toks").alias("stopword_ratio"),
        TX.non_alpha_ratio(text_col).alias("non_alpha_ratio"),
    )


def with_language(df: DataFrame, text_col: str = "text", keep_tokens: bool = False) -> DataFrame:
    """Append the language-ID argmax. Two hoist layers (same rationale as
    with_text_stats): the split feeds four per-language filter passes via
    ``_toks``, and the four SCORES are projected as columns before the CASE
    — the en score alone is referenced four times by the argmax, which
    would otherwise re-run its filter pass per reference."""
    _check_helper_collisions(
        df, ("_toks", "predicted_lang", *[f"_ls_{lang}" for lang in TX.STOPWORDS])
    )
    # predicted_lang is a chain of stopword-filter passes — heavy per
    # byte, so the fan-out floor scales down like with_text_stats above
    spread = fan_out(df, min_bytes_per_task=EXPLODE_BYTES_PER_TASK)
    toked = spread.select("*", TX.tokens(text_col).alias("_toks"))
    scored = toked.select(
        "*",
        *[
            TX.stopword_count(words=w, tokens_col="_toks").alias(f"_ls_{lang}")
            for lang, w in TX.STOPWORDS.items()
        ],
    )
    argmax = TX.lang_argmax_sql({lang: f"_ls_{lang}" for lang in TX.STOPWORDS})
    keep = [*spread.columns, "_toks"] if keep_tokens else spread.columns
    return scored.select(*keep, F.expr(argmax).alias("predicted_lang"))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content fingerprint (md5 hex — same function in DuckDB)."""
    return df.withColumn("fingerprint", F.md5(F.col(text_col)))


# ------------------------------------------------------------------ queries


def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One stats pass: range-partition the raw scan on doc_id (cheap for the
    range sampler to re-read) so the HOF stats run once and the id-ordered
    output is a free in-partition sort — a global orderBy AFTER the stats
    would make the sampler re-execute every HOF (same fusion as c01)."""
    d = load_table(spark, sf_dir, "documents")
    return with_text_stats(d.repartitionByRange("doc_id"), spread=False).select(
        "doc_id", "n_tokens", "n_uniq_tokens", "avg_token_len", "stopword_ratio"
    ).sortWithinPartitions("doc_id")


ORACLE_T01 = f"""
SELECT doc_id,
       {_NTOK} AS n_tokens,
       len(list_distinct({_TOKENS})) AS n_uniq_tokens,
       round(({_SUMLEN} / CAST({_NTOK} AS DOUBLE)) * 10000.0) / 10000.0 AS avg_token_len,
       round(({_NSTOP} / CAST({_NTOK} AS DOUBLE)) * 10000.0) / 10000.0 AS stopword_ratio
FROM documents
ORDER BY doc_id
"""


def t02_language_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID + quality scoring in one map-only pass: stopword-hit
    argmax language prediction vs the labeled lang column, crossed with the
    quality heuristic bands (length x stopword presence x alpha purity) —
    the two per-doc classification families a filtering pipeline computes
    together anyway. Merged t02+t03 (r5 registry consolidation). All bands
    are JVM HOF/CASE expressions; one tiny grouped aggregate."""
    d = load_table(spark, sf_dir, "documents")
    return (
        with_language(d, keep_tokens=True)  # bands reuse the hoisted _toks
        .select(
            "lang",
            "predicted_lang",
            F.when(F.col("n_chars") < 200, "short")
            .when(F.col("n_chars") < 400, "medium")
            .otherwise("long")
            .alias("length_band"),
            F.when(TX.stopword_ratio(tokens_col="_toks") > 0.05, "has_stopwords").otherwise("few_stopwords").alias("stopword_band"),
            F.when(TX.non_alpha_ratio("text") < 0.05, "clean").otherwise("noisy").alias("purity"),
        )
        .groupBy("lang", "predicted_lang", "length_band", "stopword_band", "purity")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .transform(presentation_sort, "lang", "predicted_lang", "length_band", "stopword_band", "purity")
    )


def _lang_score_sql(lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS[lang]) + "]"
    return f"len(list_filter(string_split(text, ' '), t -> list_contains({lst}, t)))"


ORACLE_T02 = f"""
WITH scored AS (
  SELECT lang,
         {_lang_score_sql('en')} AS s_en,
         {_lang_score_sql('fr')} AS s_fr,
         {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('es')} AS s_es,
         CASE WHEN n_chars < 200 THEN 'short' WHEN n_chars < 400 THEN 'medium' ELSE 'long' END AS length_band,
         CASE WHEN round(({_NSTOP} / CAST({_NTOK} AS DOUBLE)) * 10000.0) / 10000.0 > 0.05 THEN 'has_stopwords' ELSE 'few_stopwords' END AS stopword_band,
         CASE WHEN round((length(regexp_replace(text, '[a-z ]', '', 'g')) / CAST(length(text) AS DOUBLE)) * 10000.0) / 10000.0 < 0.05
              THEN 'clean' ELSE 'noisy' END AS purity
  FROM documents
)
SELECT lang,
       CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
            WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr'
            WHEN s_de >= s_es AND s_de > 0 THEN 'de'
            WHEN s_es > 0 THEN 'es'
            ELSE 'und' END AS predicted_lang,
       length_band, stopword_band, purity,
       count(*) AS n_docs
FROM scored
GROUP BY 1, 2, 3, 4, 5
ORDER BY lang, predicted_lang, length_band, stopword_band, purity
"""


# GPT-2-style pre-tokenizer shape, simplified to a class alphabet both Java
# regex (Spark) and RE2 (DuckDB) treat identically: letter runs, single
# digits, and single punctuation marks each count as one subword unit.
_BPE_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]"


def bpe_token_estimate(text_col, pattern: str = _BPE_PATTERN):
    """Estimated subword token count: regex unit count (JVM-side
    regexp_count) — the standard cheap proxy for BPE token budgeting."""
    return F.regexp_count(F.lower(text_col), F.lit(pattern))


def t04_fingerprint_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting + token-budget accounting in one pass, grouped
    by (source, lang): exact md5 fingerprints with per-group uniqueness, and
    BPE-ish unit counts next to whitespace word counts and the chars/4 rule
    of thumb. Merged t04+t05 (r5 registry consolidation). Map-only scan; one
    grouped aggregate (the countDistinct expands to Spark's standard
    two-stage distinct plan)."""
    d = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    per_doc = fan_out(d).select(
        "source",
        "lang",
        F.md5(c).alias("fingerprint"),
        bpe_token_estimate(c).alias("bpe"),
        TX.token_count("text").alias("words"),
        (F.length(c) / 4).alias("chars4"),
    )
    return (
        per_doc.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique"),
            F.min("fingerprint").alias("min_fp"),
            F.sum("bpe").alias("total_bpe_tokens"),
            (F.round(F.avg("bpe") * 10000.0) / 10000.0).alias("avg_bpe_tokens"),
            (F.round(F.avg(F.col("bpe") / F.col("words")) * 10000.0) / 10000.0).alias("bpe_per_word"),
            (F.round(F.avg("chars4") * 10000.0) / 10000.0).alias("avg_chars4"),
        )
        .transform(presentation_sort, "source", "lang")
    )


ORACLE_T04 = f"""
WITH per_doc AS (
  SELECT source, lang,
         md5(text) AS fingerprint,
         len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS bpe,
         {_NTOK} AS words,
         length(text) / 4.0 AS chars4
  FROM documents
)
SELECT source, lang,
       count(*) AS n_docs,
       count(DISTINCT fingerprint) AS n_unique,
       min(fingerprint) AS min_fp,
       CAST(sum(bpe) AS BIGINT) AS total_bpe_tokens,
       round(avg(bpe) * 10000.0) / 10000.0 AS avg_bpe_tokens,
       round(avg(bpe / CAST(words AS DOUBLE)) * 10000.0) / 10000.0 AS bpe_per_word,
       round(avg(chars4) * 10000.0) / 10000.0 AS avg_chars4
FROM per_doc
GROUP BY source, lang
ORDER BY source, lang
"""


# backslash-free patterns (Java regex == RE2, same rationale as
# pipeline.PII_PATTERNS): URLs and emails — the spans a linkification /
# reference-extraction pass pulls out of web text before training
_URL_PATTERN = "https?://[a-zA-Z0-9./_-]+"
_EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"


def extract_span_counts(
    df: DataFrame, text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-row counts of extractable spans (URLs, emails by default) as
    codegen'd JVM regexp_count columns — the first half of a link/reference
    extraction pass (the second half, regexp_extract_all + explode, has the
    same plan shape as q20's token explode). Map-only: fuses into the scan
    stage, zero shuffle at any scale."""
    patterns = patterns or {"urls": _URL_PATTERN, "emails": _EMAIL_PATTERN}
    out = df
    for name, pat in patterns.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
    return out


def t06_span_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span extraction proven end-to-end like c04: deterministic URLs/emails
    planted per doc_id (every 3rd doc gets an email, every 3rd+1 a URL), then
    counted per source with docs-with-any-span coverage. The planting makes
    the counts non-trivial (raw synthetic text contains neither)."""
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" reach u"), F.col("doc_id").cast("string"), F.lit("@example.org")))
            .when(F.col("doc_id") % 3 == 1,
                  F.concat(F.lit(" via https://ex.org/p/"), F.col("doc_id").cast("string")))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    s = extract_span_counts(planted)
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_urls").cast("long").alias("total_urls"),
            F.sum("n_emails").cast("long").alias("total_emails"),
            F.sum(F.when((F.col("n_urls") + F.col("n_emails")) > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_with_spans"),
        )
        .transform(presentation_sort, "source")
    )


ORACLE_T06 = f"""
WITH planted AS (
  SELECT doc_id, source,
         text || CASE WHEN doc_id % 3 = 0 THEN ' reach u' || CAST(doc_id AS VARCHAR) || '@example.org'
                      WHEN doc_id % 3 = 1 THEN ' via https://ex.org/p/' || CAST(doc_id AS VARCHAR)
                      ELSE '' END AS text
  FROM documents
),
counted AS (
  SELECT source,
         len(regexp_extract_all(text, '{_URL_PATTERN}')) AS n_urls,
         len(regexp_extract_all(text, '{_EMAIL_PATTERN}')) AS n_emails
  FROM planted
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_urls) AS BIGINT) AS total_urls,
       CAST(sum(n_emails) AS BIGINT) AS total_emails,
       CAST(sum(CASE WHEN n_urls + n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_spans
FROM counted
GROUP BY source
ORDER BY source
"""





def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document repetition signals — the Gopher/RefinedWeb-style quality
    rule family: dup_fraction = share of word 2-grams that are repeats of an
    earlier 2-gram in the same doc, top_fraction = share held by the single
    most frequent 2-gram. Highly repetitive docs (boilerplate, keyword spam,
    generation loops) score high and get filtered before training.

    Shape: MAP-ONLY. A gram never needs to leave its document, so the stats
    come from in-row JVM HOFs — n_grams = size, n_distinct via
    array_distinct, and the top gram count as the longest equal-run of the
    SORTED gram array (one aggregate pass with (prev, run, best) struct
    state). Zero shuffle at any scale (the r4 explode -> two-aggregate shape
    shuffled a token-stream-sized table to compute a per-row property; it
    also hashed grams to narrow that shuffle — exact strings need no such
    tradeoff in-row). Docs with < 2 words have no 2-grams and are excluded,
    matching the explode semantics. ``carry_cols`` ride along so callers
    don't need a join to recover doc attributes.

    The split is hoisted into a ``_w`` projection: the gram lambda indexes
    the token array twice PER GRAM, and interpreted HOF evaluation re-runs
    an inlined split() on every reference (quadratic in doc length) — the
    hoist alone measured 2x on t07 at sf0.1 (see text._tokens_sql)."""
    w = "_w"
    grams = (
        f"transform(sequence(0, size({w}) - 2),"
        f" i -> concat_ws(' ', {w}[i], {w}[i + 1]))"
    )
    # longest equal-run over the sorted grams == max frequency of any gram
    best = (
        "aggregate(array_sort(_grams),"
        " named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),"
        " (a, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1L, 1L),"
        "   'best', greatest(a.best, IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1L, 1L))),"
        " a -> a.best)"
    )
    return (
        df.select(id_col, *carry_cols, TX.tokens(text_col).alias(w))
        .filter(F.expr(f"size({w}) >= 2"))
        .select(id_col, *carry_cols, F.expr(grams).alias("_grams"))
        .select(
            id_col,
            *carry_cols,
            F.expr("size(_grams)").cast("long").alias("n_grams"),
            F.expr(
                "round((1 - size(array_distinct(_grams)) / size(_grams)) * 10000.0)"
                " / 10000.0"
            ).alias("dup_fraction"),
            F.expr(
                f"round(({best} / size(_grams)) * 10000.0) / 10000.0"
            ).alias("top_fraction"),
        )
    )


def t07_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-quality summary per source: how repetitive the corpus is
    and how many docs a dup-fraction filter would drop."""
    d = load_table(spark, sf_dir, "documents")
    # interpreted HOF per-doc cost (array_sort + struct-state aggregate) is
    # ~50x a plain scan (measured 3.8 s single-task vs 1.0 s spread at
    # sf0.1); source rides through, no join needed
    r = repetition_stats(
        fan_out(d, min_bytes_per_task=EXPLODE_BYTES_PER_TASK), carry_cols=("source",)
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.round(F.avg("dup_fraction") * 10000.0) / 10000.0).alias("avg_dup_fraction"),
            (F.round(F.avg("top_fraction") * 10000.0) / 10000.0).alias("avg_top_fraction"),
            F.sum(F.when(F.col("dup_fraction") >= 0.05, 1).otherwise(0))
            .cast("long")
            .alias("n_repetitive"),
        )
        .transform(presentation_sort, "source")
    )


ORACLE_T07 = """
WITH grams AS (
  SELECT doc_id,
         unnest(list_transform(range(greatest(len(string_split(text, ' ')) - 1, 0)),
                i -> concat_ws(' ', string_split(text, ' ')[i + 1], string_split(text, ' ')[i + 2]))) AS g
  FROM documents
),
per_gram AS (
  SELECT doc_id, g, count(*) AS cnt FROM grams GROUP BY doc_id, g
),
per_doc AS (
  SELECT doc_id,
         sum(cnt) AS n_grams,
         count(*) AS n_distinct,
         max(cnt) AS top_cnt
  FROM per_gram GROUP BY doc_id
),
scored AS (
  SELECT doc_id,
         round((1 - n_distinct / CAST(n_grams AS DOUBLE)) * 10000.0) / 10000.0 AS dup_fraction,
         round((top_cnt / CAST(n_grams AS DOUBLE)) * 10000.0) / 10000.0 AS top_fraction
  FROM per_doc
)
SELECT d.source,
       count(*) AS n_docs,
       round(avg(s.dup_fraction) * 10000.0) / 10000.0 AS avg_dup_fraction,
       round(avg(s.top_fraction) * 10000.0) / 10000.0 AS avg_top_fraction,
       CAST(sum(CASE WHEN s.dup_fraction >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
FROM scored s JOIN documents d USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


QUERIES = {
    "t01_text_stats": t01_text_stats,
    "t02_language_quality": t02_language_quality,
    "t04_fingerprint_tokens": t04_fingerprint_tokens,
    "t06_span_extraction": t06_span_extraction,
    "t07_repetition_stats": t07_repetition_stats,
}

ORACLE = {
    "t01_text_stats": ORACLE_T01,
    "t02_language_quality": ORACLE_T02,
    "t04_fingerprint_tokens": ORACLE_T04,
    "t06_span_extraction": ORACLE_T06,
    "t07_repetition_stats": ORACLE_T07,
}

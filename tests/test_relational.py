"""Every relational query must hash-match its DuckDB oracle — the local mirror
of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from score_spark.queries import ORACLE, QUERIES
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    if name not in ORACLE:
        pytest.skip(f"{name} has no SQL oracle (rows-only check)")
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, oracle_con, ORACLE[name])


def test_registry_fits_driver_correctness_window():
    """The driver's CORRECTNESS gate checks only the FIRST 50 registry
    entries (VERDICT r4 headline #1: 60 registered -> 10 operators lost
    their green rows). Every queries() entry must fit the window."""
    assert len(QUERIES) <= 50, (
        f"registry has {len(QUERIES)} entries; the driver gates only the "
        "first 50 — consolidate (merge construct-variant queries) before adding"
    )


def test_fused_range_window_order_matches_global_sort(spark, sf_dir):
    """q09_window_suite fuses the window exchange with the output order (ONE
    range exchange shared by both window sort orders; final order via
    sortWithinPartitions). The collected row ORDER must be byte-identical to
    a true global orderBy — canonicalized oracle checks would not catch an
    ordering regression here."""
    from score_spark.queries.relational import q09_window_suite

    df = q09_window_suite(spark, sf_dir)
    assert df.collect() == df.orderBy("o_custkey", "o_orderkey").collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only exchange is the range partition (the AQE plan string may
    # render the tree twice, so assert presence/absence, not count)
    assert "Exchange rangepartitioning" in plan
    assert "Exchange hashpartitioning" not in plan


def test_python_udtf_lateral_matches_explode(spark, sf_dir):
    """Python UDTF coverage (SURVEY §2B 'UDAF/UDTF beyond explode' probe,
    tests-only twin of q27's UDAF): a table function lateral-joined per row
    must emit exactly what the built-in explode(split()) emits. UDTFs are
    the row-generating extension point; the built-in stays the hot-path
    choice (JVM, codegen) — the test proves the extension point works, not
    that it should replace explode."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import udtf

    from score_spark.io import load_table

    @udtf(returnType="pos: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                if w:
                    yield i, w

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "documents").limit(50).createOrReplaceTempView("v_udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, s.pos, s.word FROM v_udtf_docs d, LATERAL split_words(d.text) s"
    )
    want = (
        spark.table("v_udtf_docs")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .filter(F.col("word") != "")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_t01_fused_order_matches_global_sort(spark, sf_dir):
    """t01's range fusion must produce byte-identical row order to a true
    global orderBy over the stats output."""
    from score_spark.operators.textstats import t01_text_stats

    df = t01_text_stats(spark, sf_dir)
    assert df.collect() == df.orderBy("doc_id").collect()


def test_repetition_stats_planted_values(spark):
    """Hand-computable repetition fixture: a doc of one repeated 2-gram, a
    doc with no repeats, and a 1-word doc (no 2-grams at all — must not
    fabricate grams from a descending sequence)."""
    from score_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # grams: ab,ba,ab,ba,ab -> 5 total, 2 distinct, top=3
            (2, "w x y z"),           # 3 grams, all distinct
            (3, "solo"),              # no 2-grams -> absent from output
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_grams == 5 and got[1].dup_fraction == 0.6 and got[1].top_fraction == 0.6
    assert got[2].n_grams == 3 and got[2].dup_fraction == 0.0


def test_prepared_query_catalog_memoizes_plans(spark):
    """Plan-only memoization: a memoized query returns the SAME DataFrame
    object per (session, sf_dir) — construction paid once — while the
    construction-materializing opt-outs rebuild per call."""
    from score_spark.queries import _NO_MEMO, QUERIES

    sf = "/root/testdata/sf0.001"
    df1 = QUERIES["q01_pricing_summary"](spark, sf)
    df2 = QUERIES["q01_pricing_summary"](spark, sf)
    assert df1 is df2
    # a different sf_dir is a different prepared plan
    assert QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.01") is not df1
    # opt-outs are the raw callables (no wrapper attribute on the session)
    assert all(n in QUERIES for n in _NO_MEMO)
    d1 = QUERIES["d02_ngram_jaccard"](spark, sf)
    d2 = QUERIES["d02_ngram_jaccard"](spark, sf)
    assert d1 is not d2


def test_memoized_construction_runs_no_spark_jobs(spark, sf_dir):
    """The bench-fairness invariant behind the prepared-query catalog
    (VERDICT r5 "What's wrong" #3): any memoized query whose CONSTRUCTION
    runs a Spark action silently turns its best-of-N bench repeats into
    cache reads of frozen results. Build every non-_NO_MEMO query under a
    dedicated job group and assert the group stayed empty — a future query
    that materializes during construction without an opt-out fails here."""
    from score_spark.io import TABLES, load_table
    from score_spark.queries import _NO_MEMO, QUERIES

    sc = spark.sparkContext
    # pre-warm the table catalog: the FIRST read of each parquet table runs
    # one schema-inference/footer job, memoized for the session by
    # load_table — a one-time registration cost, not query materialization,
    # so it is not what this guard polices
    for t in TABLES:
        load_table(spark, sf_dir, t)
    # force real construction: the wrapper may have cached plans from other
    # tests in this session
    if hasattr(spark, "_score_query_cache"):
        spark._score_query_cache.clear()
    offenders = {}
    for name, fn in sorted(QUERIES.items()):
        if name in _NO_MEMO:
            continue
        group = f"memo-guard-{name}"
        sc.setJobGroup(group, "memoization fairness guard")
        try:
            fn(spark, sf_dir)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        if jobs:
            offenders[name] = len(jobs)
    assert not offenders, (
        f"memoized queries ran Spark jobs during construction: {offenders}; "
        "add them to _NO_MEMO or make construction action-free"
    )


def test_registry_name_sets_are_consistent():
    """Guard against silent rot in the three name sets that shape the gates:
    every memoization opt-out and every baseline-skip must name a REAL
    registry entry (a renamed query leaving a stale entry would silently
    re-enable memoization or re-include a verification-shaped oracle in the
    ratio), and every query needs an oracle or a documented rows-only
    status."""
    from bench import _BASELINE_SKIP
    from score_spark.queries import _NO_MEMO, ORACLE, QUERIES

    assert _NO_MEMO <= set(QUERIES), _NO_MEMO - set(QUERIES)
    assert _BASELINE_SKIP <= set(QUERIES), _BASELINE_SKIP - set(QUERIES)
    # oracle keys must match registry keys exactly (driver pairs them)
    assert set(ORACLE) <= set(QUERIES), set(ORACLE) - set(QUERIES)
    missing_oracle = set(QUERIES) - set(ORACLE)
    # every query currently has a SQL oracle; if a future non-SQL-expressible
    # operator lands, list it here explicitly so the weaker rows-only check
    # is a documented decision, not an accident
    assert missing_oracle == set(), missing_oracle


def test_operator_catalog_is_fresh():
    """OPERATORS.md is generated from the registry + docstrings; a stale
    committed copy misdocuments the gated surface. Regenerate with
    `python tools/gen_catalog.py > OPERATORS.md` when this fails."""
    import io
    import os
    import sys
    from contextlib import redirect_stdout

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from gen_catalog import main as gen_main

    buf = io.StringIO()
    with redirect_stdout(buf):
        gen_main()
    committed = open(os.path.join(repo, "OPERATORS.md")).read()
    assert buf.getvalue().strip() == committed.strip(), (
        "OPERATORS.md is stale — regenerate: python tools/gen_catalog.py > OPERATORS.md"
    )


def test_text_stats_rejects_helper_column_collision(spark):
    """Inputs already carrying a _toks / _ls_* column would make the hoisted
    helper projections ambiguous downstream — the boundary guard raises
    instead (ADVICE r6)."""
    import pytest

    from score_spark.operators.textstats import with_language, with_text_stats

    df = spark.createDataFrame([("a b", ["x"])], ["text", "_toks"])
    with pytest.raises(ValueError, match="_toks"):
        with_text_stats(df)
    with pytest.raises(ValueError, match="_toks"):
        with_language(df)
    df2 = spark.createDataFrame([("a b", 1)], ["text", "_ls_en"])
    with pytest.raises(ValueError, match="_ls_en"):
        with_language(df2)


def test_lang_argmax_extends_with_new_languages(spark):
    """The argmax CASE is generated from the score map's key order, so a new
    language participates instead of being scored-but-never-predicted
    (review r7); earlier keys win ties."""
    from score_spark.functions.text import lang_argmax_sql

    import pyspark.sql.functions as F

    df = spark.createDataFrame([(0, 2, 5)], "s_en int, s_fr int, s_it int")
    expr = lang_argmax_sql({"en": "s_en", "fr": "s_fr", "it": "s_it"})
    assert df.select(F.expr(expr).alias("l")).first().l == "it"
    tie = spark.createDataFrame([(3, 3, 3)], "s_en int, s_fr int, s_it int")
    assert tie.select(F.expr(expr).alias("l")).first().l == "en"
    zero = spark.createDataFrame([(0, 0, 0)], "s_en int, s_fr int, s_it int")
    assert zero.select(F.expr(expr).alias("l")).first().l == "und"


def test_q_quotes_digit_leading_names(spark):
    """A column literally named '2022' must be quoted, not parsed as a
    numeric literal (review r7)."""
    from score_spark.functions.text import token_count

    df = spark.createDataFrame([("a b c",)], ["2022"])
    assert df.select(token_count("2022").alias("n")).first().n == 3


def test_q27_geomean_nan_price_stays_oracle_aligned(spark, tmp_path):
    """NaN passes `> 0` in BOTH engines (each orders NaN above every number),
    then pandas .mean() SKIPS it while DuckDB's avg(ln(x)) propagates it —
    a latent gate divergence on any fixture that grows a NaN price (review
    r8; same class as the r7 zero/negative domain fix). The explicit
    NOT-isnan filter keeps both engines on the same domain."""
    import duckdb
    import pandas as pd

    from score_spark.queries.relational import ORACLE_Q27, q27_udaf_geomean
    from tests.conftest import assert_matches_oracle

    pdf = pd.DataFrame(
        {
            "o_orderpriority": ["1-URGENT"] * 3 + ["2-HIGH"] * 3,
            "o_totalprice": [100.0, float("nan"), 400.0, 50.0, 0.0, -5.0],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "orders.parquet"))
    df = q27_udaf_geomean(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    assert_matches_oracle(df, con, ORACLE_Q27)
    # non-vacuous: the NaN row must have been excluded from BOTH sides
    urgent = {r["o_orderpriority"]: r for r in df.collect()}["1-URGENT"]
    assert urgent["n_orders"] == 2 and urgent["geomean_price"] == 200.0


def test_q23_null_event_time_stays_oracle_aligned(spark, tmp_path):
    """Spark's TimeWindowing rule silently drops NULL event times while
    DuckDB's time_bucket keeps a NULL window_start group — the explicit
    IS NOT NULL filter in both engines closes the divergence (review r8)."""
    import datetime

    import duckdb
    import pandas as pd
    import pyspark.sql.functions as F

    from score_spark.queries.relational import ORACLE_Q23, q23_event_time_buckets
    from tests.conftest import assert_matches_oracle

    t0 = datetime.datetime(2024, 5, 1, 10, 15)
    pdf = pd.DataFrame(
        {
            "ts": [t0, t0 + datetime.timedelta(hours=2), pd.NaT, t0],
            "event_type": ["click", "click", "view", "view"],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    # store ts as NTZ like the driver's fixtures do — otherwise Spark writes
    # isAdjustedToUTC=true and DuckDB's side becomes TIMESTAMPTZ
    spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).write.parquet(str(tmp_path / "events.parquet"))
    df = q23_event_time_buckets(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    assert_matches_oracle(df, con, ORACLE_Q23)
    assert df.count() == 3  # NULL-ts row contributes to no bucket


def test_t01_non_ascii_text_stays_oracle_aligned(spark, tmp_path):
    """Spark's length() counts CHARACTERS; DuckDB's strlen() counts BYTES —
    the t01/t02/t04 oracle mirrors previously used strlen, so any multibyte
    char (café) diverged avg_token_len and the purity band (review r8).
    length() is the character-exact DuckDB mirror."""
    import duckdb
    import pandas as pd

    from score_spark.operators.textstats import ORACLE_T01, t01_text_stats

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["le café est très bon", "plain ascii words here"],
            "lang": ["fr", "en"],
            "source": ["web", "web"],
            "n_chars": [20, 22],
        }
    )
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "documents.parquet"))
    df = t01_text_stats(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    assert_matches_oracle(df, con, ORACLE_T01)
    # non-vacuous: 'café'/'très' are 4 chars but 5 bytes — the byte mirror
    # would inflate avg_token_len for doc 1
    r1 = {r["doc_id"]: r for r in df.collect()}[1]
    assert r1["avg_token_len"] == 3.2  # (2+4+3+4+3)/5 characters


def test_text_ratio_helpers_null_safe_and_scaled(spark):
    """Empty-string documents: length('')/length('') THREW under ANSI mode
    and killed the whole job (review r9, confirmed) — try_divide yields
    NULL, mirroring DuckDB's division-by-zero. And ratios round via
    scale-then-round so decimal midpoints (57/800 = 0.07125) agree with the
    oracle's form."""
    import duckdb

    from score_spark.functions.text import non_alpha_ratio, stopword_ratio

    df = spark.createDataFrame([(1, ""), (2, "the x1!")], "doc_id bigint, text string")
    rows = {r.doc_id: (r.na, r.sw) for r in df.select(
        "doc_id",
        non_alpha_ratio("text").alias("na"),
        stopword_ratio("text").alias("sw"),
    ).collect()}
    assert rows[1] == (None, 0.0), rows  # empty text: NULL ratio, 1 token ''
    # midpoint agreement is the PROPERTY (the exact value depends on the
    # shared IEEE intermediate — 0.07125's double is 1 ulp under the
    # midpoint, so both engines round DOWN together under this form, where
    # native round(x, 4) had Spark up / DuckDB down)
    con = duckdb.connect()
    duck = con.execute("SELECT round((57 / CAST(800 AS DOUBLE)) * 10000.0) / 10000.0").fetchone()[0]
    spark_v = spark.sql("SELECT round((57 / CAST(800 AS DOUBLE)) * 10000.0) / 10000.0 AS v").first().v
    assert duck == spark_v, (duck, spark_v)


def test_q16_anti_join_non_vacuous(spark, sf_dir):
    """VERDICT r11 #1: the q16 gate row compared empty-to-empty since r5
    because the driver's data has no customer without orders. The query now
    anti-joins against a recent-order window (>= 1998-06-01) so the anti side
    is NON-EMPTY at every test SF (3 / 8 / 142 cold customers at
    sf0.001/0.01/0.1) — this test fails if a fixture change ever hollows the
    row out again."""
    from score_spark.queries.relational import q16_cold_customer_profile

    rows = q16_cold_customer_profile(spark, sf_dir).collect()
    assert sum(r["n_customers"] for r in rows) > 0, (
        "q16 anti side is empty at this SF — the gate row is vacuous again"
    )


def test_q16_planted_cold_customer(spark, tmp_path):
    """Anti-join semantics pinned on a planted fixture: a customer whose only
    order predates the window (cold), one with a recent order (excluded), and
    one with no orders at all (cold) — plus the CASE band and NULL-segment
    COALESCE paths. A wrong join type (inner/semi/left) or an unfiltered
    orders side produces different counts."""
    import datetime

    import duckdb
    import pandas as pd
    import pyspark.sql.functions as F

    from score_spark.queries.relational import ORACLE_Q16, q16_cold_customer_profile
    from tests.conftest import assert_matches_oracle

    cust = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_acctbal": [-50.0, 500.0, 5000.0],
            "c_mktsegment": [None, "AUTOMOBILE", "BUILDING"],
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": [1, 2],
            "o_orderdate": [
                datetime.datetime(1997, 3, 1),  # old → custkey 1 stays cold
                datetime.datetime(1998, 7, 1),  # recent → custkey 2 excluded
            ],
        }
    )
    spark.createDataFrame(cust).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(orders).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")
    ).write.parquet(str(tmp_path / "orders.parquet"))

    df = q16_cold_customer_profile(spark, str(tmp_path))
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    assert_matches_oracle(df, con, ORACLE_Q16)
    got = {(r["balance_band"], r["segment"]): r["n_customers"] for r in df.collect()}
    assert got == {("overdrawn", "UNKNOWN"): 1, ("healthy", "BUILDING"): 1}, got

"""Edge cases for operators.profiling.exact_percentiles_by_group — the
bounded-memory exact percentile plan (quantile_cont semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F

from score_spark.operators.profiling import exact_percentiles_by_group


def _as_map(df):
    return {r["g"]: r.asDict() for r in df.collect()}


def test_interpolation_matches_quantile_cont_by_hand(spark):
    # group a: values 1..4 -> median = 2.5 (interpolated), p75 = 3.25
    # group b: single value -> every percentile is that value
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = _as_map(
        exact_percentiles_by_group(df, "g", "v", {"p50": 0.5, "p75": 0.75}, round_dp=4)
    )
    assert got["a"]["p50"] == 2.5 and got["a"]["p75"] == 3.25
    assert got["b"]["p50"] == 7.0 and got["b"]["p75"] == 7.0


def test_duplicate_values_collapse_into_histogram(spark):
    # heavy ties: the histogram rows are (value, count); rank selection must
    # respect multiplicity. values: [1,1,1,9] -> p50 = 1.0, p100 = 9
    rows = [("a", 1.0)] * 3 + [("a", 9.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = _as_map(exact_percentiles_by_group(df, "g", "v", {"p50": 0.5, "p100": 1.0}))
    assert got["a"]["p50"] == 1.0
    assert got["a"]["p100"] == 9.0


def test_null_group_key_profiles_like_duckdb(spark):
    """GROUP BY keeps a NULL group (ANSI / DuckDB quantile_cont behavior);
    the internal stats/slice joins are null-safe so those rows don't vanish."""
    rows = [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r["p50"] for r in
           exact_percentiles_by_group(df, "g", "v", {"p50": 0.5}).collect()}
    assert got == {"a": 2.0, None: 15.0}


def test_boundary_percentiles(spark):
    rows = [("a", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = _as_map(exact_percentiles_by_group(df, "g", "v", {"p0": 0.0, "p100": 1.0}))
    assert got["a"]["p0"] == 0.0 and got["a"]["p100"] == 9.0


def test_matches_duckdb_quantile_cont_on_lineitem(spark, sf_dir, oracle_con):
    from score_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = _as_map(
        exact_percentiles_by_group(
            li.select(F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v")),
            "g", "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99},
        )
    )
    # scale-then-round on the oracle side too — see the operator's
    # midpoint-rounding note (2-dp money data interpolated at frac=0.5
    # lands exactly on .xx5 midpoints)
    want = oracle_con.execute(
        f"""
        SELECT l_returnflag AS g,
               round(quantile_cont(l_extendedprice, 0.25) * 100) / 100 AS p25,
               round(quantile_cont(l_extendedprice, 0.5) * 100) / 100 AS p50,
               round(quantile_cont(l_extendedprice, 0.99) * 100) / 100 AS p99
        FROM lineitem GROUP BY 1
        """
    ).fetchall()
    for g, p25, p50, p99 in want:
        assert (got[g]["p25"], got[g]["p50"], got[g]["p99"]) == (p25, p50, p99), g


def test_bounds_mode_matches_computed_stats(spark):
    """Covering global bounds (footer-stats mode) must select the identical
    ranks as the per-group computed-stats mode — bounds only partition data.
    Loose bounds (wider than the data) must also stay exact."""
    rows = [("a", float(i)) for i in range(1, 101)] + [("b", 7.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    want = _as_map(exact_percentiles_by_group(df, "g", "v", {"p50": 0.5, "p95": 0.95}))
    for bounds in [(1.0, 100.0), (-500.0, 500.0)]:
        got = _as_map(
            exact_percentiles_by_group(df, "g", "v", {"p50": 0.5, "p95": 0.95}, bounds=bounds)
        )
        assert got == want, bounds


def test_parquet_column_bounds_reads_footers(spark, tmp_path):
    from score_spark.operators.profiling import parquet_column_bounds

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(i, float(i) * 1.5 - 3) for i in range(100)], ["id", "x"]).repartition(
        3
    ).write.parquet(p)
    df = spark.read.parquet(p)
    assert parquet_column_bounds(df, "x") == (-3.0, 99 * 1.5 - 3)
    # non-file source -> None (caller falls back to the computed-stats pass)
    assert parquet_column_bounds(spark.range(5), "id") is None


def test_bounds_mode_plan_is_two_scans_no_stats_pass(spark, sf_dir):
    """With covering bounds the plan must read the source exactly twice
    (bucket histogram + target slice) — no third scan for a stats aggregate,
    and no join to assign buckets (map-only literal expression)."""
    from score_spark.io import load_table
    from score_spark.operators.profiling import exact_percentiles_by_group

    li = load_table(spark, sf_dir, "lineitem")
    df = exact_percentiles_by_group(
        li, "l_returnflag", "l_extendedprice", {"p50": 0.5}, bounds=(0.0, 200000.0)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 2, plan.count("FileScan")


def test_no_whole_group_value_buffering_in_plan(spark, sf_dir):
    """The plan must contain no `percentile` aggregate (the buffering
    evaluator this operator replaces) — its aggregation paths are plain
    hash aggregates over the histogram plus one streaming window."""
    from score_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df = exact_percentiles_by_group(li, "l_returnflag", "l_extendedprice", {"p50": 0.5})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()


def test_parquet_column_bounds_skips_empty_part_files(spark, tmp_path):
    """Spark writes zero-row-group part files for empty partitions; they
    impose no bounds and must be SKIPPED — the (None, None) they used to
    produce crashed the merge with a TypeError (review r8)."""
    from score_spark.operators.profiling import parquet_column_bounds

    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "with_empty")
    spark.range(10).selectExpr("CAST(id AS DOUBLE) AS x").write.parquet(p)
    # plant a zero-row-group part file (what Spark emits for an empty
    # partition) next to the populated ones
    empty = os.path.join(p, "part-empty.parquet")
    pq.ParquetWriter(empty, pa.schema([("x", pa.float64())])).close()
    assert pq.ParquetFile(empty).metadata.num_row_groups == 0  # non-vacuous
    df = spark.read.parquet(p)
    assert parquet_column_bounds(df, "x") == (0.0, 9.0)

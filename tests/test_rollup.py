"""time_rollup: hierarchical merge correctness + exchange reuse."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from score_spark.operators.rollup import time_rollup


def test_hierarchical_equals_direct(spark):
    rows = [
        (dt.datetime(2026, 4, 1, h, m), float(v))
        for h, m, v in [
            (0, 5, 10), (0, 55, 20), (1, 10, 5), (1, 20, 1),
            (23, 59, 7), (3, 0, 100),
        ]
    ] + [(dt.datetime(2026, 4, 2, 0, 1), 2.0)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    r = time_rollup(df, grains=("hour", "day"))
    got = {
        (x.grain, x.bucket_start, x.n, x.total_value, x.min_value, x.max_value)
        for x in r.collect()
    }
    direct_day = {
        ("day", x.b, x.n, x.s, x.mn, x.mx)
        for x in df.groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert {g for g in got if g[0] == "day"} == direct_day
    assert len([g for g in got if g[0] == "hour"]) == 5
    # sanity: a day's n equals the sum of its hours' n
    day1_n = next(g[2] for g in got if g[0] == "day" and g[1].day == 1)
    assert day1_n == sum(g[2] for g in got if g[0] == "hour" and g[1].day == 1)


def test_day_grain_aggregates_hour_output_and_reuses_exchange(spark):
    """Plan shape: exactly ONE scan-side shuffle feeds both union branches
    (the hour branch is emitted AND consumed by the day branch) — the
    executed plan must show a ReusedExchange, and the day branch's input is
    the hour aggregate, not the raw relation."""
    rows = [(dt.datetime(2026, 4, 1, h, 0), 1.0) for h in range(24)]
    df = spark.createDataFrame(rows, ["ts", "value"])
    r = time_rollup(df, grains=("hour", "day"))
    r.collect()
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan or "TableCacheQueryStage" in plan, plan


def test_time_rollup_rejects_misordered_grains(spark):
    import pytest

    from score_spark.operators.rollup import time_rollup
    from score_spark.io import load_events

    e = spark.createDataFrame([], "ts timestamp, value double")
    with pytest.raises(ValueError, match="fine to coarse"):
        time_rollup(e, grains=("day", "hour"))
    with pytest.raises(ValueError, match="unknown grain"):
        time_rollup(e, grains=("hour", "fortnight"))
    with pytest.raises(ValueError, match="week"):
        time_rollup(e, grains=("week", "month"))


def test_uniq_sketch_channel_union_equals_direct_and_exact(spark):
    """The mergeable-distinct contract: (a) day-level estimate derived by
    UNIONING hour sketches equals the estimate of sketching the day's raw
    ids directly (lossless same-lg_k union), (b) at small cardinality the
    estimate equals the exact distinct count, (c) the binary sketch column
    is present so the rollup output stays further-mergeable."""
    rows = [
        (dt.datetime(2026, 4, 1, h, m), float(h), uid)
        for h in (0, 1, 2)
        for m, uid in [(0, h * 10), (10, h * 10 + 1), (20, h * 10), (30, 999)]
    ]
    df = spark.createDataFrame(rows, ["ts", "value", "user_id"])
    r = time_rollup(df, grains=("hour", "day"), uniq_col="user_id")
    out = {(x.grain, x.bucket_start): x for x in r.collect()}
    assert all(hasattr(x, "uniq_sketch") for x in out.values())

    day_key = ("day", dt.datetime(2026, 4, 1))
    # exact distinct per day: {0,1,10,11,20,21,999} -> 7
    assert out[day_key].est_uniques == 7
    for h in (0, 1, 2):
        hour_key = ("hour", dt.datetime(2026, 4, 1, h))
        assert out[hour_key].est_uniques == 3  # {h*10, h*10+1, 999}

    direct = (
        df.groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("est"))
        .collect()[0]
        .est
    )
    assert out[day_key].est_uniques == direct


def test_uniq_sketch_mixed_lgk_union_raises(spark):
    """allowDifferentLgConfigK is pinned False: merging sketches built at
    different precisions would silently degrade to the coarsest — the
    rollup requires one lg_k end-to-end and surfaces a mix loudly."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    rows = [(dt.datetime(2026, 4, 1, 0, 0), 1.0, 1), (dt.datetime(2026, 4, 1, 1, 0), 1.0, 2)]
    df = spark.createDataFrame(rows, ["ts", "value", "user_id"])
    a = df.limit(1).agg(F.hll_sketch_agg("user_id", 12).alias("uniq_sketch"))
    b = df.agg(F.hll_sketch_agg("user_id", 13).alias("uniq_sketch"))
    mixed = a.unionByName(b)
    with pytest.raises((Py4JJavaError, PySparkException)):
        mixed.agg(F.hll_union_agg("uniq_sketch", False)).collect()


def test_uniq_sketch_dense_mode_union_within_tolerance(spark):
    """ADVICE r7: union equality is only guaranteed while sketches stay in
    sparse/coupon mode — a unioned sketch answers with the composite
    estimator (HIP invalidated), so in dense HLL mode the hour-union day
    estimate may differ slightly from a direct day sketch. 12k distinct ids
    across 4 hours force lg_k=12 sketches dense; assert the unioned estimate
    lands within estimator tolerance of BOTH the direct sketch and the exact
    count (3 * 1.04/sqrt(2^12) ~ 4.9%), not exact equality."""
    n = 12_000
    df = (
        spark.range(n)
        .select(
            F.timestamp_seconds(
                F.lit(int(dt.datetime(2026, 4, 1).timestamp()))
                + (F.col("id") % 4) * 3600
            ).alias("ts"),
            F.lit(1.0).alias("value"),
            F.col("id").alias("user_id"),
        )
    )
    r = time_rollup(df, grains=("hour", "day"), uniq_col="user_id")
    day = next(x for x in r.collect() if x.grain == "day")
    direct = (
        df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("est")
        ).collect()[0].est
    )
    tol = 3 * 1.04 / (2**12) ** 0.5
    assert abs(day.est_uniques - n) <= tol * n
    assert abs(day.est_uniques - direct) <= tol * n


def test_h01_gate_fires_on_broken_sketch_channel(spark, sf_dir, oracle_con):
    """The re-billed h01 (r8) moves uniq_est_ok computation to the ORACLE:
    Spark emits literal TRUE and the oracle recomputes the flag from the
    materialized estimates vs its own exact count(DISTINCT). Prove the gate
    is not vacuous: corrupt the materialized est_uniques (simulating a
    sketch misroute / lost partial) and the oracle must flip rows to FALSE,
    which the driver's value-hash would catch as a mismatch."""
    from score_spark.operators.rollup import ORACLE, QUERIES
    from score_spark.xcheck import xcheck_path

    QUERIES["h01_time_rollup"](spark, sf_dir).collect()
    sql = ORACLE["h01_time_rollup"]
    ok = oracle_con.execute(sql).fetchdf()
    assert ok["uniq_est_ok"].all() and len(ok) > 0

    path = xcheck_path("h01_rollup")
    corrupted = oracle_con.execute(
        f"SELECT * REPLACE (est_uniques * 10 + 1000 AS est_uniques) "
        f"FROM read_parquet('{path}/*.parquet')"
    ).fetchdf()
    import os
    import shutil

    shutil.rmtree(path)
    os.makedirs(path)
    oracle_con.register("corrupted_df", corrupted)
    oracle_con.execute(
        f"COPY corrupted_df TO '{path}/part-corrupt.parquet' (FORMAT PARQUET)"
    )
    try:
        broken = oracle_con.execute(sql).fetchdf()
        assert not broken["uniq_est_ok"].any()
    finally:
        # restore the real materialization — a later reader of the channel
        # (another test, a driver run against this tree) must not see the
        # corrupted file
        QUERIES["h01_time_rollup"](spark, sf_dir).collect()

"""interval_join: containment semantics, bucket-boundary edges, and the
no-cartesian plan shape."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from score_spark.operators.rangejoin import interval_join


def t(m):
    return dt.datetime(2026, 3, 1, 8) + dt.timedelta(minutes=m)


def _fixture(spark):
    events = spark.createDataFrame(
        [(i, t(m)) for i, m in enumerate([0, 29, 30, 59, 60, 90, 125, 200])],
        ["eid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            ("a", t(0), t(30)),     # eid 0, 1 (30 exclusive)
            ("b", t(30), t(120)),   # eid 2, 3, 4, 5 — spans 3 half-hour buckets
            ("c", t(25), t(35)),    # eid 1, 2 — overlaps interval a and b
            ("d", t(300), t(330)),  # nothing
        ],
        ["name", "start", "end"],
    )
    return events, intervals


def test_containment_start_inclusive_end_exclusive(spark):
    events, intervals = _fixture(spark)
    got = {
        (r.eid, r.name)
        for r in interval_join(events, intervals, bucket_seconds=1800).collect()
    }
    assert got == {
        (0, "a"), (1, "a"),
        (2, "b"), (3, "b"), (4, "b"), (5, "b"),
        (1, "c"), (2, "c"),
    }


def test_each_pair_matches_exactly_once_any_bucket_width(spark):
    """An interval spanning many buckets must not duplicate matches — each
    event lives in exactly one bucket."""
    events, intervals = _fixture(spark)
    for width in (60, 600, 7200):
        rows = interval_join(events, intervals, bucket_seconds=width).collect()
        pairs = [(r.eid, r.name) for r in rows]
        assert len(pairs) == len(set(pairs)), f"dup at width={width}"
        assert set(pairs) == {
            (0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "b"), (5, "b"), (1, "c"), (2, "c")
        }


def test_keyed_variant_restricts_matches(spark):
    events = spark.createDataFrame(
        [(1, "u1", t(10)), (2, "u2", t(10))], ["eid", "user", "ts"]
    )
    intervals = spark.createDataFrame(
        [("u1", t(0), t(30))], ["user", "start", "end"]
    )
    got = [r.eid for r in interval_join(events, intervals, keys=("user",)).collect()]
    assert got == [1]


def test_plan_is_hash_join_not_cartesian(spark):
    """The entire point: the executed plan joins on the bucket hash key —
    never BroadcastNestedLoopJoin / CartesianProduct."""
    events, intervals = _fixture(spark)
    df = interval_join(events, intervals, bucket_seconds=1800)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the naive range-condition join, for contrast, IS a nested loop
    naive = events.join(
        intervals, (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
    )
    naive.collect()
    nplan = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in nplan or "CartesianProduct" in nplan


def test_interval_join_subsecond_end_and_reversed_intervals(spark):
    """(1) A sub-second exclusive end must not lose the final bucket
    (unix_timestamp truncation did — review r7, confirmed); (2) reversed
    intervals contain nothing and must not explode into descending bucket
    lists."""
    import datetime

    from score_spark.operators.rangejoin import interval_join

    d = datetime.datetime
    events = spark.createDataFrame(
        [(1, d(2024, 1, 1, 18, 0, 0, 200000))], "event_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(d(2024, 1, 1, 17, 59, 0), d(2024, 1, 1, 18, 0, 0, 500000))],
        "start timestamp, end timestamp",
    )
    got = interval_join(events, iv, bucket_seconds=1800).collect()
    assert len(got) == 1, got
    # reversed interval: no rows, and the plan never builds a giant sequence
    bad = spark.createDataFrame(
        [(d(2024, 1, 1, 18, 0, 0), d(2023, 1, 1, 0, 0, 0))],
        "start timestamp, end timestamp",
    )
    assert interval_join(events, bad, bucket_seconds=1800).count() == 0

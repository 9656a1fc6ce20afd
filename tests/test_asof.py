"""as-of join edge semantics on hand-built frames (the registry sweep checks
the events-table query against DuckDB's native ASOF JOIN)."""

from __future__ import annotations

import datetime as dt

from score_spark.operators.asof import asof_join


def ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_asof_salted_equals_plain_on_skewed_keys(spark):
    """time_buckets path must return exactly the plain path's answer on a
    planted 100x-skewed fixture (one hyperactive key vs many normal keys),
    including bucket-boundary carry-over and never-matched keys."""
    import random

    rng = random.Random(11)
    left_rows, right_rows = [], []
    for i in range(1000):  # hot key 0: 100x the rows of each normal key
        left_rows.append((0, ts(i % 600), f"hot-l{i}"))
        right_rows.append((0, ts((i * 7) % 600), i))
    for k in range(1, 11):
        for i in range(10):
            left_rows.append((k, ts(rng.randrange(600)), f"k{k}-l{i}"))
            right_rows.append((k, ts(rng.randrange(600)), k * 1000 + i))
    left_rows.append((99, ts(5), "never-matched"))
    left = spark.createDataFrame(left_rows, ["k", "ts", "name"])
    right = spark.createDataFrame(right_rows, ["k", "ts", "v"])

    def key(rows):
        return sorted((r.k, r.ts, r.name, r.v_right, r.ts_right) for r in rows)

    plain = asof_join(left, right, on="k", right_value_cols=["v"])
    salted = asof_join(left, right, on="k", right_value_cols=["v"], time_buckets=8)
    assert key(salted.collect()) == key(plain.collect())


def test_asof_salted_bounds_window_group_size(spark):
    """The point of the salt: no (key, bucket) window group holds more than
    ~1/n_buckets of the hot key's timeline (the plain path would put all
    2000 hot rows in ONE ordered task)."""
    import pyspark.sql.functions as F

    n_hot, buckets = 2000, 8
    left = spark.createDataFrame([(0, ts(i % 600), i) for i in range(n_hot)], ["k", "ts", "i"])
    right = spark.createDataFrame([(0, ts((i * 3) % 600), i) for i in range(n_hot)], ["k", "ts", "v"])
    # reproduce the operator's bucket assignment over the union and measure
    # the biggest (key, bucket) group the window pass would sort
    union = left.select("k", "ts").unionByName(right.select("k", "ts"))
    lo, hi = union.select(F.min("ts"), F.max("ts")).first()
    span = F.unix_micros(F.col("ts")) - F.lit(int(lo.timestamp() * 1_000_000))
    total = int((hi - lo).total_seconds() * 1_000_000)
    bkt = F.least(F.lit(buckets - 1), F.floor(span * buckets / F.lit(total + 1)))
    biggest = (
        union.groupBy(F.col("k"), bkt.alias("b")).count().agg(F.max("count")).first()[0]
    )
    assert biggest <= (2 * n_hot) // buckets * 1.5  # bounded, not serialized
    # and the salted operator still answers correctly at this size
    got = asof_join(left, right, on="k", right_value_cols=["v"], time_buckets=buckets)
    assert got.count() == n_hot
    # executed-plan pin (VERDICT r3 #8): the in-bucket window's exchange must
    # hash on (_k, _bkt) — i.e. the hot key's timeline really is split across
    # bucket partitions in the plan that ran, not just in this test's
    # re-derivation — while the plain path partitions on _k alone.
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_k" in plan and "_bkt" in plan.split("hashpartitioning(_k", 1)[1][:80]
    plain_plan = (
        asof_join(left, right, on="k", right_value_cols=["v"])
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "_bkt" not in plain_plan


def test_asof_backward_with_equal_ts_and_missing(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(5), "p0"), (2, ts(3), "p2"), (3, ts(1), "p3")],
        ["k", "ts", "name"],
    )
    right = spark.createDataFrame(
        [(1, ts(5), 100), (1, ts(9), 200), (2, ts(4), 300)],
        ["k", "ts", "v"],
    )
    got = {
        r.name: (r.v_right, r.ts_right)
        for r in asof_join(left, right, on="k", right_value_cols=["v"]).collect()
    }
    assert got["p1"] == (200, ts(9))   # latest prior
    assert got["p0"] == (100, ts(5))   # equal timestamps match (<=)
    assert got["p2"] == (None, None)   # right row is after left → no match
    assert got["p3"] == (None, None)   # key never on right


def test_a01_fused_order_matches_global_sort(spark, sf_dir):
    """a01's ranged_by_key fusion must produce byte-identical row order to a
    true global orderBy on (user_id, purchase ts, event_id); the ts column is
    not projected, so the equivalent global sort re-derives it via a join-free
    re-sort on the projected keys' unique prefix (user_id, event_id order
    within a user follows ts because event ids are assigned in ts order is
    NOT assumed — we re-run the query with orderBy on the pre-projection
    frame instead)."""
    import pyspark.sql.functions as F

    from score_spark.io import load_events
    from score_spark.operators.asof import a01_purchase_attribution, asof_join

    got = a01_purchase_attribution(spark, sf_dir).collect()
    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases, clicks.withColumnRenamed("event_id", "click_id"),
        on="user_id", right_value_cols=["click_id"],
    )
    want = (
        joined.orderBy("user_id", "ts", "event_id")
        .select(
            "event_id", "user_id", F.round("value", 2).alias("purchase_value"),
            "click_id_right",
            (F.unix_timestamp("ts") - F.unix_timestamp("ts_right")).alias("gap_seconds"),
        )
        .collect()
    )
    assert got == want


def test_asof_null_payload_carries_whole_row(spark):
    """NULL right payload values must ride with their OWN row: the flat path
    once mixed r1's value with r2's timestamp via per-column
    last(ignorenulls) (review r7, confirmed vs DuckDB ASOF semantics)."""
    from score_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 1, 5), (1, 2, None)], "k long, ts long, v long"
    )
    for tb in (None, 4):
        got = asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", time_buckets=tb
        ).collect()
        assert len(got) == 1
        r = got[0]
        # most recent right row is ts=2 with v=NULL — both fields from IT
        assert (r.ts_right, r.v_right) == (2, None), (tb, r)


def test_asof_join_right_map_payload_supported(spark):
    """The r8 whole-struct tie-break hash regressed any right frame carrying
    a map column (Spark's hash family rejects MapType at analysis). Map
    fields are now excluded from the tie-break; the join itself must work
    and still carry the map payload (review r9)."""
    import datetime as dt

    from score_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0, 10)], "k bigint, ts timestamp, lv bigint")
    right = spark.createDataFrame(
        [(1, t0, {"a": "x"})], "k bigint, ts timestamp, props map<string,string>"
    )
    out = asof_join(left, right, on="k").collect()
    assert len(out) == 1 and out[0]["props_right"] == {"a": "x"}


def test_asof_join_empty_value_cols_means_ts_only(spark):
    """right_value_cols=[] previously fell through `or` to the all-columns
    default; it must mean 'carry only the right timestamp' (review r9)."""
    import datetime as dt

    from score_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0, 10)], "k bigint, ts timestamp, lv bigint")
    right = spark.createDataFrame(
        [(1, t0, 99, "payload")], "k bigint, ts timestamp, rv bigint, extra string"
    )
    out = asof_join(left, right, on="k", right_value_cols=[])
    assert set(out.columns) == {"k", "ts", "lv", "ts_right"}, out.columns


def test_asof_join_rejects_output_name_collision(spark):
    """A left column named like a suffixed right output silently produced
    duplicate output names before r9 — fail loudly instead."""
    import datetime as dt

    import pytest

    from score_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0, 5)], "k bigint, ts timestamp, rv_right bigint"
    )
    right = spark.createDataFrame([(1, t0, 9)], "k bigint, ts timestamp, rv bigint")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", right_value_cols=["rv"])

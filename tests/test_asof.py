"""as-of join edge semantics on hand-built frames (the registry sweep checks
the events-table query against DuckDB's native ASOF JOIN)."""

from __future__ import annotations

import datetime as dt

from score_spark.operators.asof import asof_join


def ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


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

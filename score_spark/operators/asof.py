"""As-of (point-in-time) join — an operator Spark SQL lacks natively.

Implementation is the scale-correct union-marker pattern, NOT a range
cross-join: tag both sides, union, single shuffle on the key, one
ordered-window pass carrying the right side's last value forward, filter back
to left rows. Cost: one shuffle + one sort per key partition — the same
shape as any window aggregate, immune to the |left| x |right| blowup a
range-condition join produces.

DuckDB's native ASOF JOIN serves as the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from score_spark.io import load_events


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row (right_ts <=
    left_ts) with the same key. Right values arrive as <col><suffix>;
    right_ts arrives as <right_ts><suffix>. Left rows with no prior right row
    keep nulls (ASOF LEFT JOIN semantics)."""
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    # right rows sort before left rows at equal _ts → right_ts <= left_ts
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_last_{c}") for c in right_value_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_last_ts"),
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_last_{c}").alias(f"{c}{suffix}") for c in right_value_cols]
    out_cols.append(F.col("_last_ts").alias(f"{right_ts}{suffix}"))
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)


# ------------------------------------------------------------------ queries


def a01_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase attributed to the user's most recent prior click."""
    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases,
        clicks.withColumnRenamed("event_id", "click_id"),
        on="user_id",
        right_value_cols=["click_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        "click_id_right",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_right")).alias("gap_seconds"),
    ).orderBy("event_id")


ORACLE_A01 = """
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       round(p.value, 2) AS purchase_value,
       c.click_id AS click_id_right,
       date_diff('second', c.ts, p.ts) AS gap_seconds
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY p.event_id
"""


QUERIES = {"a01_purchase_attribution": a01_purchase_attribution}
ORACLE = {"a01_purchase_attribution": ORACLE_A01}

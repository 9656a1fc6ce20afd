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
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _contains_map(dt: T.DataType) -> bool:
    """Spark's hash family rejects MapType (unorderable, unhashable) — used
    to exclude map-typed payload fields from the tie-break hash."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    return False

from score_spark.io import load_events


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
    time_buckets: int | None = None,
    ranged_by_key: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row (right_ts <=
    left_ts) with the same key. Right values arrive as <col><suffix>;
    right_ts arrives as <right_ts><suffix>. Left rows with no prior right row
    keep nulls (ASOF LEFT JOIN semantics).

    ``time_buckets``: skew escape hatch (VERDICT r2 "Next round" #7). The
    plain path partitions by key only, so one hyperactive key serializes its
    whole timeline into a single window task — and AQE's skew splitting does
    not apply to window exchanges. With time_buckets=N each key's timeline
    splits into N contiguous time ranges: the window pass runs per
    (key, bucket) — max task is 1/N of the hot key — and a second, tiny
    per-(key, bucket) pass carries the last right row across bucket
    boundaries. Costs one extra scalar min/max job + one narrow join; use it
    when a key can dominate a partition (see ``key_skew_report``).

    ``ranged_by_key=True`` range-partitions the tagged union on the key
    instead of letting the carry window hash-partition it. RangePartitioning
    on the key satisfies the window's clustering requirement (equal keys
    never split across a range boundary), and the output partitions become
    ordered key ranges — so a caller wanting key-leading output order gets
    it with a free sortWithinPartitions instead of a second exchange plus
    its sampling job. Same exchange count inside the join; same skew
    profile as hash partitioning (the time_buckets escape hatch composes —
    the range can include the bucket)."""
    if right_value_cols is None:
        # None (not merely falsy) selects the all-columns default: an
        # explicit [] means 'carry only the right timestamp' and previously
        # silently widened to every right column (review r9)
        right_value_cols = [c for c in right.columns if c not in (on, right_ts)]
    clashes = set(left.columns) & {f"{c}{suffix}" for c in [*right_value_cols, right_ts]}
    if clashes:
        # mirror of interval_join's guard (r8): Spark happily emits
        # duplicate output names from selectExpr, and the first downstream
        # by-name reference throws AMBIGUOUS_REFERENCE far from the cause —
        # chained asof_joins with the default suffix hit this (review r9)
        raise ValueError(
            f"left columns collide with suffixed right outputs: {sorted(clashes)}; "
            f"pass a different suffix"
        )
    # generated expression strings parse in one JVM call each instead of
    # per-column Column round-trips (see functions/text.py construction
    # note); the null placeholders keep Column-object casts because a
    # PYTHON DataType cannot render a quoted SQL type string (simpleString
    # drops backticks, so exotic field names would break a cast literal)
    l_struct = "struct(" + ", ".join(f"`{c}`" for c in left.columns) + ")"
    # ONE struct carries the whole right ROW (values + ts): per-column
    # last(ignorenulls) carries mixed NULL payload columns from DIFFERENT
    # right rows — a frankenrow no real right row ever was, diverging from
    # ASOF semantics (review r7, confirmed by execution: r1(v=5), r2(v=NULL)
    # paired r1's value with r2's timestamp). A struct is non-null for every
    # right row even when all its payload fields are null, so last(_r, true)
    # selects the latest right ROW atomically.
    r_struct = "struct(" + ", ".join(
        [f"`{c}`" for c in right_value_cols] + [f"`{right_ts}`"]
    ) + ")"
    r_tagged = right.select(
        F.expr(f"`{on}` AS _k"),
        F.expr(f"`{right_ts}` AS _ts"),
        F.expr("0 AS _is_left"),
        F.expr(f"{r_struct} AS _r"),
    )
    l_tagged = left.select(
        F.expr(f"`{on}` AS _k"),
        F.expr(f"`{left_ts}` AS _ts"),
        F.expr("1 AS _is_left"),
        F.expr(f"{l_struct} AS _l"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
    )
    r_tagged = r_tagged.select(
        "_k", "_ts", "_is_left", F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"), "_r"
    )
    tagged = l_tagged.unionByName(r_tagged)
    # deterministic tie-break among right rows sharing (key, ts): without
    # it the plain path's unstable sort tie and the bucketed path's
    # arbitrary max_by tie could pick DIFFERENT duplicate right rows (and
    # either pick could flip under an AQE/partitioning change) — salted ==
    # plain equality and gate hashes held only by physical-plan luck
    # (review r8). xxhash64 of the right row-struct is a pure function of
    # the data, so both paths agree and re-runs are stable; left rows hash
    # their null _r to the seed constant, which never matters (the carry
    # reads right rows only). Map-typed payload fields are EXCLUDED from
    # the hash — Spark's hash family rejects MapType at analysis, so
    # hashing the whole struct regressed any right frame carrying a map
    # (review r9); ties among right rows that differ ONLY in map fields
    # remain unspecified, which is Spark's own orderability limit.
    r_dtype = r_tagged.schema["_r"].dataType
    hashable = [f.name for f in r_dtype.fields if not _contains_map(f.dataType)]
    if len(hashable) == len(r_dtype.fields):
        tb = F.xxhash64("_r")
    elif hashable:
        tb = F.xxhash64(*[F.col(f"_r.`{f}`") for f in hashable])
    else:
        tb = F.lit(0).cast("bigint")
    tagged = tagged.withColumn("_tb", tb)
    if ranged_by_key:
        tagged = tagged.repartitionByRange("_k")
    if time_buckets is None:
        # right rows sort before left rows at equal _ts → right_ts <= left_ts
        over = (
            "OVER (PARTITION BY _k ORDER BY _ts, _is_left, _tb"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        carried = tagged.selectExpr("*", f"last(_r, true) {over} AS _lastrow")
    else:
        carried = _bucketed_carry(tagged, time_buckets)
    out_cols = [f"_l.`{c}` AS `{c}`" for c in left.columns]
    out_cols += [f"_lastrow.`{c}` AS `{c}{suffix}`" for c in right_value_cols]
    out_cols.append(f"_lastrow.`{right_ts}` AS `{right_ts}{suffix}`")
    return carried.filter("_is_left = 1").selectExpr(*out_cols)


def _bucketed_carry(tagged: DataFrame, n_buckets: int) -> DataFrame:
    """Two-phase last-ROW carry: window within (key, time bucket), then a
    per-bucket carry-in computed over the small (key, bucket) spine.

    Phase 1 bounds every window task at ~1/n_buckets of the hottest key.
    Phase 2's spine has |keys| x n_buckets rows; the join strategy is left
    to AQE — a forced broadcast was unbounded in the key count and could
    OOM exactly at the scale this escape hatch exists for (review r7).
    Every carry moves the whole ``_r`` row-struct, never per-column lasts —
    see asof_join's frankenrow note. Works for any row-to-bucket assignment
    that is monotone in _ts; contiguous equal-width ranges from one scalar
    min/max job keep it deterministic.

    Bucket arithmetic details (both review r8): timestamp bounds are taken
    as ``unix_micros`` LONGS inside Spark — collecting datetimes made the
    driver re-interpret them in ITS OS time zone, shifting every span by
    the host UTC offset on non-UTC drivers (monotone, so results stayed
    right, but buckets could all collapse to the top index — the skew
    bound silently gone). The scaled span is computed in DOUBLE: an int64
    ``span * n_buckets`` overflows for wide numeric timelines (epoch-nanos
    longs), which throws under ANSI mode and silently breaks bucket
    monotonicity without it; multiplying/dividing by positive constants is
    monotone in IEEE double, which is the only property the carry needs."""
    if _is_ts(tagged):
        lo, hi = tagged.select(
            F.min(F.unix_micros("_ts")), F.max(F.unix_micros("_ts"))
        ).first()
        span_col = F.unix_micros(F.col("_ts"))
    else:
        lo, hi = tagged.select(F.min("_ts"), F.max("_ts")).first()
        span_col = F.col("_ts")
    if lo is None or lo == hi:
        bkt = F.lit(0)
    else:
        span = (span_col - F.lit(lo)).cast("double")
        bkt = F.least(
            F.lit(n_buckets - 1),
            F.floor(span * F.lit(float(n_buckets)) / F.lit(float(hi - lo) + 1.0)),
        )
    b = tagged.withColumn("_bkt", bkt.cast("int"))
    w_in = (
        Window.partitionBy("_k", "_bkt")
        .orderBy("_ts", "_is_left", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = b.select("*", F.last("_r", ignorenulls=True).over(w_in).alias("_in"))
    # last right row per (key, bucket): max_by over right rows only; the
    # _tb tie-break keeps the pick identical to the plain path's window
    right_rows = b.filter(F.col("_is_left") == 0)
    summary = right_rows.groupBy("_k", "_bkt").agg(
        F.max_by(
            F.col("_r"), F.struct(F.col("_ts"), F.col("_is_left"), F.col("_tb"))
        ).alias("_lastrow")
    )
    spine = b.select("_k", "_bkt").distinct()
    w_prev = (
        Window.partitionBy("_k")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        spine.join(summary, ["_k", "_bkt"], "left")
        .select(
            "_k",
            "_bkt",
            F.last(F.col("_lastrow"), ignorenulls=True).over(w_prev).alias("_ci"),
        )
    )
    joined = in_bucket.join(carry_in, ["_k", "_bkt"])
    return joined.select(
        *[c for c in tagged.columns],
        F.coalesce(F.col("_in"), F.col("_ci")).alias("_lastrow"),
    )


def _is_ts(df: DataFrame) -> bool:
    return dict(df.dtypes).get("_ts", "").startswith("timestamp")


def key_skew_report(df: DataFrame, key: str, top: int = 10) -> list[tuple]:
    """Diagnostic: (key, row_count) for the `top` heaviest keys — one
    aggregation job. (No total row: compute hot-key share against a count()
    the caller already has; review r9 fixed the docstring overpromise.) Use before choosing ``time_buckets`` for
    ``asof_join`` / deciding whether a windowed operator needs the salted
    path: a key holding >> total/partitions rows will serialize its window
    task on the plain path."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).orderBy(F.desc("n")).limit(top)
    return [(r[key], r["n"]) for r in counts.collect()]


# ------------------------------------------------------------------ queries


def a01_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase attributed to the user's most recent prior click.
    Presented per user in purchase-time order (event_id tie-break), which
    lets the output order fuse with the join's key partitioning: with
    ``ranged_by_key`` the as-of's single exchange already yields ordered
    user ranges, so the total order is a free in-partition sort (pinned
    equal to a true orderBy in tests)."""
    e = load_events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases,
        clicks.withColumnRenamed("event_id", "click_id"),
        on="user_id",
        right_value_cols=["click_id"],
        ranged_by_key=True,
    )
    return joined.sortWithinPartitions("user_id", "ts", "event_id").select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        "click_id_right",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_right")).alias("gap_seconds"),
    )


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
ORDER BY p.user_id, p.ts, p.event_id
"""


QUERIES = {"a01_purchase_attribution": a01_purchase_attribution}
ORACLE = {"a01_purchase_attribution": ORACLE_A01}

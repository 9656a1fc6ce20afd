"""Hypertable-style time rollup: one aggregate per time grain, where every
coarser grain REAGGREGATES the next finer grain's result instead of
re-scanning raw rows — the continuous-aggregate pattern. At 100 TB the raw
scan happens once (for the finest grain, ~|raw| -> |buckets| reduction);
each further grain aggregates the previous grain's already-tiny output, and
Spark's ReuseExchange dedups the shared shuffle between the union branch
that emits a grain and the branch that consumes it.

Only mergeable aggregates participate (count/sum/min/max; avg derives as
sum/count downstream) — the same restriction every continuous-aggregate
system imposes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from score_spark.io import load_events, presentation_sort

# fine -> coarse order of the date_trunc grains this rollup understands
_GRAIN_ORDER = (
    "second",
    "minute",
    "hour",
    "day",
    "week",
    "month",
    "quarter",
    "year",
)


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Stacked aggregates: (grain, bucket_start, n, total_value, min_value,
    max_value) for each grain, coarse grains computed FROM the finer ones.
    ``grains`` must run fine-to-coarse: re-truncating a coarse bucket at a
    finer grain is a no-op, so a coarse-before-fine order would silently
    emit rows LABELED with the finer grain but aggregated at the coarser
    one (review r7) — validated here. 'week' and 'month'/'quarter' are
    incomparable (weeks cross month boundaries), so week only follows
    day-or-finer grains."""
    if not grains:
        raise ValueError("need at least one grain")
    ranks = []
    for g in grains:
        if g not in _GRAIN_ORDER:
            raise ValueError(f"unknown grain {g!r}; one of {_GRAIN_ORDER}")
        ranks.append(_GRAIN_ORDER.index(g))
    if any(b <= a for a, b in zip(ranks, ranks[1:])):
        raise ValueError(f"grains must be ordered fine to coarse, got {grains}")
    if "week" in grains and any(
        _GRAIN_ORDER.index(g) > _GRAIN_ORDER.index("week") for g in grains
    ):
        raise ValueError(
            "week buckets cross month boundaries; a coarser grain cannot be "
            "derived from them — split into separate rollups"
        )
    cur = (
        df.groupBy(F.date_trunc(grains[0], F.col(ts_col)).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    levels = [cur.select(F.lit(grains[0]).alias("grain"), "*")]
    for g in grains[1:]:
        cur = (
            cur.groupBy(F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"))
            .agg(
                F.sum("n").alias("n"),
                F.sum("total_value").alias("total_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        levels.append(cur.select(F.lit(g).alias("grain"), "*"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


# ------------------------------------------------------------------ queries


def h01_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour + day continuous aggregate over events. The oracle computes each
    grain directly from raw rows — equality proves the hierarchical merge
    (counts/sums/mins over partial results) is lossless."""
    e = load_events(spark, sf_dir)
    r = time_rollup(e, grains=("hour", "day"))
    # calendar-bounded result (#buckets x #grains — tens of thousands of
    # rows over years of data regardless of input size), so the bounded
    # presentation sort applies; shuffle=True isolates the single-task sort
    # behind an exchange instead of coalescing the union's agg branches
    # (coalesce(1) would propagate through the union and serialize both
    # reduce stages — and break the ReusedExchange the rollup is built on)
    return presentation_sort(
        r.select(
            "grain",
            "bucket_start",
            "n",
            F.round("total_value", 2).alias("total_value"),
            F.round("min_value", 2).alias("min_value"),
            F.round("max_value", 2).alias("max_value"),
        ),
        "grain",
        "bucket_start",
        shuffle=True,
    )


ORACLE_H01 = """
WITH by_hour AS (
  SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket_start,
         count(*) AS n, round(sum(value), 2) AS total_value,
         round(min(value), 2) AS min_value, round(max(value), 2) AS max_value
  FROM events GROUP BY 2
),
by_day AS (
  SELECT 'day' AS grain, date_trunc('day', ts) AS bucket_start,
         count(*) AS n, round(sum(value), 2) AS total_value,
         round(min(value), 2) AS min_value, round(max(value), 2) AS max_value
  FROM events GROUP BY 2
)
SELECT * FROM by_hour
UNION ALL
SELECT * FROM by_day
ORDER BY grain, bucket_start
"""

QUERIES = {"h01_time_rollup": h01_time_rollup}
ORACLE = {"h01_time_rollup": ORACLE_H01}

"""Table loading helpers for the driver-provided testdata layout
(`<sf_dir>/<table>.parquet`, see TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst keeps predicate
pushdown, column pruning, and partition discovery. At cluster scale the same
call reads a multi-file directory; nothing here assumes single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a CPU-bound per-row pipeline (shingling, hashing, text stats)
    across the cluster when the scan produced fewer tasks than cores — the
    single-file / single-row-group case where Spark cannot split the input.

    No-op when the scan already has >= target partitions, so at cluster scale
    (many files, splittable row groups) this adds zero shuffle; on tiny
    local inputs it converts a single-task stage into a cores-wide one for
    the price of shuffling the (small by definition) input."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark
    rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long (legacy conf) and
    truncate to microseconds — the same truncation DuckDB applies — using
    integer division (a double intermediate would lose precision at 1e18 ns).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = load_table(spark, sf_dir, "events")
    if dict(e.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        e = e.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return e

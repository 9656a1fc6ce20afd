"""Write-path helpers: partitioned layouts and bucketed tables.

The read side of this engine inherits Spark's scan machinery; the write side
is where a 100 TB pipeline creates (or destroys) the layout every downstream
query depends on:

- ``write_partitioned``: Hive-style directory partitioning with file sizing.
  A naive ``df.write.partitionBy(...)`` emits one file per (task, partition
  value) — at 1000 tasks x 365 dates that is 365k tiny files per day. The
  helper repartitions on the partition columns first (plus an optional salt
  to split hot partition values across several tasks/files) so each
  directory gets ``files_per_partition`` well-sized files, and caps row
  count per file with ``maxRecordsPerFile`` as the backstop.

- ``write_bucketed``: persistent hash-bucketed (optionally sorted) tables.
  Two tables bucketed on the same key with the same bucket count join with
  ZERO exchange on either side — the shuffle happens once at write time and
  is amortized over every later join/aggregation on that key. This is the
  co-location story for repeated big-big joins (events x users, lineitem x
  orders): at 100 TB re-shuffling both sides per query is the dominant cost,
  bucketing moves it to ingest. (Bucketed tables require the session catalog
  — ``saveAsTable`` — because the bucket spec lives in table metadata, not
  in the files.)

Reference scope note: taboola/ScORe has no write path at all (it rewrites
read schemas only; /root/reference/README.md:23-28) — sinks are part of the
beyond-reference surface this engine adds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    files_per_partition: int = 1,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a Hive-style partitioned dataset with bounded file counts.

    ``files_per_partition > 1`` salts the pre-write repartition so a hot
    partition value (one day holding half the data) spreads across that many
    tasks instead of funneling through one; ``maxRecordsPerFile`` still
    splits oversized task outputs as the final backstop."""
    w = df
    if partition_by:
        keys = [F.col(c) for c in partition_by]
        if files_per_partition > 1:
            salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition))
            # explicit partition count: a user-specified repartition width is
            # final (AQE will not coalesce it away), so the salt reliably
            # splits hot partition values even when the input is small
            n = max(
                files_per_partition, df.sparkSession.sparkContext.defaultParallelism
            )
            w = df.repartition(n, *keys, salt)
        else:
            w = df.repartition(*keys)
    writer = (
        w.write.format(fmt)
        .mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: tuple[str, ...],
    n_buckets: int,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a hash-bucketed table in the session catalog.

    Joins/aggregations between tables bucketed on the same keys with the
    same ``n_buckets`` read co-located and skip the exchange entirely
    (verified by plan assertion in tests/test_sinks.py). ``sort_by``
    additionally pre-sorts within buckets so sort-merge joins skip the sort.
    Size ``n_buckets`` to the target parallelism at full scale — buckets are
    fixed at write time and do not split. ``path`` makes it an external
    table at that location (the warehouse dir is static session config)."""
    if not bucket_by:
        raise ValueError("bucket_by must name at least one column")
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_by: tuple[str, ...],
    mode: str = "overwrite",
    row_group_bytes: int | None = None,
) -> None:
    """Cluster-by-write: range-partition + in-partition sort on ``sort_by``
    before writing parquet, so every row group's min/max stats cover a
    narrow, near-disjoint key range. Downstream range predicates on those
    keys then skip whole row groups via ordinary parquet filter pushdown —
    the portable data-skipping layout (what Z-ordering generalizes to
    multiple columns; for one clustering dimension a plain sort IS the
    optimal layout). At 100 TB this converts "scan everything, filter
    late" time-range queries into reads of a few percent of the groups,
    with zero read-side machinery: the stats are standard parquet, so any
    engine (DuckDB included) skips too.

    One range exchange at write time (the same sampler+shuffle a global
    sort pays), amortized over every later scan. ``row_group_bytes`` tunes
    parquet.block.size: smaller groups = finer skipping granularity but
    more footer overhead — leave default for production, shrink in tests
    to force multiple groups on small data. The skipping property is
    proven from the written footers in tests/test_sinks.py, not assumed."""
    if not sort_by:
        raise ValueError("sort_by must name at least one column")
    out = df.repartitionByRange(*sort_by).sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)

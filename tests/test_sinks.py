"""Write-path semantics: partitioned layout file bounds; bucketed tables
join exchange-free (the co-location contract)."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from score_spark.io import load_table
from score_spark.sinks import write_bucketed, write_partitioned


def test_write_partitioned_bounds_files_per_partition(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "prio", F.col("o_orderpriority")
    )
    out = str(tmp_path / "orders_part")
    write_partitioned(orders, out, partition_by=("prio",), files_per_partition=1)
    part_dirs = [p for p in glob.glob(f"{out}/prio=*") if os.path.isdir(p)]
    assert part_dirs, "no partition directories written"
    for d in part_dirs:
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) == 1, f"{d}: expected 1 file, got {len(files)}"
    # round-trips with partition discovery
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert "prio" in back.columns


def test_write_partitioned_salt_spreads_hot_partition(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn("one", F.lit("all"))
    out = str(tmp_path / "orders_hot")
    write_partitioned(orders, out, partition_by=("one",), files_per_partition=4)
    files = glob.glob(f"{out}/one=all/*.parquet")
    # the single hot partition value spreads across multiple files
    assert len(files) > 1
    assert spark.read.parquet(out).count() == orders.count()


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    """orders + lineitem bucketed on the join key into the session catalog."""
    warehouse = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "orders_b", ("o_orderkey",), 4,
        sort_by=("o_orderkey",), path=str(warehouse / "orders_b"),
    )
    write_bucketed(
        lineitem, "lineitem_b", ("l_orderkey",), 4,
        sort_by=("l_orderkey",), path=str(warehouse / "lineitem_b"),
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_exchange_free(spark, bucketed_pair):
    orders, lineitem = bucketed_pair
    # force the sort-merge path so the assertion is about bucketing, not a
    # runtime broadcast hiding the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("orders_b")
            .join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan
        # the join's inputs come straight from the bucketed scans — no
        # exchange between scan and join on either side
        before_join = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in before_join, plan
        # and the result matches the plain (shuffled) join
        expected = (
            orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {(r["o_orderpriority"], r["n"]) for r in joined.collect()}
        want = {(r["o_orderpriority"], r["n"]) for r in expected.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")


def test_bucketed_aggregation_skips_exchange(spark, bucketed_pair):
    agg = spark.table("lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_write_sorted_enables_row_group_skipping(spark, sf_dir, tmp_path):
    """The clustered layout must make row-group min/max stats selective:
    for a narrow ts window, the fraction of row groups whose [min, max]
    overlaps the predicate must be small on the sorted layout and ~total on
    the unsorted one. Measured from the written parquet footers (the stats
    any engine's pushdown consumes), not assumed from the plan."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from score_spark.io import load_events
    from score_spark.sinks import write_sorted

    e0 = load_events(spark, str(sf_dir)).select("event_id", "ts", "value")
    # inflate the tiny fixture ~8x (jittered copies) so the 16 KB row-group
    # size still yields enough groups to measure skipping meaningfully
    import functools

    e = functools.reduce(
        lambda a, b: a.unionAll(b),
        [
            e0.select(
                (F.col("event_id") + i * 10_000_000).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {i * 7} SECONDS")).alias("ts"),
                "value",
            )
            for i in range(8)
        ],
    )
    sorted_dir = str(tmp_path / "sorted")
    unsorted_dir = str(tmp_path / "unsorted")
    # small groups so the (tiny) fixture still yields many row groups. The
    # control arm must be GENUINELY time-scrambled: sorting by raw event_id
    # inherited the fixture's entropy — at sf0.01 ids correlate with ts
    # (sequential generation), so the "unsorted" layout was half
    # time-clustered and its overlap fraction dropped to 0.61 (r9 soak).
    # xxhash64(event_id) decorrelates deterministically at every SF.
    write_sorted(e, sorted_dir, sort_by=("ts",), row_group_bytes=16 * 1024)
    (e.repartition(4).sortWithinPartitions(F.xxhash64("event_id"))
     .write.mode("overwrite").option("parquet.block.size", str(16 * 1024))
     .parquet(unsorted_dir))

    lo, hi = e.select(F.min("ts"), F.max("ts")).first()
    window_lo = lo + (hi - lo) * 45 // 100
    window_hi = lo + (hi - lo) * 55 // 100

    def overlap_fraction(d):
        total = hits = 0
        for f in glob.glob(f"{d}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            sch = meta.schema.to_arrow_schema()
            ts_idx = sch.get_field_index("ts")
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(ts_idx).statistics
                total += 1
                gmin, gmax = st.min.replace(tzinfo=None), st.max.replace(tzinfo=None)
                if gmax >= window_lo and gmin <= window_hi:
                    hits += 1
        assert total >= 8, f"fixture produced only {total} row groups"
        return hits / total

    frac_sorted = overlap_fraction(sorted_dir)
    frac_unsorted = overlap_fraction(unsorted_dir)
    assert frac_sorted <= 0.35, (frac_sorted, frac_unsorted)
    assert frac_unsorted >= 0.9, (frac_sorted, frac_unsorted)
    # and the predicate actually reaches the scan as a pushed filter
    q = spark.read.parquet(sorted_dir).filter(
        (F.col("ts") >= F.lit(window_lo)) & (F.col("ts") <= F.lit(window_hi))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "ts" in plan.split("PushedFilters: [", 1)[1][:120]


def test_k01_join_plan_is_exchange_free_on_join_sides(spark, sf_dir):
    """The gated round-trip query (sinks.k01_bucketed_join) must actually
    exercise the bucketed co-location: with broadcast disabled (at test SF
    Catalyst would otherwise broadcast the tiny dimension and hide the
    question), the join must plan as a sort-merge over the bucketed scans
    with NO shuffle exchange on either side — the shuffle happened once at
    write time. The only exchange left is above the join (final
    group-count-sized aggregate)."""
    from score_spark.sinks import k01_bucketed_join

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = k01_bucketed_join(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
        below_join = plan.split("Join")[-1]
        assert "Exchange" not in below_join, (
            "bucketed join sides were re-shuffled:\n" + plan[:4000]
        )
        assert "SelectedBucketsCount" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")


def test_bucketed_overwrite_cleans_qualified_orphan_not_default(spark, sf_dir):
    """Orphan cleanup for a QUALIFIED table name must target
    <warehouse>/<db>.db/<table>, never the default database's same-named
    directory (ADVICE r6: the old string-join deleted default's unrelated
    data and left the real orphan in place)."""
    import os
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("CREATE DATABASE IF NOT EXISTS sinks_adv")
    spark.sql("DROP TABLE IF EXISTS sinks_adv.orph")
    orphan = os.path.join(wh, "sinks_adv.db", "orph")
    bystander = os.path.join(wh, "orph")
    os.makedirs(orphan, exist_ok=True)
    open(os.path.join(orphan, "stale.parquet"), "w").close()
    os.makedirs(bystander, exist_ok=True)
    sentinel = os.path.join(bystander, "keep.parquet")
    open(sentinel, "w").close()
    try:
        df = load_table(spark, sf_dir, "region")
        write_bucketed(df, "sinks_adv.orph", ("r_regionkey",), n_buckets=2)
        assert os.path.exists(sentinel), "default-db bystander dir was deleted"
        assert spark.table("sinks_adv.orph").count() == df.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS sinks_adv.orph")
        spark.sql("DROP DATABASE IF EXISTS sinks_adv CASCADE")
        shutil.rmtree(bystander, ignore_errors=True)


def test_write_zordered_skips_on_both_dimensions(spark, tmp_path):
    """Z-order layout: row-group stats must be selective on EVERY clustered
    dimension, where a plain 1-D sort is selective on the leading column
    only. Proven from written footers like the write_sorted test."""
    import glob

    import pyarrow.parquet as pq

    from score_spark.sinks import write_sorted, write_zordered

    n = 120_000
    df = spark.range(n).selectExpr(
        "id",
        "CAST(pmod(xxhash64(id, 1), 1000000) AS DOUBLE) / 1000000 AS x",
        "CAST(pmod(xxhash64(id, 2), 1000000) AS DOUBLE) / 1000000 AS y",
    )
    zdir = str(tmp_path / "zordered")
    sdir = str(tmp_path / "xsorted")
    write_zordered(df, zdir, ("x", "y"), bits_per_dim=8, row_group_bytes=24 * 1024)
    write_sorted(df, sdir, sort_by=("x",), row_group_bytes=24 * 1024)

    def overlap_fraction(d, col, lo, hi):
        total = hits = 0
        for f in glob.glob(f"{d}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            idx = meta.schema.to_arrow_schema().get_field_index(col)
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(idx).statistics
                total += 1
                if st.max >= lo and st.min <= hi:
                    hits += 1
        assert total >= 16, f"only {total} row groups in {d}"
        return hits / total

    # narrow (10%) windows on each dimension
    zx = overlap_fraction(zdir, "x", 0.45, 0.55)
    zy = overlap_fraction(zdir, "y", 0.45, 0.55)
    sx = overlap_fraction(sdir, "x", 0.45, 0.55)
    sy = overlap_fraction(sdir, "y", 0.45, 0.55)
    # 1-D sort: near-perfect on x, useless on y
    assert sx <= 0.2, (sx, sy, zx, zy)
    assert sy >= 0.9, (sx, sy, zx, zy)
    # z-order: selective on BOTH (theory: a 10% window on one of two
    # interleaved dims overlaps ~sqrt(0.1)=32% of groups; assert < 60% to
    # stay robust to bucket-boundary effects at this tiny size)
    assert zx <= 0.6 and zy <= 0.6, (sx, sy, zx, zy)
    # and the layout round-trips every row
    assert spark.read.parquet(zdir).count() == n
    # rejects the degenerate call
    import pytest

    with pytest.raises(ValueError, match="write_sorted"):
        write_zordered(df, str(tmp_path / "bad"), ("x",))


def test_write_partitioned_salt_hashes_around_map_columns(spark, tmp_path):
    """xxhash64 rejects MapType, so the deterministic salt must hash only the
    hashable columns — previously ANY map column made files_per_partition>1
    raise before a single byte was written (review r8)."""
    df = spark.range(2000).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS p", "map('k', id) AS m"
    )
    out = str(tmp_path / "with_map")
    write_partitioned(df, out, partition_by=("p",), files_per_partition=2)
    back = spark.read.parquet(out)
    assert back.count() == 2000
    assert back.selectExpr("sum(m['k'])").first()[0] == sum(range(2000))


def test_write_zordered_rejects_morton_bit_overflow(spark, tmp_path):
    """n_dims * bits_per_dim > 63 would push interleaved bits into the long
    sign bit / Java shift wraparound and silently corrupt the clustering
    order (review r8) — the guard fails loudly instead."""
    from score_spark.sinks import write_zordered

    df = spark.range(10).selectExpr(
        *[f"CAST(id AS DOUBLE) AS c{i}" for i in range(7)]
    )
    with pytest.raises(ValueError, match="Morton bits"):
        write_zordered(
            df, str(tmp_path / "zover"), tuple(f"c{i}" for i in range(7)),
            bits_per_dim=10,
        )


def test_write_zordered_preserves_user_z_named_columns(spark, tmp_path):
    """User columns named `_z` / `_zb0` must survive the write: the internal
    Morton/bucket columns previously shadowed them — a real `_z` column was
    silently replaced then dropped from the written data (review r8)."""
    from score_spark.sinks import write_zordered

    df = spark.range(5000).selectExpr(
        "id",
        "CAST(pmod(xxhash64(id, 1), 1000) AS DOUBLE) AS x",
        "CAST(pmod(xxhash64(id, 2), 1000) AS DOUBLE) AS y",
        "id * 2 AS _z",
        "id * 3 AS _zb0",
    )
    out = str(tmp_path / "zuser")
    write_zordered(df, out, ("x", "y"), bits_per_dim=6)
    back = spark.read.parquet(out)
    assert set(back.columns) == {"id", "x", "y", "_z", "_zb0"}
    assert back.count() == 5000
    assert back.filter("_z != id * 2 OR _zb0 != id * 3").count() == 0


def test_bucketed_overwrite_backtick_quoted_dotted_name(spark, sf_dir):
    """A backtick-quoted table name containing a dot is ONE identifier in the
    current database — the orphan-cleanup path previously split on the dot
    and computed <warehouse>/ord.db/ers, recursively deleting an UNRELATED
    table's directory (review r8). Spark's session catalog itself rejects
    dots in table names, so saveAsTable fails either way — but the
    misdirected fs.delete ran BEFORE that rejection; the assertion here is
    that cleanup targets the quoted name's own location, never db 'ord'."""
    import shutil

    from pyspark.errors.exceptions.captured import AnalysisException

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = os.path.join(wh, "ord.ers")
    bystander = os.path.join(wh, "ord.db", "ers")
    os.makedirs(orphan, exist_ok=True)
    stale = os.path.join(orphan, "stale.parquet")
    open(stale, "w").close()
    os.makedirs(bystander, exist_ok=True)
    sentinel = os.path.join(bystander, "keep.parquet")
    open(sentinel, "w").close()
    try:
        df = load_table(spark, sf_dir, "region")
        with pytest.raises(AnalysisException, match="INVALID_SCHEMA_OR_RELATION"):
            write_bucketed(df, "`ord.ers`", ("r_regionkey",), n_buckets=2)
        assert os.path.exists(sentinel), "misparsed db.table dir was deleted"
        # saveAsTable re-creates the directory with data files before the
        # name-validation failure, so assert on the stale MARKER, not the dir
        assert not os.path.exists(stale), "the quoted name's own orphan survived"
    finally:
        shutil.rmtree(os.path.join(wh, "ord.db"), ignore_errors=True)
        shutil.rmtree(orphan, ignore_errors=True)


def test_write_xcheck_unpersists_on_replace(spark):
    """Repeated write_xcheck calls under one name must not accumulate dead
    cached copies (review r8: nothing ever unpersisted the previous frame —
    long-lived sessions leaked storage memory until eviction thrash)."""
    from score_spark.xcheck import write_xcheck

    a = write_xcheck(spark.range(10), "unpersist_probe")
    assert a.storageLevel.useMemory
    b = write_xcheck(spark.range(20), "unpersist_probe")
    assert not a.storageLevel.useMemory, "previous cached copy not released"
    assert b.storageLevel.useMemory
    b.unpersist()


def test_orphan_cleanup_handles_escaped_backticks(spark, tmp_path):
    """`a``b` (an escaped backtick INSIDE a quoted name) previously toggled
    the hand-rolled parser's quote state, parsed to 'ab', and recursively
    DELETED unrelated table ab's warehouse directory (review r9, parse
    confirmed by execution). Parsing now delegates to Spark's own grammar;
    the unrelated table must survive a failing/odd-name overwrite."""
    import os
    import shutil

    from score_spark.sinks import write_bucketed

    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    victim = os.path.join(wh, "ab")
    os.makedirs(victim, exist_ok=True)
    marker = os.path.join(victim, "_MARKER")
    open(marker, "w").write("live")
    import contextlib

    try:
        # the odd name may or may not be writable — the property under test
        # is purely that the cleanup never deletes the unrelated directory
        with contextlib.suppress(Exception):
            write_bucketed(df, "`a``b`", ("a",), n_buckets=2)
        assert os.path.exists(marker), "unrelated table 'ab' was deleted"
    finally:
        shutil.rmtree(victim, ignore_errors=True)
        shutil.rmtree(os.path.join(wh, "a`b"), ignore_errors=True)
        try:
            spark.sql("DROP TABLE IF EXISTS `a``b`")
        except Exception:
            pass


def test_write_bucketed_accepts_catalog_qualified_name(spark):
    """spark_catalog.default.t is a name saveAsTable accepts; the old
    cleanup parser raised ValueError('expected [db.]table') before the
    write ever ran (review r9)."""
    from score_spark.sinks import write_bucketed

    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    write_bucketed(df, "spark_catalog.default.r9_q3t", ("a",), n_buckets=2)
    try:
        assert spark.table("r9_q3t").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS r9_q3t")


def test_write_partitioned_salts_dotted_column_names(spark, tmp_path):
    """A top-level column literally named 'a.b' (legal in parquet) made the
    salt's F.xxhash64 parse it as a nested path — UNRESOLVED_COLUMN before
    a single byte was written (review r9, confirmed by execution)."""
    from score_spark.sinks import write_partitioned

    df = spark.createDataFrame(
        [(1, "x", 5), (2, "x", 6)], ["c1", "p", "v"]
    ).withColumnRenamed("c1", "a.b")
    out = str(tmp_path / "dotted")
    write_partitioned(df, out, partition_by=("p",), files_per_partition=2)
    assert spark.read.parquet(out).count() == 2


def test_write_partitioned_dotted_partition_key(spark, tmp_path):
    """partition_by itself naming a dotted TOP-LEVEL column hit the same
    nested-path parse at the repartition the salt fix addressed — now both
    paths backtick-quote (review r10). writer.partitionBy takes raw names,
    so only the repartition keys needed the quoting."""
    from score_spark.sinks import write_partitioned

    df = spark.createDataFrame(
        [(1, "x", 5), (2, "y", 6)], ["c1", "p2", "v"]
    ).withColumnRenamed("p2", "p.q")
    out = str(tmp_path / "dotted_key")
    write_partitioned(df, out, partition_by=("p.q",), files_per_partition=2)
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert "p.q" in got.columns


def test_write_partitioned_rejects_fpp_without_partition_by(spark, tmp_path):
    import pytest

    from score_spark.sinks import write_partitioned

    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ValueError, match="requires partition_by"):
        write_partitioned(df, str(tmp_path / "x"), files_per_partition=4)


def test_write_zordered_rejects_nonpositive_bits(spark, tmp_path):
    import pytest

    from score_spark.sinks import write_zordered

    df = spark.createDataFrame([(1, 2)], "x bigint, y bigint")
    with pytest.raises(ValueError, match="bits_per_dim"):
        write_zordered(df, str(tmp_path / "z"), ("x", "y"), bits_per_dim=0)

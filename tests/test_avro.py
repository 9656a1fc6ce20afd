"""Round-trip tests for the vendored minimal Avro connector
(vendor/avro-src/MinimalAvroFileFormat.scala): write with Spark, read back,
prune nested schemas, and preserve the type lattice the engine uses."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T


# the suite targets the VENDORED connector (format "avro_minimal"); Spark
# 4.1.2 ships its own full avro connector inside spark-sql (the separate
# services-only score-spark-avro-distro-glue.jar registers it under "avro"
# — split from the minimal jar in r11 so the minimal jar never names a
# class it does not contain; see the scala header)
AVRO_FMT = "avro_minimal"


def _avro_available(spark) -> bool:
    try:
        # the vendored class lives on spark.jars, visible to Spark's own
        # loader (Utils.classForName), not necessarily to py4j's root loader
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.spark.sql.avrominimal.AvroFileFormat", True, False)
        return True
    except Exception:
        return False


@pytest.fixture()
def avro(spark):
    if not _avro_available(spark):
        pytest.skip("avro connector jar not on this session's classpath")
    return spark


def test_avro_roundtrip_all_supported_types(avro, tmp_path):
    spark = avro
    df = spark.sql(
        "SELECT 'a' s, 1L n, cast(7 as int) i, cast(1.5 as float) f, 2.5d db,"
        " true b, cast(x'0102' as binary) bin,"
        " timestamp'2024-01-02 03:04:05.123456' ts, date'2024-05-06' d,"
        " named_struct('x', 10L, 'y', named_struct('z', 'deep')) inner,"
        " array(1L, 2L, NULL) arr, map('k', 'v') m"
        " UNION ALL"
        " SELECT 'b', 2L, NULL, NULL, NULL, NULL, NULL, NULL, NULL,"
        " named_struct('x', 30L, 'y', named_struct('z', 'deeper')),"
        " array(3L), map('q', CAST(NULL AS STRING))"
    )
    path = str(tmp_path / "rt.avro")
    df.coalesce(1).write.format(AVRO_FMT).save(path)
    back = spark.read.format(AVRO_FMT).load(path)

    # the writer emits every field as a [null, T] union (same as upstream
    # spark-avro), so read-back nullability widens to all-nullable at every
    # nesting level — compare nullability-normalized schemas
    def norm(dt):
        if isinstance(dt, T.StructType):
            return T.StructType([T.StructField(f.name, norm(f.dataType), True) for f in dt.fields])
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(norm(dt.elementType), True)
        if isinstance(dt, T.MapType):
            return T.MapType(norm(dt.keyType), norm(dt.valueType), True)
        return dt

    assert norm(back.schema) == norm(df.schema)
    a = sorted(df.collect(), key=lambda r: r.s)
    b = sorted(back.collect(), key=lambda r: r.s)
    assert a == b
    assert a[0].ts == datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)


def test_avro_nested_pruned_read(avro, tmp_path):
    spark = avro
    path = str(tmp_path / "pruned.avro")
    spark.createDataFrame(
        [("a", 1, (10, 20)), ("b", 2, (30, 40))],
        T.StructType(
            [
                T.StructField("s", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField(
                    "inner",
                    T.StructType(
                        [T.StructField("x", T.LongType()), T.StructField("y", T.LongType())]
                    ),
                ),
            ]
        ),
    ).coalesce(1).write.format(AVRO_FMT).save(path)
    pruned = spark.read.schema("s string, inner struct<x: bigint>").format(AVRO_FMT).load(path)
    assert sorted((r.s, r.inner.x) for r in pruned.collect()) == [("a", 10), ("b", 30)]


def test_avro_readback_from_second_engine_shape(avro, tmp_path):
    """The written container must be standard Avro: decode a file with the
    avro Java library directly (not through the connector's own reader)."""
    spark = avro
    path = str(tmp_path / "plain.avro")
    spark.createDataFrame([("x", 5)], "s string, n long").coalesce(1).write.format(
        AVRO_FMT
    ).save(path)
    import glob

    f = glob.glob(f"{path}/part-*.avro")[0]
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    rec = reader.next()
    assert str(rec.get("s")) == "x" and rec.get("n") == 5
    reader.close()


def _write_raw_avro(jvm, schema_json: str, path: str, rows: list[dict]):
    """Write an avro file with the raw avro Java library (bypassing the
    connector's writer) so the file can contain shapes our writer never
    emits."""
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(path))
    for row in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        for k, v in row.items():
            rec.put(k, v)
        writer.append(rec)
    writer.close()
    return schema


def test_avro_pruned_fields_are_skipped_not_decoded(avro, tmp_path):
    """The read path must SKIP pruned fields at the binary level, never
    decode-then-discard them — proven mechanically: the file carries a field
    whose type the reader cannot DECODE at all (a multi-branch non-null
    union, outside the supported [null, T] subset) but can always SKIP.
    A full-decode-then-project implementation fails both reads; the
    projecting reader serves the pruned one (VERDICT r6 #1)."""
    spark = avro
    f = str(tmp_path / "mixed.avro")
    schema_json = (
        '{"type":"record","name":"r","fields":['
        '{"name":"s","type":"string"},'
        '{"name":"poison","type":["int","string"]},'
        '{"name":"n","type":"long"}]}'
    )
    jvm = spark._jvm
    _write_raw_avro(
        jvm, schema_json, f, [{"s": "a", "poison": 7, "n": 10}, {"s": "b", "poison": "x", "n": 20}]
    )
    pruned = spark.read.schema("s string, n bigint").format(AVRO_FMT).load(f)
    assert sorted((r.s, r.n) for r in pruned.collect()) == [("a", 10), ("b", 20)]
    with pytest.raises(Exception, match="union|Union|poison|support"):
        spark.read.schema(
            "s string, poison string, n bigint"
        ).format(AVRO_FMT).load(f).collect()


def test_avro_large_file_splits_across_tasks(avro, tmp_path):
    """Sync-marker split handling (VERDICT r6 #2): one multi-block avro file
    must fan out across >1 input partition and still read every row exactly
    once. maxPartitionBytes is shrunk so the single file yields many splits;
    the row set (ids are unique) proves the split tiling neither drops nor
    duplicates block contents at split boundaries."""
    spark = avro
    path = str(tmp_path / "big.avro")
    n = 200_000
    spark.range(n).selectExpr(
        "id", "repeat(uuid(), 4) AS pad"
    ).coalesce(1).write.format(AVRO_FMT).save(path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        df = spark.read.format(AVRO_FMT).load(path).select("id")
        parts = df.rdd.getNumPartitions()
        assert parts > 4, f"unsplit read: {parts} partition(s)"
        got = df.collect()
        assert len(got) == n
        assert len({r.id for r in got}) == n
        assert df.selectExpr("sum(id) s").collect()[0].s == n * (n - 1) // 2
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_avro_timestamp_millis_reads_correctly(avro, tmp_path):
    """An EXTERNAL avro file may carry timestamp-millis (our writer emits
    micros): the long must be scaled x1000 into Catalyst micros, not passed
    through (review r6: unscaled millis landed every value in Jan 1970)."""
    spark = avro
    jvm = spark._jvm
    schema_json = (
        '{"type":"record","name":"r","fields":['
        '{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}},'
        '{"name":"n","type":"long"}]}'
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    f = str(tmp_path / "millis.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(f))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    # 2024-01-02 03:04:05.123 UTC in epoch millis
    rec.put("ts", 1704164645123)
    rec.put("n", 7)
    writer.append(rec)
    writer.close()

    got = spark.read.format(AVRO_FMT).load(f).collect()
    import datetime

    assert got[0].n == 7
    assert got[0].ts == datetime.datetime(2024, 1, 2, 3, 4, 5, 123000)
    # the x1000 scaling is a TimestampType-slot concern only: an explicit
    # bigint read of the same field must return the RAW stored millis
    # (review r7: an unconditional scale inflated such reads 1000x)
    raw = spark.read.schema("ts bigint, n bigint").format(AVRO_FMT).load(f).collect()
    assert raw[0].ts == 1704164645123


def test_prune_works_over_avro_source(avro, tmp_path):
    """The best-effort prune() loop is format-generic; prove it end-to-end
    for the vendored avro source: the pruned re-read must answer the query
    identically AND carry a genuinely narrower schema."""
    import pyspark.sql.functions as F

    from score_spark.schema_on_read.generator import SchemaOnRead
    from score_spark.schema_on_read.rewrite import Source, prune

    spark = avro
    path = str(tmp_path / "docs.avro")
    spark.createDataFrame(
        [(i, f"t{i}", (i * 10, f"fat{'x' * 50}")) for i in range(20)],
        "id long, tag string, payload struct<small: bigint, fat: string>",
    ).coalesce(1).write.format(AVRO_FMT).save(path)

    def q(t):
        return t["a"].groupBy("tag").agg(F.sum("payload.small").alias("s"))

    full = q({"a": spark.read.format(AVRO_FMT).load(path)})
    pruned_df = prune(spark, {"a": Source(path, AVRO_FMT)}, q)
    assert sorted(map(tuple, pruned_df.collect())) == sorted(map(tuple, full.collect()))
    # the derived read schema must actually narrow (payload.fat dropped)
    sor = SchemaOnRead.generate(full)
    ps = sor.for_paths(path)
    names = {f.name for f in ps.fields}
    assert "id" not in names
    payload = [f for f in ps.fields if f.name == "payload"][0]
    assert [sf.name for sf in payload.dataType.fields] == ["small"]


def test_avro_partitioned_directory_layout(avro, tmp_path):
    """Hive-style directory partitioning must work through the minimal
    connector: partition values come from the DIRECTORY (appended by
    Spark's buildReaderWithPartitionValues wrapper, which the FileFormat
    inherits), not the files — the same partitioned layout the reference
    tests for parquet (sample-partitioned.parquet fixtures)."""
    spark = avro
    path = str(tmp_path / "part.avro")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 20)], "id long, s string, someLong long"
    ).write.partitionBy("someLong").format(AVRO_FMT).save(path)
    back = spark.read.format(AVRO_FMT).load(path)
    assert sorted((r.id, r.s, r.someLong) for r in back.collect()) == [
        (1, "a", 10),
        (2, "b", 10),
        (3, "c", 20),
    ]
    # partition pruning: the filter must land in the scan's PartitionFilters
    # (inputFiles() lists the unpruned relation, so check the plan)
    pruned = back.filter("someLong = 20")
    assert [(r.id, r.someLong) for r in pruned.collect()] == [(3, 20)]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "someLong" in plan.split("PartitionFilters")[1][:120], plan


def test_avro_primitive_promotion_on_read(avro, tmp_path):
    """Avro-spec widening: reading an int-written field with a wider
    required type (bigint/double) must decode the promoted value, not crash
    with a mis-boxed primitive (review r6)."""
    spark = avro
    path = str(tmp_path / "promo.avro")
    spark.sql("SELECT cast(7 as int) n, cast(1.5 as float) f").coalesce(1).write.format(
        AVRO_FMT
    ).save(path)
    got = spark.read.schema("n bigint, f double").format(AVRO_FMT).load(path).collect()
    assert got[0].n == 7 and isinstance(got[0].n, int)
    assert abs(got[0].f - 1.5) < 1e-12


def test_avro_compression_codecs_roundtrip(avro, tmp_path):
    """Writer codec support (default snappy, like upstream spark-avro):
    every supported codec round-trips, the container metadata records it,
    and compressed files still split/read transparently."""
    spark = avro
    df = spark.range(500).selectExpr("id", "repeat('abc', 20) AS pad")
    import glob

    jvm = spark._jvm
    for codec, meta in [
        (None, "snappy"),  # default
        ("uncompressed", "null"),
        ("snappy", "snappy"),
        ("deflate", "deflate"),
        ("zstandard", "zstandard"),
        ("bzip2", "bzip2"),
        ("xz", "xz"),
    ]:
        path = str(tmp_path / f"c_{codec or 'default'}.avro")
        w = df.coalesce(1).write.format(AVRO_FMT)
        if codec is not None:
            w = w.option("compression", codec)
        w.save(path)
        back = spark.read.format(AVRO_FMT).load(path)
        assert back.count() == 500
        assert back.selectExpr("sum(id) s").collect()[0].s == 500 * 499 // 2
        f = glob.glob(f"{path}/part-*.avro")[0]
        r = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        got = r.getMetaString("avro.codec")
        r.close()
        assert (got or "null") == meta, (codec, got)
    # an unknown codec is rejected up front (Spark's writer-level short-name
    # mapping catches it first; AvroCodecs.validate is the backstop when the
    # option arrives through a path Spark doesn't pre-validate)
    with pytest.raises(Exception, match="compression|CODEC_SHORT_NAME_NOT_FOUND"):
        df.write.format(AVRO_FMT).option("compression", "lz77").save(str(tmp_path / "bad.avro"))


def test_avro_decimal_roundtrip(avro, tmp_path):
    """Decimal logical type (r10): written as avro bytes + decimal(p,s),
    read back bit-exact — the testdata's TPC-H money columns are decimal,
    so a lineitem round-trip through format(AVRO_FMT) must preserve values
    (including negatives: the payload is two's-complement big-endian)."""
    spark = avro
    from decimal import Decimal as D

    df = spark.createDataFrame(
        [
            (1, D("12345.67"), D("-0.01")),
            (2, D("-99999999.99"), D("0.00")),
            (3, None, D("42.42")),
        ],
        "id bigint, money decimal(10,2), tiny decimal(8,2)",
    )
    path = str(tmp_path / "dec.avro")
    df.coalesce(1).write.format(AVRO_FMT).save(path)
    back = spark.read.format(AVRO_FMT).load(path)
    # inference maps avro decimal(p,s) straight back to DecimalType(p,s)
    assert dict((f.name, f.dataType.simpleString()) for f in back.schema.fields) == {
        "id": "bigint", "money": "decimal(10,2)", "tiny": "decimal(8,2)"
    }
    got = {r.id: (r.money, r.tiny) for r in back.collect()}
    assert got == {
        1: (D("12345.67"), D("-0.01")),
        2: (D("-99999999.99"), D("0.00")),
        3: (None, D("42.42")),
    }


def test_avro_lineitem_money_columns_roundtrip(avro, sf_dir, tmp_path):
    """End-to-end over the driver's real decimal columns: lineitem's
    l_extendedprice/l_discount survive an avro round-trip value-for-value."""
    spark = avro
    src = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .limit(200)
    )
    path = str(tmp_path / "li.avro")
    src.write.format(AVRO_FMT).save(path)
    back = spark.read.format(AVRO_FMT).load(path)
    a = sorted(map(str, src.collect()))
    b = sorted(map(str, back.collect()))
    assert a == b


def test_avro_decimal_from_untagged_bytes_fails_loudly(avro, tmp_path):
    """Reading a DecimalType from a bytes column with NO avro decimal
    logical type has no defined scale — must raise, never guess."""
    spark = avro
    df = spark.createDataFrame([(bytearray(b"\x01\x02"),)], "b binary")
    path = str(tmp_path / "rawbytes.avro")
    df.coalesce(1).write.format(AVRO_FMT).save(path)
    with pytest.raises(Exception) as excinfo:
        spark.read.schema("b decimal(10,2)").format(AVRO_FMT).load(path).collect()
    # Spark wraps the reader error in FAILED_READ_FILE; the connector's
    # message sits in the Java cause chain (py4j's str() truncates it)
    msgs = [str(excinfo.value)]
    cause = getattr(excinfo.value, "java_exception", None)
    while cause is not None:
        msgs.append(str(cause.getMessage()))
        cause = cause.getCause()
    assert any("no decimal logical type" in m for m in msgs if m), msgs[:3]


def test_avro_builtin_and_minimal_interop(avro, tmp_path):
    """Registration contract (r10 find): Spark 4.1.2 ships the FULL avro
    connector inside spark-sql but WITHOUT its service registration, and the
    vendored jar's original same-FQN entry resolved to the DISTRO class
    under parent-first classloading — the vendored code was dead at runtime.
    Now: format("avro") = the builtin (service-registered by the separate
    distro-glue jar), format("avro_minimal") = the vendored connector, and files are
    interchangeable both ways (same container format)."""
    spark = avro
    from decimal import Decimal as D

    jvm = spark._jvm
    builtin = jvm.org.apache.spark.util.Utils.classForName(
        "org.apache.spark.sql.avro.AvroFileFormat", True, False
    ).newInstance()
    mine = jvm.org.apache.spark.util.Utils.classForName(
        "org.apache.spark.sql.avrominimal.AvroFileFormat", True, False
    ).newInstance()
    assert builtin.toString() == "Avro"
    assert mine.toString() == "Avro(minimal)"

    df = spark.createDataFrame(
        [(1, "a", D("9.99")), (2, "b", None)], "id bigint, s string, m decimal(6,2)"
    )
    p1, p2 = str(tmp_path / "by_min.avro"), str(tmp_path / "by_builtin.avro")
    df.coalesce(1).write.format("avro_minimal").save(p1)
    df.coalesce(1).write.format("avro").save(p2)
    want = sorted(map(str, df.collect()))
    assert sorted(map(str, spark.read.format("avro").load(p1).collect())) == want
    assert sorted(map(str, spark.read.format("avro_minimal").load(p2).collect())) == want


def test_avro_decimal_edge_values_roundtrip(avro, tmp_path):
    """Two's-complement payload edges: positive values whose unscaled
    BigInteger needs a leading sign byte, 38-digit precision (unscaled
    wider than 16 bytes), negative extremes, zero at scale."""
    spark = avro
    from decimal import Decimal as D

    vals = [
        D("0.0000000000"),
        D("0.0000000001"),
        D("-0.0000000001"),
        # max/min for decimal(38,10)
        D("9999999999999999999999999999.9999999999"),
        D("-9999999999999999999999999999.9999999999"),
        # unscaled = 2^63 (first value whose sign byte matters at 8 bytes)
        D("922337203.6854775808"),
        D("-922337203.6854775808"),
        D("1.5000000000"),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, v decimal(38,10)"
    )
    path = str(tmp_path / "dec_edge.avro")
    df.coalesce(1).write.format(AVRO_FMT).save(path)
    got = {r.id: r.v for r in spark.read.format(AVRO_FMT).load(path).collect()}
    assert got == {i: v for i, v in enumerate(vals)}, got
    # builtin connector agrees on the same file (payload is spec-exact)
    got2 = {r.id: r.v for r in spark.read.format("avro").load(path).collect()}
    assert got2 == got


def test_minimal_jar_service_entries_are_self_contained():
    """ADVICE r10: ServiceLoader instantiates every DataSourceRegister entry
    during lookupDataSource, and Spark does not catch the resulting
    ServiceConfigurationError — a service entry naming a class the jar does
    not contain breaks resolution of EVERY data source on distros lacking
    that class. Contract: score-spark-avro-minimal.jar registers only
    classes it ships; the builtin's glue registration lives in the
    services-only score-spark-avro-distro-glue.jar."""
    import os
    import zipfile

    vendor = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")
    svc = "META-INF/services/org.apache.spark.sql.sources.DataSourceRegister"

    def entries(jar):
        with zipfile.ZipFile(jar) as z:
            lines = z.read(svc).decode().splitlines()
            names = set(z.namelist())
        # ServiceLoader spec: '#' starts a comment, blanks ignored
        return [
            ln.split("#", 1)[0].strip() for ln in lines if ln.split("#", 1)[0].strip()
        ], names

    minimal, names = entries(os.path.join(vendor, "score-spark-avro-minimal.jar"))
    assert minimal, "minimal jar must register its own connector"
    for fqn in minimal:
        clazz = fqn.replace(".", "/") + ".class"
        assert clazz in names, f"service entry {fqn} not shipped in the minimal jar"

    glue, glue_names = entries(os.path.join(vendor, "score-spark-avro-distro-glue.jar"))
    assert glue == ["org.apache.spark.sql.avro.AvroFileFormat"]
    assert not any(n.endswith(".class") for n in glue_names), (
        "glue jar must stay services-only (it registers a class the DISTRO ships)"
    )


# ------------------------------------------- random-schema interop fuzz


def _norm_nullable(dt):
    if isinstance(dt, T.StructType):
        return T.StructType([T.StructField(f.name, _norm_nullable(f.dataType), True) for f in dt.fields])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_norm_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_norm_nullable(dt.keyType), _norm_nullable(dt.valueType), True)
    return dt


def test_avro_random_schema_interop_both_directions(avro, tmp_path):
    """Generative interop (r11): random nested schemas (struct/array/map
    over the full supported primitive lattice incl. decimal/timestamp/date/
    binary) and random rows must round-trip IDENTICALLY through all four
    paths: minimal->minimal, minimal->builtin, builtin->minimal, and a
    pruned minimal read of a random top-level subset. Schemas compare
    nullability-normalized (the writer emits [null, T] unions, same as
    upstream spark-avro)."""
    import datetime as dt
    import random
    from decimal import Decimal

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    spark = avro

    PRIMS = [
        (T.StringType(), lambda r: r.choice(["", "x", "héllo", "a" * 50])),
        (T.LongType(), lambda r: r.randint(-(2**62), 2**62)),
        (T.IntegerType(), lambda r: r.randint(-(2**31) + 1, 2**31 - 1)),
        (T.DoubleType(), lambda r: r.choice([0.0, -1.5, 3.25e10])),
        (T.FloatType(), lambda r: r.choice([0.0, 2.5, -0.125])),
        (T.BooleanType(), lambda r: r.choice([True, False])),
        (T.BinaryType(), lambda r: bytearray(r.randbytes(r.randint(0, 6)))),
        (T.DateType(), lambda r: dt.date(2024, r.randint(1, 12), r.randint(1, 28))),
        (T.TimestampType(), lambda r: dt.datetime(2024, 1, 2, 3, 4, 5, r.randint(0, 999999))),
        (T.DecimalType(12, 2), lambda r: Decimal(r.randint(-10**9, 10**9)) / 100),
        (T.DecimalType(38, 10), lambda r: Decimal(r.randint(-10**18, 10**18)) / 10**10),
    ]

    def draw_type(data, depth):
        kinds = ["prim"] if depth <= 0 else ["prim", "struct", "array", "map"]
        kind = data.draw(st.sampled_from(kinds))
        if kind == "prim":
            i = data.draw(st.integers(0, len(PRIMS) - 1))
            return PRIMS[i]
        if kind == "array":
            el = draw_type(data, depth - 1)
            return (T.ArrayType(el[0]), lambda r, el=el: [None if r.random() < 0.2 else el[1](r) for _ in range(r.randint(0, 3))])
        if kind == "map":
            val = draw_type(data, depth - 1)
            return (T.MapType(T.StringType(), val[0]),
                    lambda r, val=val: {f"k{i}": (None if r.random() < 0.2 else val[1](r)) for i in range(r.randint(0, 3))})
        n = data.draw(st.integers(1, 3))
        fields = [(f"f{i}", draw_type(data, depth - 1)) for i in range(n)]
        return (
            T.StructType([T.StructField(nm, t[0]) for nm, t in fields]),
            lambda r, fields=fields: tuple(None if r.random() < 0.15 else t[1](r) for _, t in fields),
        )

    seq = [0]

    @settings(max_examples=int(os.environ.get("SCORE_AVRO_FUZZ_N", "10")),
              deadline=None, suppress_health_check=list(HealthCheck))
    @given(data=st.data())
    def inner(data):
        ncols = data.draw(st.integers(1, 4))
        cols = [(f"c{i}", draw_type(data, 2)) for i in range(ncols)]
        schema = T.StructType([T.StructField(nm, t[0]) for nm, t in cols])
        seed = data.draw(st.integers(0, 2**31))
        rng = random.Random(seed)
        rows = [
            tuple(None if rng.random() < 0.1 else t[1](rng) for _, t in cols)
            for _ in range(rng.randint(1, 5))
        ]
        df = spark.createDataFrame(rows, schema)
        want = sorted(map(str, df.collect()))

        seq[0] += 1
        p_min = str(tmp_path / f"fz_min_{seq[0]}.avro")
        p_blt = str(tmp_path / f"fz_blt_{seq[0]}.avro")
        df.coalesce(1).write.mode("overwrite").format(AVRO_FMT).save(p_min)
        df.coalesce(1).write.mode("overwrite").format("avro").save(p_blt)

        for fmt, path in (
            (AVRO_FMT, p_min), ("avro", p_min), (AVRO_FMT, p_blt),
        ):
            back = spark.read.format(fmt).load(path)
            assert _norm_nullable(back.schema) == _norm_nullable(schema), (fmt, path)
            assert sorted(map(str, back.collect())) == want, (fmt, path, schema.simpleString())

        # pruned minimal read: a random nonempty top-level subset
        keep = sorted(data.draw(st.sets(st.integers(0, ncols - 1), min_size=1)))
        sub = T.StructType([schema.fields[i] for i in keep])
        back = spark.read.schema(sub).format(AVRO_FMT).load(p_min)
        want_sub = sorted(map(str, df.select(*[f.name for f in sub.fields]).collect()))
        got_sub = sorted(map(str, back.collect()))
        assert got_sub == want_sub, (sub.simpleString(), schema.simpleString())

    inner()

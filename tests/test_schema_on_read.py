"""Golden-schema tests — the pytest port of the reference's e2e suite
(/root/reference/score/src/test/java/com/taboola/spark/sql/score/SchemaOnReadGeneratorTest.java,
line cites per test). Pattern mirrors the reference: build a real query,
generate, assert the emitted StructType, and for re-execution cases prove the
pruned schema still runs the query to the same result.

Deliberate deviations (exprId tracking instead of SQL-string parsing):
- dropped columns vanish entirely instead of leaving skeletons (:1507-1532);
- alias names shadowing real columns do NOT over-include (:1680-1711);
- the upper-most descent passes THROUGH Sort/Join/Window/Generate (the
  reference stops at the first selection node of any kind, which
  skeletonizes a complex column projected as final output under an
  orderBy — r7 review, confirmed data loss);
- Intersect/Except/Deduplicate mark compared columns mandatory-full (the
  reference does not handle set ops at all; pruning a compared field
  changed result sets — r7 review).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from score_spark.schema_on_read import SchemaOnRead
from tests.fixtures_nested import SAMPLE_SCHEMA, write_fixtures


@pytest.fixture(scope="session")
def fx(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("nested_fixtures")
    return write_fixtures(spark, str(base))


@pytest.fixture(scope="session")
def sample(spark, fx):
    return spark.read.parquet(fx["sample_parquet"])


import os

os.environ.setdefault("SCORE_SPARK_SOR_RAISE", "1")


def gen(df):
    sor = SchemaOnRead.generate(df)
    assert sor.duration < 2.0  # driver-side only; BASELINE.md target <100ms after warmup
    return sor


def schema_of(df, fx, key="sample_parquet"):
    return gen(df).for_paths(fx[key])


def st(*fields):
    return T.StructType(list(fields))


def f(name, dtype, nullable=True):
    return T.StructField(name, dtype, nullable)


LONG = T.LongType()
STR = T.StringType()


def struct_field(*inner):
    return f("struct", st(*inner))


# ----------------------------------------------------------------- scans


def test_full_schema_passthrough_no_projection(spark, fx):
    # filter without projection → full schema (test :95-101)
    df = spark.read.parquet(fx["sample_parquet"]).filter(F.col("someLong") > 0)
    assert schema_of(df, fx) == SAMPLE_SCHEMA


def test_filter_only_query_runs_with_full_schema(spark, fx):
    df = spark.read.parquet(fx["sample_parquet"])
    sor = gen(df.filter(F.col("someBoolean")))
    pruned = sor.for_paths(fx["sample_parquet"])
    n = spark.read.schema(pruned).parquet(fx["sample_parquet"]).filter(F.col("someBoolean")).count()
    assert n == 2


# ------------------------------------------------------------- projection


def test_top_level_select(spark, fx):
    # (:144-190)
    df = spark.read.parquet(fx["sample_parquet"]).select("someStr")
    assert schema_of(df, fx) == st(f("someStr", STR))


def test_nested_select(spark, fx):
    df = spark.read.parquet(fx["sample_parquet"]).select("struct.col1")
    assert schema_of(df, fx) == st(struct_field(f("col1", LONG)))


def test_case_insensitive_resolution(spark, fx):
    # matched lower-cased, emitted source-cased (:192-215)
    df = spark.read.parquet(fx["sample_parquet"]).select("STRUCT.COL1")
    assert schema_of(df, fx) == st(struct_field(f("col1", LONG)))


def test_whole_struct_and_subfield_together(spark, fx):
    # SELECT s, s.f → full struct wins (:1570-1588)
    df = spark.read.parquet(fx["sample_parquet"]).select("struct", "struct.col1")
    assert schema_of(df, fx) == st(f("struct", SAMPLE_SCHEMA["struct"].dataType))


def test_drop_removes_entirely(spark, fx):
    # deviation from (:1507-1532): no skeletons for dropped cols
    df = spark.read.parquet(fx["sample_parquet"]).drop(
        "someStrArray", "someComplexArray", "nestedStruct", "someArrayOfArrays", "someArrayOfComplexArrays"
    )
    got = schema_of(df, fx)
    assert got.fieldNames() == ["someStr", "someLong", "someDouble", "someBoolean", "struct"]
    assert got["struct"].dataType == SAMPLE_SCHEMA["struct"].dataType  # upper-most → full


def test_alias_narrowing_through_subquery(spark, fx):
    # SELECT struct AS s ... then s.col1 → struct{col1} (:1535-1549, :685-705)
    df = spark.read.parquet(fx["sample_parquet"]).select(F.col("struct").alias("s")).select("s.col1")
    assert schema_of(df, fx) == st(struct_field(f("col1", LONG)))


def test_filter_on_column_not_in_select(spark, fx):
    # (:656-683): someStr only filtered → still read (primitive latch)
    df = spark.read.parquet(fx["sample_parquet"]).filter(F.col("someStr") == "bla").select("struct.col2")
    got = schema_of(df, fx)
    assert got == st(f("someStr", STR), struct_field(f("col2", LONG)))


def test_scalar_exprs_coalesce_if(spark, fx):
    # (:1277-1296)
    df = (
        spark.read.parquet(fx["sample_parquet"])
        .filter(F.coalesce(F.col("someLong"), F.lit(0)) > 0)
        .select(F.when(F.col("someBoolean"), F.col("struct.col1")).otherwise(F.col("struct.col2")).alias("x"))
    )
    assert schema_of(df, fx) == st(
        f("someLong", LONG), f("someBoolean", T.BooleanType()), struct_field(f("col1", LONG), f("col2", LONG))
    )


# ------------------------------------------------------------- aggregates


def test_group_by_with_sum(spark, fx):
    # (:707-733)
    df = spark.read.parquet(fx["sample_parquet"]).groupBy("someStr").agg(F.sum("someLong").alias("s"))
    assert schema_of(df, fx) == st(f("someStr", STR), f("someLong", LONG))


def test_group_by_whole_struct_mandatory_full(spark, fx):
    # grouping by struct keeps the FULL struct (:1592-1629)
    df = spark.read.parquet(fx["sample_parquet"]).groupBy("struct").agg(F.count(F.lit(1)).alias("c"))
    assert schema_of(df, fx) == st(f("struct", SAMPLE_SCHEMA["struct"].dataType))


def test_group_by_struct_part(spark, fx):
    # grouping by a struct PART prunes to it (:1631-1677)
    df = spark.read.parquet(fx["sample_parquet"]).groupBy("struct.col1").agg(F.count(F.lit(1)).alias("c"))
    assert schema_of(df, fx) == st(struct_field(f("col1", LONG)))


def test_agg_inside_subquery_outer_reprojection(spark, fx):
    # agg in CTE, outer re-projection (:834-861)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        """
        WITH base AS (SELECT someStr, sum(someLong) AS s, first(struct) AS fs FROM sample_v GROUP BY someStr)
        SELECT s FROM base
        """
    )
    got = schema_of(df, fx)
    # someStr (grouping, mandatory) + someLong (agg arg); struct only touched
    # in non-upper agg → skeleton
    assert got == st(f("someStr", STR), f("someLong", LONG), f("struct", st()))


def test_conditional_agg_sum_if(spark, fx):
    # sum(if(cond, x, 0)) (:863-892)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT someStr, sum(if(someBoolean, someLong, 0)) AS s FROM sample_v GROUP BY someStr"
    )
    assert schema_of(df, fx) == st(f("someStr", STR), f("someLong", LONG), f("someBoolean", T.BooleanType()))


# ---------------------------------------------------------------- windows


def test_window_inline(spark, fx):
    # FIRST(...) OVER (PARTITION BY ... ORDER BY ...) (:1105-1124)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT first(struct.col1) OVER (PARTITION BY someStr ORDER BY someLong) AS fv FROM sample_v"
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR), f("someLong", LONG), struct_field(f("col1", LONG))
    )


def test_window_complex_partition_key_mandatory_full(spark, fx):
    # complex partition key → full subtree (:361-403)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT first(someLong) OVER (PARTITION BY someComplexArray ORDER BY someStr) AS fv FROM sample_v"
    )
    got = schema_of(df, fx)
    assert got == st(
        f("someStr", STR),
        f("someLong", LONG),
        f("someComplexArray", SAMPLE_SCHEMA["someComplexArray"].dataType),
    )


# ------------------------------------------------------------------- sorts


def test_order_by_complex_in_subquery_mandatory_full(spark, fx):
    # ORDER BY complex column → full struct (:405-424)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT someStr FROM (SELECT someStr, struct FROM sample_v ORDER BY struct) t")
    got = schema_of(df, fx)
    assert got == st(f("someStr", STR), f("struct", SAMPLE_SCHEMA["struct"].dataType))


# ------------------------------------------------------------------- joins


def test_self_join_merges_into_one_relation(spark, fx):
    # self-join with aliases: one path-set, merged trie (:894-918)
    a = spark.read.parquet(fx["sample_parquet"]).alias("a")
    b = spark.read.parquet(fx["sample_parquet"]).alias("b")
    df = a.join(b, F.col("a.someLong") == F.col("b.someLong")).select(
        F.col("a.someStr"), F.col("b.struct.col1")
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR), f("someLong", LONG), struct_field(f("col1", LONG))
    )


def test_join_cross_source_per_source_schemas(spark, fx):
    # parquet ⋈ json with per-source pruning (:1246-1275)
    pq = spark.read.parquet(fx["sample_parquet"])
    js = spark.read.option("multiline", True).json(fx["sample_json"])
    df = pq.join(js, pq.someLong == js.someLong).select(pq.someStr, js["struct.col2"])
    sor = gen(df)
    assert sor.for_paths(fx["sample_parquet"]) == st(f("someStr", STR), f("someLong", LONG))
    js_schema = sor.for_paths(fx["sample_json"])
    assert [fl.name for fl in js_schema] == ["someLong", "struct"]
    assert js_schema["struct"].dataType.fieldNames() == ["col2"]


def test_broadcast_join_hint(spark, fx):
    # F.broadcast both forms (:1042-1102); ResolvedHint is a passthrough
    a = spark.read.parquet(fx["sample_parquet"])
    b = F.broadcast(spark.read.parquet(fx["sample_parquet"]))
    df = a.join(b, a.someLong == b.someLong).select(a.someStr)
    assert schema_of(df, fx) == st(f("someStr", STR), f("someLong", LONG))


# ---------------------------------------------------------------- explodes


def test_lateral_view_explode_string_array(spark, fx):
    # (:274-286)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT item FROM sample_v LATERAL VIEW EXPLODE(someStrArray) t AS item")
    assert schema_of(df, fx) == st(f("someStrArray", T.ArrayType(STR)))


def test_explode_array_of_struct_field_access(spark, fx):
    # explode then item.col1 → arr{col1} (:302-318)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT item.col1 FROM sample_v LATERAL VIEW EXPLODE(someComplexArray) t AS item")
    assert schema_of(df, fx) == st(
        f("someComplexArray", T.ArrayType(st(f("col1", LONG))))
    )


def test_posexplode_value_attr_is_last(spark, fx):
    # (:288-300)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT pos, item.col2 FROM sample_v LATERAL VIEW POSEXPLODE(someComplexArray) t AS pos, item"
    )
    assert schema_of(df, fx) == st(
        f("someComplexArray", T.ArrayType(st(f("col2", LONG))))
    )


def test_explode_nested_subarray(spark, fx):
    # explode(struct.subArray) (:606-627)
    df = spark.read.parquet(fx["sample_parquet"]).select(
        F.explode(F.col("struct.subArray")).alias("x")
    )
    assert schema_of(df, fx) == st(struct_field(f("subArray", T.ArrayType(LONG))))


def test_chained_explodes(spark, fx):
    # explode array-of-struct, then explode its inner array (:449-472)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        """
        SELECT inner_item FROM sample_v
        LATERAL VIEW EXPLODE(someArrayOfComplexArrays) t1 AS item
        LATERAL VIEW EXPLODE(item.col2) t2 AS inner_item
        """
    )
    assert schema_of(df, fx) == st(
        f("someArrayOfComplexArrays", T.ArrayType(st(f("col2", T.ArrayType(LONG)))))
    )


def test_array_index_struct_field(spark, fx):
    # arr[0].field — index never narrows, path does (:510-543, :217-254)
    df = spark.read.parquet(fx["sample_parquet"]).select(F.col("someComplexArray")[0]["col1"].alias("v"))
    assert schema_of(df, fx) == st(f("someComplexArray", T.ArrayType(st(f("col1", LONG)))))


def test_get_function_index_struct_field(spark, fx):
    # F.get(arr, 0).field — the NULL-on-out-of-bounds sibling of arr[0]
    # analyzes to a `Get` head, not GetArrayItem; r8's plan fuzz caught the
    # walker dropping the someComplexArray dependency entirely (unresolved
    # column on pruned re-read). Same strip-the-index semantics as [0].
    df = spark.read.parquet(fx["sample_parquet"]).select(
        F.get("someComplexArray", 0)["col1"].alias("v")
    )
    assert schema_of(df, fx) == st(f("someComplexArray", T.ArrayType(st(f("col1", LONG)))))


def test_filter_field_through_array(spark, fx):
    # predicate over arr.col2 (:1400-1454)
    df = (
        spark.read.parquet(fx["sample_parquet"])
        .filter(F.col("someComplexArray.col2").isNotNull())
        .select("someStr")
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR), f("someComplexArray", T.ArrayType(st(f("col2", LONG))))
    )


# -------------------------------------------------------------------- maps


def test_map_value_pruning_keys_never_pruned(spark, fx):
    # mapOfArray['someKey'][0].val1 in SELECT and WHERE → value struct pruned
    # to val1; keys stay (:1298-1332)
    df = (
        spark.read.parquet(fx["crazy_parquet"])
        .filter(F.col("mapOfArray")["someKey"][0]["val1"].isNotNull())
        .select(F.col("mapOfArray")["someKey"][0]["val1"].alias("v"))
    )
    got = gen(df).for_paths(fx["crazy_parquet"])
    assert got == st(
        f(
            "mapOfArray",
            T.MapType(STR, T.ArrayType(st(f("val1", STR)))),
        )
    )


# ------------------------------------------------------------------ unions


def test_union_per_branch_pruning(spark, fx):
    # union over two files: requirements reach BOTH branches (:559-603)
    pq = spark.read.parquet(fx["sample_parquet"]).select("someStr", "struct")
    js = spark.read.option("multiline", True).json(fx["sample_json"]).select("someStr", "struct")
    df = pq.unionAll(js).select("struct.col3")
    sor = gen(df)
    got_pq = sor.for_paths(fx["sample_parquet"])
    assert [fl.name for fl in got_pq] == ["someStr", "struct"]
    assert got_pq["struct"].dataType.fieldNames() == ["col3"]
    got_js = sor.for_paths(fx["sample_json"])
    assert got_js["struct"].dataType.fieldNames() == ["col3"]


def test_union_branch_local_touch_mirrors_to_other_branch(spark, fx):
    # r8 fuzz find: a filter INSIDE one branch touches struct.col1; the other
    # branch projects the same struct untouched. Without cross-branch
    # reconciliation the pruned re-read unions STRUCT<col1> against skeleton
    # STRUCT<> and fails analysis. Branch-local requirements must mirror to
    # every linked branch (the reference merges per-branch results at set-ops,
    # TreeNodeProcessingRegistry.java:108-115).
    pq = spark.read.parquet(fx["sample_parquet"]).select(
        F.col("struct").alias("whole_struct"), "someStr"
    )
    js = (
        spark.read.option("multiline", True)
        .json(fx["sample_json"])
        .filter(F.col("struct.col1").isNotNull())
        .select(F.col("struct").alias("whole_struct"), "someStr")
    )
    df = pq.unionAll(js).groupBy("someStr").agg(F.count(F.lit(1)).alias("n"))
    sor = gen(df)
    got_pq = sor.for_paths(fx["sample_parquet"])
    got_js = sor.for_paths(fx["sample_json"])
    # both branches carry the filter's col1 so the union stays type-compatible
    assert got_pq["struct"].dataType.fieldNames() == ["col1"]
    assert got_js["struct"].dataType.fieldNames() == ["col1"]
    # and the pruned re-read actually analyzes + returns the same rows
    full = sorted(map(tuple, df.collect()))
    pruned = (
        spark.read.schema(got_pq)
        .parquet(fx["sample_parquet"])
        .select(F.col("struct").alias("whole_struct"), "someStr")
        .unionAll(
            spark.read.schema(got_js)
            .option("multiline", True)
            .json(fx["sample_json"])
            .filter(F.col("struct.col1").isNotNull())
            .select(F.col("struct").alias("whole_struct"), "someStr")
        )
        .groupBy("someStr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, pruned.collect())) == full


# ---------------------------------------------------- other source handling


def test_local_relation_ignored(spark, fx):
    # createDataFrame sources are never pruned (:977-1001)
    local = spark.createDataFrame([("bla",)], ["someString"])
    pq = spark.read.parquet(fx["sample_parquet"])
    df = pq.join(local, pq.someStr == local.someString).select("someLong")
    sor = gen(df)
    assert sor.for_paths(fx["sample_parquet"]) == st(
        f("someStr", STR), f("someLong", LONG), f("someString", STR)
    ) or sor.for_paths(fx["sample_parquet"]).fieldNames() == ["someStr", "someLong"]
    assert len(sor.relations) == 1


def test_partitioned_directory(spark, fx):
    # partition col lives in the dir name; survives pruning when selected
    # (:1490-1505)
    df = spark.read.parquet(fx["partitioned"]).select("someLong", "struct.col1")
    sor = gen(df)
    got = sor.for_paths(fx["partitioned"])
    names = got.fieldNames()
    assert set(names) == {"someLong", "struct"}
    assert got["struct"].dataType.fieldNames() == ["col1"]


def test_cached_dataset_still_traced(spark, fx):
    # (:1162-1188): analyzed plan keeps the source under .cache()
    df = spark.read.parquet(fx["sample_parquet"]).cache()
    try:
        q = df.select("struct.col1")
        assert schema_of(q, fx) == st(struct_field(f("col1", LONG)))
    finally:
        df.unpersist()


def test_udf_arguments_tracked(spark, fx):
    # registered UDF's argument columns still tracked (:546-557)
    spark.udf.register("my_concat", lambda a, b: f"{a}-{b}")
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT my_concat(someStr, struct.col1) AS c FROM sample_v")
    assert schema_of(df, fx) == st(f("someStr", STR), struct_field(f("col1", LONG)))


def test_for_view_api(spark, fx):
    # getSchemaOnReadByAlias analog (SchemaOnReadGenerator.java:79-85)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT someStr FROM sample_v")
    sor = gen(df)
    assert sor.for_view("sample_v") == st(f("someStr", STR))


def test_generate_never_raises(spark):
    # best-effort contract (README.md:9)
    df = spark.range(10).selectExpr("id * 2 AS x")
    sor = SchemaOnRead.generate(df)
    assert sor.relations == []


# ----------------------------------------- pruned-schema equivalence (e2e)


@pytest.mark.parametrize(
    "build",
    [
        lambda d: d.select("struct.col1", "someStr"),
        lambda d: d.groupBy("someStr").agg(F.sum("someLong").alias("s")),
        lambda d: d.filter(F.col("someComplexArray.col2").isNotNull()).select("nestedStruct.childStruct.col1"),
        lambda d: d.select(F.explode("someComplexArray").alias("i")).select("i.col2"),
    ],
    ids=["nested-select", "agg", "filter-through-array", "explode"],
)
def test_pruned_rerun_equals_full_run(spark, fx, build):
    # the reference's executeQueryWithSchema does-it-still-run check
    # (:1714-1717), strengthened to full result equality
    full_df = build(spark.read.parquet(fx["sample_parquet"]))
    sor = gen(full_df)
    pruned_schema = sor.for_paths(fx["sample_parquet"])
    pruned_df = build(spark.read.schema(pruned_schema).parquet(fx["sample_parquet"]))
    assert sorted(map(str, full_df.collect())) == sorted(map(str, pruned_df.collect()))


def test_group_by_ordinal_and_expression(spark, fx):
    # GROUP BY 1 + expression (:707-733)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT someStr, sum(someLong + struct.col1) AS s FROM sample_v GROUP BY 1")
    assert schema_of(df, fx) == st(
        f("someStr", STR), f("someLong", LONG), struct_field(f("col1", LONG))
    )


def test_count_star_count_one_order_by_ordinal(spark, fx):
    # count(1)/count(*)/count(col) + ORDER BY ordinal (:736-803)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT someStr, count(1) AS c1, count(*) AS cs, count(someDouble) AS cd"
        " FROM sample_v GROUP BY someStr ORDER BY 2"
    )
    assert schema_of(df, fx) == st(f("someStr", STR), f("someDouble", T.DoubleType()))


def test_grouping_keys_absent_from_select(spark, fx):
    # grouping key not projected still read (:806-832)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT sum(someLong) AS s FROM sample_v GROUP BY someStr")
    assert schema_of(df, fx) == st(f("someStr", STR), f("someLong", LONG))


def test_order_by_aggregated_alias(spark, fx):
    # ORDER BY the aggregate's alias (:426-446)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT someStr, sum(someLong) AS total FROM sample_v GROUP BY someStr ORDER BY total")
    assert schema_of(df, fx) == st(f("someStr", STR), f("someLong", LONG))


def test_first_complex_then_explode_of_agg_output(spark, fx):
    # FIRST(complex array) in a CTE, outer LATERAL VIEW over it (:320-337)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        """
        WITH agged AS (SELECT someStr, first(someComplexArray) AS arr FROM sample_v GROUP BY someStr)
        SELECT someStr, item.col1 FROM agged LATERAL VIEW EXPLODE(arr) t AS item
        """
    )
    got = schema_of(df, fx)
    assert got.fieldNames() == ["someStr", "someComplexArray"]
    # first()'s argument is an agg expr (conditional) narrowed by the
    # downstream item.col1 access
    assert got["someComplexArray"].dataType == T.ArrayType(st(f("col1", LONG)))


def test_named_window_clause(spark, fx):
    # WINDOW w AS (...) (:339-359)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT first(struct.col2) OVER w AS fv FROM sample_v"
        " WINDOW w AS (PARTITION BY someStr ORDER BY someLong)"
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR), f("someLong", LONG), struct_field(f("col2", LONG))
    )


def test_window_frame_first_last_value(spark, fx):
    # FIRST_VALUE/LAST_VALUE + ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
    # (:1126-1159)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        """
        SELECT first_value(struct.col1) OVER (PARTITION BY someStr ORDER BY someLong
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fv,
               last_value(someDouble) OVER (PARTITION BY someStr ORDER BY someLong
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS lv
        FROM sample_v
        """
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR),
        f("someLong", LONG),
        f("someDouble", T.DoubleType()),
        struct_field(f("col1", LONG)),
    )


def test_sql_equi_join_two_views_same_file(spark, fx):
    # two views over the same file merge into one relation (:920-946)
    base = spark.read.parquet(fx["sample_parquet"])
    base.createOrReplaceTempView("j_a")
    base.createOrReplaceTempView("j_b")
    df = spark.sql(
        "SELECT j_a.someStr, j_b.struct.col3 FROM j_a JOIN j_b ON j_a.someLong = j_b.someLong"
    )
    sor = gen(df)
    assert len(sor.relations) == 1
    assert sor.for_paths(fx["sample_parquet"]) == st(
        f("someStr", STR), f("someLong", LONG), struct_field(f("col3", LONG))
    )


def test_implicit_comma_join_with_where(spark, fx):
    # implicit join + WHERE as the join condition (:948-974)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("j_a")
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("j_b")
    df = spark.sql(
        "SELECT j_a.someStr FROM j_a, j_b WHERE j_a.someLong = j_b.someLong"
    )
    assert schema_of(df, fx) == st(f("someStr", STR), f("someLong", LONG))


def test_api_join_using_column(spark, fx):
    # df.join(other, "col") USING form, pre-projected sides (:1017-1040)
    a = spark.read.parquet(fx["sample_parquet"])
    b = spark.read.parquet(fx["sample_parquet"])
    df = (
        a.select("someLong", "someStr")
        .join(b.select(b["someLong"], b["struct.col3"]), "someLong")
        .select("someLong", "someStr", "col3")
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR), f("someLong", LONG), struct_field(f("col3", LONG))
    )


def test_right_join_lateral_views_both_branches(spark, fx):
    # RIGHT JOIN with a lateral view on each branch (:474-508)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        """
        SELECT l.item_a.col1, r.item_b
        FROM (SELECT someLong, item_a FROM sample_v
              LATERAL VIEW EXPLODE(someComplexArray) t AS item_a) l
        RIGHT JOIN (SELECT someLong, item_b FROM sample_v
              LATERAL VIEW EXPLODE(someStrArray) t AS item_b) r
        ON l.someLong = r.someLong
        """
    )
    got = schema_of(df, fx)
    assert set(got.fieldNames()) == {"someLong", "someComplexArray", "someStrArray"}
    assert got["someComplexArray"].dataType == T.ArrayType(st(f("col1", LONG)))
    assert got["someStrArray"].dataType == T.ArrayType(STR)


def test_double_explode_two_fields_of_exploded_struct(spark, fx):
    # two lateral views + two fields of the exploded struct (:1456-1487)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        """
        SELECT s_item, c_item.col1, c_item.col2 FROM sample_v
        LATERAL VIEW EXPLODE(someStrArray) t1 AS s_item
        LATERAL VIEW EXPLODE(someComplexArray) t2 AS c_item
        """
    )
    got = schema_of(df, fx)
    assert set(got.fieldNames()) == {"someStrArray", "someComplexArray"}
    assert got["someComplexArray"].dataType == T.ArrayType(st(f("col1", LONG), f("col2", LONG)))


def test_array_of_arrays_index(spark, fx):
    # arr[0][2]: indexes never narrow, the path does (:528-543)
    df = spark.read.parquet(fx["sample_parquet"]).select(F.col("someArrayOfArrays")[0][2].alias("v"))
    assert schema_of(df, fx) == st(f("someArrayOfArrays", T.ArrayType(T.ArrayType(LONG))))


def test_wildcard_json_multipath_identity(spark, fx, tmp_path):
    # sample*.json glob resolves to the concrete file set (:1192-1205)
    js = spark.read.option("multiline", True).json(
        fx["sample_json"].rsplit("/", 1)[0] + "/sample*.json"
    )
    df = js.select("someStr")
    sor = gen(df)
    # lookup by the resolved concrete path must hit the same relation
    assert sor.for_paths(fx["sample_json"]) == st(f("someStr", STR))


def test_multi_file_unordered_duplicate_path_identity(spark, fx):
    # path list identity: unordered + duplicates → same sorted-set ref
    # (:1208-1244)
    df = spark.read.parquet(fx["sample_parquet"]).select("someStr")
    sor = gen(df)
    assert sor.for_paths(fx["sample_parquet"], fx["sample_parquet"]) == st(f("someStr", STR))


def test_explicit_user_schema_on_read(spark, fx):
    # a read that already has a user schema is still tracked/narrowed
    # (:1299-1311)
    user_schema = st(f("someStr", STR), struct_field(f("col1", LONG), f("col2", LONG)))
    df = spark.read.schema(user_schema).parquet(fx["sample_parquet"]).select("struct.col2")
    assert schema_of(df, fx) == st(struct_field(f("col2", LONG)))


def test_filter_is_null_or_less_than(spark, fx):
    # IS NULL / OR / < (:1277-1296)
    df = (
        spark.read.parquet(fx["sample_parquet"])
        .filter(F.col("struct.col3").isNull() | (F.col("someDouble") < 5.0))
        .select("someStr")
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR), f("someDouble", T.DoubleType()), struct_field(f("col3", LONG))
    )


def test_union_sql_view_form(spark, fx):
    # SQL UNION ALL over two views of different files (:559-603)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("u_pq")
    spark.read.option("multiline", True).json(fx["sample_json"]).createOrReplaceTempView("u_js")
    df = spark.sql(
        "SELECT struct.col2 FROM u_pq UNION ALL SELECT struct.col2 FROM u_js"
    )
    sor = gen(df)
    assert sor.for_paths(fx["sample_parquet"]) == st(struct_field(f("col2", LONG)))
    assert sor.for_paths(fx["sample_json"])["struct"].dataType.fieldNames() == ["col2"]


def test_json_multiline_pruned_read(spark, fx):
    # JSON is where read-schema pruning pays (SchemaPruning is file-format
    # gated; SURVEY §4): narrower schema → cheaper parse, same rows
    js = spark.read.option("multiline", True).json(fx["sample_json"])
    q = js.select("struct.col1", "someStr")
    sor = gen(q)
    pruned = sor.for_paths(fx["sample_json"])
    assert pruned["struct"].dataType.fieldNames() == ["col1"]
    re_read = spark.read.schema(pruned).option("multiline", True).json(fx["sample_json"])
    assert sorted(map(str, re_read.select("struct.col1", "someStr").collect())) == sorted(
        map(str, q.collect())
    )


# ---------------------------------------------- r2 ports: remaining goldens


def test_full_schema_with_subquery_view(spark, fx):
    # filter in a view + outer narrow select (:104-113)
    spark.read.parquet(fx["sample_parquet"]).filter("someLong = 5").createOrReplaceTempView(
        "filtered_v"
    )
    df = spark.sql("SELECT someStr FROM filtered_v")
    assert schema_of(df, fx) == st(f("someStr", STR), f("someLong", LONG))


def test_full_schema_with_subquery_no_alias(spark, fx):
    # API chain select -> filter -> select (:115-124)
    df = (
        spark.read.parquet(fx["sample_parquet"])
        .select("someLong", "someStr")
        .filter("someLong = 5")
        .select("someStr")
    )
    # emission follows source-schema field order
    assert schema_of(df, fx) == st(f("someStr", STR), f("someLong", LONG))


def test_sql_broadcast_hint_form(spark, fx):
    # /*+ BROADCAST(b) */ SQL hint: two views over the same file merge into
    # one relation; hint node is a passthrough (:1042-1070)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v2")
    q = (
        "SELECT /*+ BROADCAST(b) */ a.someLong, a.someStr, b.struct.col1 "
        "FROM sample_v a JOIN sample_v2 b ON a.someLong = b.someLong"
    )
    df = spark.sql(q)
    sor = gen(df)
    expected = st(f("someStr", STR), f("someLong", LONG), struct_field(f("col1", LONG)))
    assert sor.for_paths(fx["sample_parquet"]) == expected
    assert sor.for_view("sample_v") == expected
    assert sor.for_view("sample_v2") == expected
    # re-execution with the pruned schema still answers the query (:1714-1717)
    spark.read.schema(expected).parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    spark.read.schema(expected).parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v2")
    assert spark.sql(q).count() == 2


def test_alias_name_like_existing_column_exprid_exact(spark, fx):
    # DELIBERATE DEVIATION from (:1680-1711): the reference's SQL-string
    # parser can't tell alias `struct` from the real `struct` column and
    # over-includes BOTH; exprId tracking includes only what the query reads.
    # This test pins the improved behaviour AND proves the pruned re-read
    # still answers the query (the regression the deviation must not cause).
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    q = "SELECT nestedStruct AS struct FROM sample_v"
    df = spark.sql(q)
    got = schema_of(df, fx)
    assert got == st(f("nestedStruct", SAMPLE_SCHEMA["nestedStruct"].dataType))
    assert "struct" not in got.fieldNames()
    spark.read.schema(got).parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    full_rows = sorted(map(str, spark.sql(q).collect()))
    assert len(full_rows) == 2


def test_window_complex_order_key_mandatory_full(spark, fx):
    # ORDER BY complex inside a window spec -> full subtree (:386-403)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "WITH base AS (SELECT first(someStr) OVER w AS s FROM sample_v "
        "WINDOW w AS (PARTITION BY someStr ORDER BY someComplexArray DESC)) "
        "SELECT s FROM base"
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR),
        f("someComplexArray", SAMPLE_SCHEMA["someComplexArray"].dataType),
    )


def test_aggregate_with_order_on_complex_alias(spark, fx):
    # ORDER BY an aggregated alias of a complex column -> mandatory-full
    # through the alias chain (:426-446)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "WITH base AS (SELECT someStr, first(someComplexArray) AS cmplx FROM sample_v "
        "GROUP BY 1 ORDER BY cmplx) SELECT someStr FROM base"
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR),
        f("someComplexArray", SAMPLE_SCHEMA["someComplexArray"].dataType),
    )


def test_struct_aggregation_over_window_subquery(spark, fx):
    # FIRST(complex) OVER w in a CTE, outer FIRST(alias) at the upper-most
    # aggregate -> full complex subtree via the exprId chain (:339-359)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "WITH base AS (SELECT someStr, first(someComplexArray) OVER w AS complexArray "
        "FROM sample_v WINDOW w AS (PARTITION BY someStr ORDER BY someStr DESC)) "
        "SELECT first(complexArray) AS myArray FROM base GROUP BY someStr"
    )
    assert schema_of(df, fx) == st(
        f("someStr", STR),
        f("someComplexArray", SAMPLE_SCHEMA["someComplexArray"].dataType),
    )


@pytest.fixture(scope="session")
def crazy_window_fx(spark, tmp_path_factory):
    """Fixture shaped like the reference's crazy-sample for the
    veryComplexWindow case (:1126-1159): struct carries a `condition` bool
    plus a subArray that the query never touches (so pruning is visible)."""
    schema = st(
        f("someStr", STR),
        f("someBoolean", T.BooleanType()),
        f("someDouble", T.DoubleType()),
        f("someLong", LONG),
        f(
            "struct",
            st(
                f("col1", LONG),
                f("col2", LONG),
                f("col3", LONG),
                f("condition", T.BooleanType()),
                f("subArray", T.ArrayType(LONG)),
            ),
        ),
    )
    rows = [
        ("a", True, 1.5, 1, (10, 20, 30, True, [1, 2])),
        ("b", True, 2.5, 2, (11, 21, 31, True, [3])),
    ]
    path = str(tmp_path_factory.mktemp("crazy_window") / "crazy.parquet")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_very_complex_window_lacking_window_columns_from_project(spark, crazy_window_fx):
    # window partition/order cols absent from SELECT; filter over nested
    # bool; FIRST_VALUE/LAST_VALUE with a frame (:1126-1159)
    spark.read.parquet(crazy_window_fx).createOrReplaceTempView("crazy_v")
    q = (
        "SELECT someLong, struct.col1 AS col1, "
        "FIRST_VALUE(struct.col3) OVER w AS firstCol3, "
        "LAST_VALUE(struct.col2) OVER w AS lastCol2 "
        "FROM crazy_v WHERE someBoolean = true AND struct.condition = true "
        "WINDOW w AS (PARTITION BY someStr, someDouble "
        "ORDER BY struct.col1 ASC ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    df = spark.sql(q)
    got = gen(df).for_paths(crazy_window_fx)
    assert got == st(
        f("someStr", STR),
        f("someBoolean", T.BooleanType()),
        f("someDouble", T.DoubleType()),
        f("someLong", LONG),
        f(
            "struct",
            st(f("col1", LONG), f("col2", LONG), f("col3", LONG), f("condition", T.BooleanType())),
        ),
    )
    spark.read.schema(got).parquet(crazy_window_fx).createOrReplaceTempView("crazy_v")
    assert spark.sql(q).count() == 2


def test_multiple_sources_join_sql_views(spark, fx):
    # SQL join of a parquet view and a json view — per-source pruned schemas
    # (:1246-1275)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("pq_v")
    spark.read.option("multiline", True).json(fx["sample_json"]).createOrReplaceTempView("js_v")
    df = spark.sql(
        "SELECT a.someLong, a.someStr, b.struct.col3 FROM pq_v a JOIN js_v b ON a.someLong = b.someLong"
    )
    sor = gen(df)
    assert sor.for_paths(fx["sample_parquet"]) == st(f("someStr", STR), f("someLong", LONG))
    js = sor.for_paths(fx["sample_json"])
    assert [fl.name for fl in js] == ["someLong", "struct"]
    assert js["struct"].dataType.fieldNames() == ["col3"]


def test_group_struct_part_by_full_struct_sql(spark, fx):
    # first(nestedStruct.str) GROUP BY nestedStruct: grouping mandatory-full
    # (:1592-1610)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT first(nestedStruct.str) FROM sample_v GROUP BY nestedStruct")
    assert schema_of(df, fx) == st(f("nestedStruct", SAMPLE_SCHEMA["nestedStruct"].dataType))


def test_group_full_struct_by_struct_part_sql(spark, fx):
    # first(nestedStruct) GROUP BY nestedStruct.str: agg expr at upper-most
    # -> full struct; grouping leaf adds nothing extra (:1612-1629)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql("SELECT first(nestedStruct) FROM sample_v GROUP BY nestedStruct.str")
    assert schema_of(df, fx) == st(f("nestedStruct", SAMPLE_SCHEMA["nestedStruct"].dataType))


def test_group_struct_part_by_full_struct_subquery(spark, fx):
    # same, through a view + outer narrow re-projection (:1632-1653)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    spark.sql(
        "SELECT first(nestedStruct.str) AS str FROM sample_v GROUP BY nestedStruct"
    ).createOrReplaceTempView("base_v")
    df = spark.sql("SELECT str FROM base_v")
    assert schema_of(df, fx) == st(f("nestedStruct", SAMPLE_SCHEMA["nestedStruct"].dataType))


def test_group_full_struct_by_struct_part_subquery(spark, fx):
    # outer narrows into the aggregated struct alias: childStruct.col1 +
    # grouping leaf str (:1656-1677)
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    spark.sql(
        "SELECT first(nestedStruct) AS mystruct FROM sample_v GROUP BY nestedStruct.str"
    ).createOrReplaceTempView("base_v")
    df = spark.sql("SELECT mystruct.childStruct.col1 FROM base_v")
    got = schema_of(df, fx)
    assert [fl.name for fl in got] == ["nestedStruct"]
    inner = got["nestedStruct"].dataType
    assert set(inner.fieldNames()) == {"childStruct", "str"}
    assert inner["childStruct"].dataType.fieldNames() == ["col1"]


# --------------------------------- r2: Intersect / Except / Expand goldens


def test_intersect_links_both_branches(spark, fx):
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT someStr, struct.col1 AS c FROM sample_v "
        "INTERSECT SELECT someStr, struct.col2 AS c FROM sample_v"
    )
    got = schema_of(df, fx)
    assert got == st(f("someStr", STR), struct_field(f("col1", LONG), f("col2", LONG)))


def test_except_links_both_branches(spark, fx):
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT struct.col1 AS c FROM sample_v "
        "EXCEPT SELECT struct.col3 AS c FROM sample_v"
    )
    got = schema_of(df, fx)
    assert got == st(struct_field(f("col1", LONG), f("col3", LONG)))


def test_expand_rollup_grouping_paths(spark, fx):
    # ROLLUP -> Expand node. Catalyst's rollup analysis inserts an
    # all-columns passthrough Project under Expand, and under reference
    # "touch" semantics (conditional columns of a non-upper-most Project:
    # primitives latch, complex stay prunable — SchemaElementImpl.java:46-51)
    # that keeps every primitive and skeletons for untouched complex types.
    # What the Expand handler itself must guarantee: the grouping paths
    # (someStr, struct.col1) narrow `struct` to col1 through the positional
    # projection links — pinned here.
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    df = spark.sql(
        "SELECT someStr, struct.col1 AS c, count(1) AS n FROM sample_v "
        "GROUP BY ROLLUP(someStr, struct.col1)"
    )
    got = schema_of(df, fx)
    assert "someStr" in got.fieldNames()
    assert got["struct"].dataType.fieldNames() == ["col1"]  # narrowed, not full
    assert got["nestedStruct"].dataType.fieldNames() == []  # skeleton, not full


def test_expand_cube_runs_with_pruned_schema(spark, fx):
    spark.read.parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    q = (
        "SELECT someStr, nestedStruct.str AS s2, count(1) AS n FROM sample_v "
        "GROUP BY CUBE(someStr, nestedStruct.str)"
    )
    full_rows = sorted(map(str, spark.sql(q).collect()))
    got = gen(spark.sql(q)).for_paths(fx["sample_parquet"])
    assert got["nestedStruct"].dataType.fieldNames() == ["str"]  # narrowed
    spark.read.schema(got).parquet(fx["sample_parquet"]).createOrReplaceTempView("sample_v")
    assert sorted(map(str, spark.sql(q).collect())) == full_rows


# ------------------------------------- r2: CSV / ORC scan coverage (stock)


def test_orc_scan_pruning(spark, tmp_path_factory):
    """ORC rides the same HadoopFsRelation path the reference matches
    (TreeNodeProcessingRegistry.java:25-30) — nested pruning included."""
    path = str(tmp_path_factory.mktemp("orc") / "sample.orc")
    spark.createDataFrame(
        [("a", 1, (10, 20)), ("b", 2, (30, 40))],
        st(f("s", STR), f("n", LONG), f("inner", st(f("x", LONG), f("y", LONG)))),
    ).coalesce(1).write.mode("overwrite").orc(path)
    df = spark.read.orc(path).select("s", "inner.x")
    got = gen(df).for_paths(path)
    assert got == st(f("s", STR), f("inner", st(f("x", LONG))))
    rows = spark.read.schema(got).orc(path).select("s", "inner.x").collect()
    assert sorted((r.s, r.x) for r in rows) == [("a", 10), ("b", 30)]


def test_csv_scan_pruning(spark, tmp_path_factory):
    """CSV is flat; top-level column pruning still applies and the pruned
    re-read must resolve by header name."""
    path = str(tmp_path_factory.mktemp("csv") / "sample.csv")
    spark.createDataFrame(
        [("a", 1, 1.5), ("b", 2, 2.5)], st(f("s", STR), f("n", LONG), f("d", T.DoubleType()))
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    df = spark.read.option("header", True).csv(path).select("s", "n")
    got = gen(df).for_paths(path)
    assert [fl.name for fl in got] == ["s", "n"]
    rows = (
        spark.read.schema(got).option("header", True).csv(path).collect()
    )
    assert sorted((r.s, r.n) for r in rows) == [("a", "1"), ("b", "2")]


def test_avro_scan_pruning(spark, tmp_path_factory):
    """Avro rides the same HadoopFsRelation path as ORC/parquet
    (TreeNodeProcessingRegistry.java:25-30), so the analyzer needs no
    format-specific code. The upstream spark-avro module is external and
    this container has no network to fetch it (r4/r5 asks), so r6 built a
    minimal Avro FileFormat from the public extension APIs + the Avro libs
    that ship in Spark's own jars/ (vendor/avro-src, compiled by
    vendor/build_avro_jar.sh, auto-loaded by session.get_session) — the
    golden now EXECUTES here; the env-skip remains only for sessions
    launched without the vendored jar."""
    import pytest

    path = str(tmp_path_factory.mktemp("avro") / "sample.avro")
    try:
        spark.createDataFrame(
            [("a", 1, (10, 20)), ("b", 2, (30, 40))],
            st(f("s", STR), f("n", LONG), f("inner", st(f("x", LONG), f("y", LONG)))),
        ).coalesce(1).write.mode("overwrite").format("avro").save(path)
    except Exception as e:
        if "Failed to find data source: avro" in str(e):
            pytest.skip("spark-avro external module not deployed in this env")
        raise
    df = spark.read.format("avro").load(path).select("s", "inner.x")
    got = gen(df).for_paths(path)
    assert got == st(f("s", STR), f("inner", st(f("x", LONG))))
    rows = spark.read.schema(got).format("avro").load(path).select("s", "inner.x").collect()
    assert sorted((r.s, r.x) for r in rows) == [("a", 10), ("b", 30)]


# ------------------------- review r7: final-output preservation + set ops


def test_complex_final_output_under_orderby_stays_full(spark, fx):
    """Sort passes its child's columns through to the FINAL output, so the
    Project below an orderBy is still upper-most: its complex columns must
    keep their full subtree. The reference stops the upper-most descent at
    the first selection node of any kind, which skeletonized `struct` here
    (silent data loss on the pruned re-read) — deliberate deviation,
    confirmed-by-execution review r7 finding."""
    df = spark.read.parquet(fx["sample_parquet"]).select("struct", "someLong").orderBy("someLong")
    sor = gen(df)
    pruned = sor.for_paths(fx["sample_parquet"])
    sf = {f.name: f for f in pruned.fields}["struct"]
    full = {f.name: f for f in SAMPLE_SCHEMA.fields}["struct"]
    assert sf.dataType == full.dataType, sf.dataType
    # and the pruned re-read answers identically
    back = spark.read.schema(pruned).parquet(fx["sample_parquet"]).select("struct", "someLong").orderBy("someLong")
    assert [r.asDict(True) for r in back.collect()] == [r.asDict(True) for r in df.collect()]


def test_complex_final_output_under_window_and_join_stays_full(spark, fx):
    w_df = (
        spark.read.parquet(fx["sample_parquet"])
        .select("struct", "someLong")
        .withColumn("rk", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("someLong")))
    )
    pruned = gen(w_df).for_paths(fx["sample_parquet"])
    full = {f.name: f for f in SAMPLE_SCHEMA.fields}["struct"]
    assert {f.name: f for f in pruned.fields}["struct"].dataType == full.dataType


def test_exceptall_compares_unpruned_rows(spark, fx, tmp_path):
    """Except/Intersect compare ENTIRE rows: branch outputs are
    mandatory-full like grouping keys. Without it, two rows differing only
    in a pruned struct field became equal and vanished from the exceptAll
    result (confirmed-by-execution review r7 finding)."""
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    spark.createDataFrame([((1, "x"),)], "s struct<a:int,b:string>").write.parquet(p1)
    spark.createDataFrame([((1, "y"),)], "s struct<a:int,b:string>").write.parquet(p2)
    r1, r2 = spark.read.parquet(p1), spark.read.parquet(p2)
    q = r1.select("s").exceptAll(r2.select("s")).select("s.a")
    assert [r.a for r in q.collect()] == [1]
    sor = SchemaOnRead.generate(q)
    s1, s2 = sor.for_paths(p1), sor.for_paths(p2)
    rq = (
        spark.read.schema(s1).parquet(p1).select("s")
        .exceptAll(spark.read.schema(s2).parquet(p2).select("s"))
        .select("s.a")
    )
    assert [r.a for r in rq.collect()] == [1], (s1, s2)


def test_dropduplicates_keys_stay_full(spark, fx, tmp_path):
    p = str(tmp_path / "dd")
    spark.createDataFrame(
        [((1, "x"),), ((1, "y"),)], "s struct<a:int,b:string>"
    ).write.parquet(p)
    r = spark.read.parquet(p)
    q = r.select("s").dropDuplicates().select("s.a")
    assert sorted(x.a for x in q.collect()) == [1, 1]
    pruned = SchemaOnRead.generate(q).for_paths(p)
    rq = spark.read.schema(pruned).parquet(p).select("s").dropDuplicates().select("s.a")
    assert sorted(x.a for x in rq.collect()) == [1, 1], pruned


def test_bare_union_pending_branch_materializes_and_mirrors(spark, fx):
    # r8 review find, proven by execution: a POSITIONAL union with NO
    # per-branch Project (unlike unionByName, which inserts one) leaves the
    # untouched branch with no trie node for the struct at all — the
    # touched branch emitted STRUCT<col1> while its sibling DROPPED the
    # column, an arity mismatch the pruned re-read only survived via the
    # silent best-effort fallback. A branch-local touch must materialize
    # the pending sibling handles and mirror into them.
    pq = spark.read.parquet(fx["sample_parquet"])
    js = spark.read.option("multiline", True).json(fx["sample_json"])
    cols = pq.columns  # identical shape both sources; positional union is safe
    df = (
        pq.filter(F.col("struct.col1").isNotNull())
        .union(js.select(*cols))
        .select("someStr")
    )
    sor = gen(df)
    got_pq = sor.for_paths(fx["sample_parquet"])
    got_js = sor.for_paths(fx["sample_json"])
    # both branches carry the SAME narrowed struct (not dropped on one side);
    # top-level field ORDER follows each source's own schema — the query's
    # projections realign positions, the reader only decides what loads
    assert got_pq["struct"].dataType.fieldNames() == ["col1"]
    assert got_js["struct"].dataType.fieldNames() == ["col1"]
    assert sorted(f.name for f in got_pq) == sorted(f.name for f in got_js)
    # and the strict (no-fallback) re-read answers identically
    pruned = (
        spark.read.schema(got_pq).parquet(fx["sample_parquet"])
        .filter(F.col("struct.col1").isNotNull())
        .union(
            spark.read.schema(got_js).option("multiline", True)
            .json(fx["sample_json"]).select(*[c for c in cols if c in got_js.fieldNames()])
        )
        .select("someStr")
    )
    assert sorted(r[0] for r in pruned.collect()) == sorted(r[0] for r in df.collect())


# ------------------------------------------------- higher-order functions


def _roundtrip(spark, fx, build):
    """full-vs-pruned execution equivalence on the sample parquet fixture."""
    path = fx["sample_parquet"]
    full = build(spark.read.parquet(path))
    expected = sorted(map(str, full.collect()))
    pruned = gen(full).for_paths(path)
    got = sorted(map(str, build(spark.read.schema(pruned).parquet(path)).collect()))
    assert got == expected, pruned
    return pruned


def test_hof_exists_in_filter_keeps_lambda_field(spark, fx):
    # r11 probe find (the r10-subquery class of bug), proven by execution
    # BEFORE the fix: exists(arr, x -> x.col1 > 0) as a bare Filter
    # condition skeletonized someComplexArray to array<struct<>> — the
    # pruned re-read crashed FIELD_NOT_FOUND (silent wrong rows on lenient
    # sources). The lambda's GetStructField goes through a
    # NamedLambdaVariable leaf that belongs to no relation; _walk_hof now
    # binds it to the collection argument's trie handles. Precision: col1
    # is kept, col2 is NOT (the trie's array transparency records
    # arr.element.col1 exactly).
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.filter(F.exists("someComplexArray", lambda x: x["col1"] > 0)).select("someStr"),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1"]


def test_hof_forall_and_sql_exists_in_filter(spark, fx):
    _roundtrip(
        spark, fx,
        lambda df: df.filter(F.forall("someComplexArray", lambda x: x["col1"] > 0)).select("someStr"),
    )
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.filter(F.expr("exists(someComplexArray, x -> x.col1 > 0)")).select("someLong"),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1"]


def test_hof_transform_alias_narrows_to_lambda_field(spark, fx):
    # transform(arr, x -> x.col2) AS t consumed downstream: the alias binds
    # to the lambda BODY's handles, so a whole-`t` require keeps exactly
    # col2 — the true data dependency — not the whole element struct
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(F.explode(F.transform("someComplexArray", lambda x: x["col2"])).alias("v")),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col2"]


def test_hof_transform_identity_keeps_full_element(spark, fx):
    # transform(arr, x -> x): the body IS the bare var — it must resolve to
    # the collection handles so the final-output require keeps the element
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(F.transform("someComplexArray", lambda x: x).alias("t")),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1", "col2"]


def test_hof_bare_var_value_comparison_requires_full_element(spark, fx):
    # exists(arr, x -> x == struct(..)): EqualTo observes the WHOLE element,
    # and the var is a bare leaf (no field access) — NamedLambdaVariable
    # must be a _PATH_EXPRS member for require mode to reach the collection
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.filter(
            F.exists(
                "someComplexArray",
                lambda x: x == F.struct(F.lit(1).cast("long").alias("col1"), F.lit(2).cast("long").alias("col2")),
            )
        ).select("someStr"),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1", "col2"]


def test_hof_derived_collection_requires_sources_fully(spark, fx):
    # the collection is DERIVED (array(struct_col)): the generic walk
    # returns only the last child's handles, so instead of binding the var
    # the whole derived subtree is required — safe over-keep, never loss
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.filter(F.exists(F.array(F.col("struct")), lambda x: x["col2"] > 0)).select("someStr"),
    )
    assert pruned["struct"].dataType.fieldNames() == ["col1", "col2", "col3", "subArray"]


def test_hof_nested_lambdas_narrow_both_levels(spark, fx):
    # exists(arrOfStruct, s -> exists(s.col2, v -> v > 1)): the inner HOF's
    # collection is a field access THROUGH the outer var — both levels
    # resolve, and the read schema narrows to exactly col2
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.filter(
            F.exists("someArrayOfComplexArrays", lambda s: F.exists(s["col2"], lambda v: v > 1))
        ).select("someStr"),
    )
    assert pruned["someArrayOfComplexArrays"].dataType.elementType.fieldNames() == ["col2"]


def test_hof_aggregate_and_zip_with_in_filter(spark, fx):
    # aggregate's merge lambda reads x.col2; the `> 3` comparison walks the
    # whole subtree in require mode (value-comparison semantics), so the
    # FULL collection is kept — over-keep by design, never loss
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.filter(F.expr("aggregate(someComplexArray, 0L, (acc, x) -> acc + x.col2) > 3")).select("someLong"),
    )
    assert "col2" in pruned["someComplexArray"].dataType.elementType.fieldNames()
    # zip_with reads a field from EACH side; vars over-bind to both
    # collections (descents that don't exist in a source drop at schema
    # intersection) — both sides keep their accessed field
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.filter(
            F.exists(
                F.zip_with("someComplexArray", "someArrayOfComplexArrays", lambda a, b: a["col1"] + b["col3"]),
                lambda s: s > 0,
            )
        ).select("someStr"),
    )
    assert "col1" in pruned["someComplexArray"].dataType.elementType.fieldNames()
    assert "col3" in pruned["someArrayOfComplexArrays"].dataType.elementType.fieldNames()


def test_hof_element_preserving_alias_keeps_full_element(spark, fx):
    # r11 probe find #2 (proven silent DATA-LOSS before the fix): filter()'s
    # result carries the ORIGINAL elements whole, so `filter(arr, x ->
    # x.col1 > 0) AS t` in a non-upper Project followed by SELECT t must
    # keep the full element — binding the alias only to the lambda body's
    # handles pruned t to struct<col1> and silently dropped col2 from the
    # query result. Element-preserving HOFs (and unknown ones) now return
    # collection + body handles.
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(F.filter("someComplexArray", lambda x: x["col1"] > 0).alias("t")).select("t"),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1", "col2"]
    # array_sort with a comparator lambda: same contract
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(F.array_sort("someComplexArray", lambda a, b: (a["col1"] - b["col1"]).cast("int")).alias("t")).select("t"),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1", "col2"]


# -------------------------------------- branch-value exprs / withField


def test_branch_value_alias_reaches_all_branches(spark, fx, tmp_path):
    # r11 probe find, proven by execution: coalesce/CASE WHEN/if results
    # are ONE OF their value operands, but the generic last-child walk
    # bound an enclosing alias to only the LAST branch — `coalesce(s1, s2)
    # AS s; SELECT s.a` pruned s1 to struct<> and the re-read failed
    # analysis with DATA_DIFF_TYPES (and would silently lose on same-shape
    # narrowing). Value branches now bind together and their pruned shapes
    # reconcile through the set-op merge buckets.
    p = str(tmp_path / "bv")
    spark.createDataFrame(
        [(1, (10, 11), (20, 21), True), (2, None, (30, 31), False)],
        "id bigint, s1 struct<a:bigint,b:bigint>, s2 struct<a:bigint,b:bigint>, flag boolean",
    ).write.parquet(p)

    def run(build):
        full = build(spark.read.parquet(p))
        expected = sorted(map(str, full.collect()))
        pruned = gen(full).for_paths(p)
        got = sorted(map(str, build(spark.read.schema(pruned).parquet(p)).collect()))
        assert got == expected, pruned
        return pruned

    pruned = run(lambda df: df.select(F.coalesce("s1", "s2").alias("s"), "id").select("id", "s.a"))
    # precision: BOTH branches narrow to the accessed field
    assert pruned["s1"].dataType.fieldNames() == ["a"]
    assert pruned["s2"].dataType.fieldNames() == ["a"]
    run(lambda df: df.select(F.when(F.col("flag"), F.col("s1")).otherwise(F.col("s2")).alias("s")).select("s"))
    run(lambda df: df.select(F.expr("CASE WHEN flag THEN s1 WHEN id > 2 THEN s2 ELSE s2 END").alias("s"), "id").select("id", "s.b"))
    # a LITERAL branch has a fixed shape: no sibling may narrow against it
    pruned = run(lambda df: df.select(
        F.expr("CASE WHEN flag THEN s1 ELSE named_struct('a', CAST(1 AS BIGINT), 'b', CAST(2 AS BIGINT)) END").alias("s"), "id"
    ).select("id", "s.a"))
    assert pruned["s1"].dataType.fieldNames() == ["a", "b"]
    # nvl family flows through its RuntimeReplaceable replacement child
    run(lambda df: df.select(F.expr("nvl2(flag, s1, s2)").alias("s")).select("s"))
    run(lambda df: df.select(F.expr("nullif(s1, s2)").alias("s")).select("s"))


def test_update_fields_alias_keeps_base_struct(spark, fx, tmp_path):
    # r11 probe find, proven SILENT data loss: withField's result is the
    # base struct with ops applied, but the alias bound to the REPLACEMENT
    # value only — `s1.withField('b', id) AS s; SELECT s` returned
    # Row(b=..) instead of Row(a=.., b=..). UpdateFields now unions base +
    # value handles.
    p = str(tmp_path / "uf")
    spark.createDataFrame(
        [(1, (10, 11)), (2, (40, 41))], "id bigint, s1 struct<a:bigint,b:bigint>"
    ).write.parquet(p)

    def run(build):
        full = build(spark.read.parquet(p))
        expected = sorted(map(str, full.collect()))
        pruned = gen(full).for_paths(p)
        got = sorted(map(str, build(spark.read.schema(pruned).parquet(p)).collect()))
        assert got == expected, pruned
        return pruned

    pruned = run(lambda df: df.select(F.col("s1").withField("b", F.col("id")).alias("s")).select("s"))
    assert pruned["s1"].dataType.fieldNames() == ["a", "b"]
    run(lambda df: df.select(F.col("s1").dropFields("b").alias("s")).select("s"))
    # accessing only ORIGINAL fields through the alias still narrows
    pruned = run(lambda df: df.select(
        F.col("s1").withField("c", F.lit(9).cast("bigint")).alias("s"), "id"
    ).select("id", "s.a"))
    assert pruned["s1"].dataType.fieldNames() == ["a"]


# ------------------------------------------------ constructed complex values


def test_struct_ctor_alias_routes_by_constructed_name(spark, fx):
    # r11 probe find (alias-binding class): struct()/named_struct results
    # bound an enclosing alias to the LAST value only — `struct(s, n) AS
    # s2; SELECT s2` silently returned Row() for s (whole-alias require
    # landed on n), and `SELECT s2.inner.col1` crashed FIELD_NOT_FOUND
    # (descend by the CONSTRUCTED name touched a bogus child of n's node).
    # A StructSynthNode now maps constructed names to the real value nodes.
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(
            F.struct(F.col("struct").alias("inner_s"), F.col("someLong").alias("n")).alias("s2")
        ).select("s2.inner_s.col1"),
    )
    # precision: descend by constructed name narrows the mapped source
    assert pruned["struct"].dataType.fieldNames() == ["col1"]
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(
            F.struct(F.col("struct").alias("inner_s"), F.col("someLong").alias("n")).alias("s2")
        ).select("s2"),
    )
    assert pruned["struct"].dataType.fieldNames() == ["col1", "col2", "col3", "subArray"]
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(F.expr("named_struct('a', nestedStruct, 'b', someStr)").alias("s2"))
        .select("s2.a.childStruct.col2"),
    )
    assert pruned["nestedStruct"].dataType["childStruct"].dataType.fieldNames() == ["col2"]
    # a literal constructed field needs no source data at all
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(F.struct(F.lit(7).alias("seven"), F.col("someLong").alias("n")).alias("s2"))
        .select("s2.seven"),
    )
    assert "struct" not in pruned.fieldNames()


def test_collection_ctor_elements_are_one_value_stream(spark, fx):
    # array(a, b) elements are one value stream: element access must narrow
    # EVERY element source and their pruned shapes must agree (before r11
    # only the last element narrowed — DATA_DIFF_TYPES on the re-read)
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(
            F.array(F.col("nestedStruct.childStruct"), F.col("someComplexArray")[0]).alias("arr2")
        ).select(F.get("arr2", 0)["col1"].alias("v")),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1"]
    assert pruned["nestedStruct"].dataType["childStruct"].dataType.fieldNames() == ["col1"]
    # constructed-map KEY sources can never narrow (rebuilt lookups compare
    # whole key values); value access through the map stays precise
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(F.create_map(F.col("someStr"), F.col("nestedStruct")).alias("m"), "someStr")
        .select(F.col("m")[F.col("someStr")]["str"].alias("v")),
    )
    assert pruned["nestedStruct"].dataType.fieldNames() == ["str"]
    _roundtrip(
        spark, fx,
        lambda df: df.select(F.explode(F.create_map(F.lit("k"), F.col("struct"))).alias("k", "v"))
        .select("v.col3"),
    )
    _roundtrip(
        spark, fx,
        lambda df: df.select(
            F.map_from_arrays(F.transform("someComplexArray", lambda x: x["col1"]), F.col("someComplexArray")).alias("m")
        ).select(F.map_values("m")[0]["col2"].alias("v")),
    )


def test_concat_and_arrays_zip_value_streams(spark, fx, tmp_path):
    # r11 probe finds: concat(a1, a2) merges both element streams — element
    # access must narrow BOTH sources with agreeing shapes; arrays_zip is a
    # CONSTRUCTED struct over element streams (descend by zip name routed
    # to the LAST array before the fix — FIELD_NOT_FOUND).
    p = str(tmp_path / "cc")
    spark.createDataFrame(
        [(1, [(1, 2)], [(3, 4)])],
        "id bigint, a1 array<struct<x:bigint,y:bigint>>, a2 array<struct<x:bigint,y:bigint>>",
    ).write.parquet(p)
    full = spark.read.parquet(p).select(F.concat("a1", "a2").alias("c")).select(F.get("c", 0)["x"].alias("v"))
    pruned = gen(full).for_paths(p)
    got = (spark.read.schema(pruned).parquet(p)
           .select(F.concat("a1", "a2").alias("c")).select(F.get("c", 0)["x"].alias("v")))
    assert [r.v for r in got.collect()] == [r.v for r in full.collect()]
    assert pruned["a1"].dataType.elementType.fieldNames() == ["x"]
    assert pruned["a2"].dataType.elementType.fieldNames() == ["x"]

    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(
            F.arrays_zip(F.col("someComplexArray").alias("a"), F.col("someStrArray").alias("b")).alias("z")
        ).select(F.get("z", 0)["a"]["col1"].alias("v")),
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1"]
    # explode of the zip + both zip fields; and the no-alias form (names
    # default to the source column names)
    _roundtrip(
        spark, fx,
        lambda df: df.select(
            F.explode(F.arrays_zip(F.col("someComplexArray").alias("a"), F.col("someStrArray").alias("b"))).alias("e")
        ).select("e.a.col1", "e.b"),
    )
    _roundtrip(
        spark, fx,
        lambda df: df.select(F.arrays_zip("someComplexArray", "someStrArray").alias("z"))
        .select(F.get("z", 0)["someComplexArray"]["col2"].alias("v")),
    )


def test_whole_value_observers_require_complex_operands(spark, fx, tmp_path):
    # r11 probe find (proven silent row loss): serializers/hashers observe
    # EVERY field of a complex operand, but outside a comparison wrapper
    # they sat in touch mode — filter(to_json(s).contains(..)) and
    # filter(cast(s as string).like(..)) skeletonized s and returned [].
    # Cast additionally can never narrow a complex operand (positional
    # field rebinding, declared-arity target). DISTINCT aggregates observe
    # whole-value equality — the flag lives on AggregateExpression.
    p = str(tmp_path / "wv")
    spark.createDataFrame(
        [(1, (10, 111111), True), (2, (10, 2), True), (3, (10, 333), False)],
        "id bigint, s struct<a:bigint,b:bigint>, flag boolean",
    ).write.parquet(p)

    def run(build):
        full = build(spark.read.parquet(p))
        expected = sorted(map(str, full.collect()))
        pruned = gen(full).for_paths(p)
        got = sorted(map(str, build(spark.read.schema(pruned).parquet(p)).collect()))
        assert got == expected, pruned
        return pruned

    run(lambda df: df.filter(F.to_json("s").contains("111111")).select("id"))
    run(lambda df: df.filter(F.col("s").cast("string").contains("333")).select("id"))
    run(lambda df: df.filter(F.to_json("s").like("%2%")).select("id"))
    # count(DISTINCT s) where the otherwise-projected subfield COLLIDES
    # across rows (all a=10): a subset-pruned distinct would count 1, not 3
    pruned = run(lambda df: df.groupBy().agg(F.count_distinct("s").alias("n"), F.max("s.a").alias("ma")))
    assert pruned["s"].dataType.fieldNames() == ["a", "b"]
    run(lambda df: df.select(
        F.map_from_entries(F.array(F.struct(F.col("id").alias("k"), F.col("s").alias("v")))).alias("m")
    ).select(F.map_values("m")[0]["b"].alias("x")))


def test_python_udf_complex_arg_required_fully(spark, fx, tmp_path):
    # r11 probe find: a UDF receives its argument VALUES whole — a bare
    # boolean UDF filter over a struct crashed the Python worker on the
    # pruned re-read (KeyError indexing a field the pruned struct lost).
    # UDF complex args are now required like comparisons.
    from pyspark.sql import types as T

    p = str(tmp_path / "udfarg")
    spark.createDataFrame(
        [(1, (10, 111111)), (2, (10, 2))], "id bigint, s struct<a:bigint,b:bigint>"
    ).write.parquet(p)

    @F.udf(returnType=T.BooleanType())
    def big_b(s):
        return s is not None and (s["b"] or 0) > 100

    build = lambda df: df.filter(big_b(F.col("s"))).select("id")  # noqa: E731
    full = build(spark.read.parquet(p))
    pruned = gen(full).for_paths(p)
    assert pruned["s"].dataType.fieldNames() == ["a", "b"], pruned
    got = build(spark.read.schema(pruned).parquet(p))
    assert [r.id for r in got.collect()] == [r.id for r in full.collect()]


def test_with_common_expression_defs_required(spark, fx, tmp_path):
    # r11 probe find: nullif/ifnull lower to With(child, defs) whose
    # CommonExpressionRef leaves carry NO usable id in the plan JSON — a
    # bare filter on nullif(s1, s2) skeletonized s1 (the def) while the
    # comparison kept s2 full, failing the re-read with
    # BINARY_OP_DIFF_TYPES. Defs are now required fully.
    p = str(tmp_path / "withce")
    spark.createDataFrame(
        [(1, (10, 11), (20, 21)), (2, (10, 11), (10, 11))],
        "id bigint, s1 struct<a:bigint,b:bigint>, s2 struct<a:bigint,b:bigint>",
    ).write.parquet(p)

    def run(build):
        full = build(spark.read.parquet(p))
        expected = sorted(map(str, full.collect()))
        pruned = gen(full).for_paths(p)
        got = sorted(map(str, build(spark.read.schema(pruned).parquet(p)).collect()))
        assert got == expected, pruned
        return pruned

    run(lambda df: df.filter(F.expr("nullif(s1, s2)").isNotNull()).select("id"))
    run(lambda df: df.filter(F.expr("nullif(s1, s1)").isNull()).select("id"))
    run(lambda df: df.filter(F.expr("ifnull(s1, s2)").isNotNull()).select("id"))


def test_map_lookup_struct_key_required(spark, fx, tmp_path):
    # r11 probe find: m[k] / element_at(m, k) compare the WHOLE key value,
    # but lookup-key operands walked in touch mode — a struct key COLUMN
    # pruned to a subset failed the re-read with MAP_FUNCTION_DIFF_TYPES
    # (and a same-shape narrowing would change which entries match). Keys/
    # ordinals now walk in require mode (int ordinals: no-op).
    p = str(tmp_path / "mk")
    spark.createDataFrame(
        [(1, {(10, 11): 5}, (10, 11)), (2, {(30, 31): 7}, (30, 31))],
        "id bigint, m map<struct<a:bigint,b:bigint>,bigint>, k struct<a:bigint,b:bigint>",
    ).write.parquet(p)

    def run(build):
        full = build(spark.read.parquet(p))
        expected = sorted(map(str, full.collect()))
        pruned = gen(full).for_paths(p)
        got = sorted(map(str, build(spark.read.schema(pruned).parquet(p)).collect()))
        assert got == expected, pruned
        return pruned

    pruned = run(lambda df: df.select(F.element_at("m", F.col("k")).alias("v"), "id").select("id", "v"))
    assert pruned["k"].dataType.fieldNames() == ["a", "b"]
    run(lambda df: df.select(F.col("m")[F.col("k")].alias("v"), "id").select("id", "v"))


def test_branch_value_unresolvable_path_child_forces_full(spark, fx):
    # r11 expression-grammar fuzz find: a path-CLASSED branch child whose
    # base hides a derived head (get(concat(a, a), 0)) resolved to no
    # handles, so its shape stayed FULL while the sibling narrowed to
    # struct<col1> — DATA_DIFF_TYPES on the pruned re-read. Two fixes
    # interact here: the resolved-handles guard in _walk_branch_value
    # (full-require when any branch cannot bind), and the later
    # _resolve_path routing through value-routing heads, which makes THIS
    # shape bindable after all — Concat returns both arrays' handles, the
    # Get strips the index, and every branch narrows to col1 with shapes
    # reconciled through the merge bucket. The roundtrip is the contract;
    # the schema assertion pins the (now precise) shape agreement.
    pruned = _roundtrip(
        spark, fx,
        lambda df: df.select(
            F.coalesce(
                F.get(F.concat("someComplexArray", "someComplexArray"), 0),
                F.col("nestedStruct.childStruct"),
            ).alias("e"),
            "someStr",
        ).select("someStr", F.col("e")["col1"].alias("v")),
    )
    assert pruned["nestedStruct"].dataType["childStruct"].dataType.fieldNames() == ["col1"]
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col1"]


def test_inline_field_access_through_routing_heads_is_precise(spark, fx, tmp_path):
    # r11 precision follow-up: a path running THROUGH a value-routing head
    # inline — coalesce(s1, s2).a, named_struct('x', s).x.f,
    # arrays_zip(..)[0].a.f — used to fall to the full-require backstop;
    # _resolve_path now routes through the dedicated walkers, so descents
    # narrow precisely while branch shapes stay reconciled.
    p = str(tmp_path / "inl")
    spark.createDataFrame(
        [(1, (10, 11), (20, 21), True), (2, None, (30, 31), False)],
        "id bigint, s1 struct<a:bigint,b:bigint>, s2 struct<a:bigint,b:bigint>, flag boolean",
    ).write.parquet(p)

    def run(build, path):
        full = build(spark.read.parquet(path))
        expected = sorted(map(str, full.collect()))
        pruned = gen(full).for_paths(path)
        got = sorted(map(str, build(spark.read.schema(pruned).parquet(path)).collect()))
        assert got == expected, pruned
        return pruned

    pruned = run(lambda df: df.select(F.coalesce("s1", "s2")["a"].alias("v"), "id"), p)
    assert pruned["s1"].dataType.fieldNames() == ["a"]
    assert pruned["s2"].dataType.fieldNames() == ["a"]
    pruned = run(
        lambda df: df.select(F.expr("named_struct('x', nestedStruct, 'y', someStr).x.childStruct.col2").alias("v")),
        fx["sample_parquet"],
    )
    assert pruned["nestedStruct"].dataType["childStruct"].dataType.fieldNames() == ["col2"]
    pruned = run(
        lambda df: df.select(
            F.arrays_zip(F.col("someComplexArray").alias("a"), F.col("someStrArray").alias("b"))[0]["a"]["col2"].alias("v")
        ),
        fx["sample_parquet"],
    )
    assert pruned["someComplexArray"].dataType.elementType.fieldNames() == ["col2"]


def test_plan_json_pool_is_per_process(monkeypatch):
    """r13 self-review: the toJSON overlap pool must be recreated after a
    fork — a child inheriting the parent's executor has a registered-but-
    dead worker thread, and its next submit() would hang fut.result()
    forever. Simulated here by faking a pid change."""
    from score_spark.schema_on_read import generator as G

    p1 = G._plan_json_pool()
    assert G._plan_json_pool() is p1  # same process: reused
    monkeypatch.setattr(G.os, "getpid", lambda: -1)
    p2 = G._plan_json_pool()
    assert p2 is not p1  # "forked": fresh pool with a live worker
    assert p2.submit(lambda: 42).result() == 42
    monkeypatch.undo()
    G._plan_json_pool()  # real pid again: recreated once more, still live

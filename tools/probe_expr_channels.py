#!/usr/bin/env python
"""Auditable replay of the r11 leg-2 expression-channel sweep.

Method (the repo's pruned-reread contract): build a query, derive the
pruned read schema with SchemaOnRead, re-run the IDENTICAL query over a
reader bound to that schema, and diff the rows. A diff or a crash on the
pruned leg is a real bug. Every case below was a CONFIRMED data-loss shape
(crash or silently wrong rows) before its fix landed; this tool re-proves
the full set in one run and exits nonzero on any regression.

Classes covered (one fix commit each — see SURVEY §8 "Expression-channel
hardening"): HOF lambda binding, element-preserving HOF aliases,
branch-value exprs (If/CaseWhen/Coalesce), UpdateFields, CreateNamedStruct,
collection constructors + concat, arrays_zip, whole-value observers
(serializers/hashers/Cast/DISTINCT aggs), UDF arguments, With
common-expression defs, map-lookup struct keys. Plus always-passing control
shapes (pandas plan nodes, set-ops over constructed structs) recorded so a
future regression is visible.

Usage: python tools/probe_expr_channels.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SCORE_SPARK_SOR_RAISE", "1")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F, types as T  # noqa: E402


def main() -> int:
    from score_spark.schema_on_read import SchemaOnRead
    from score_spark.session import get_session
    from tests.fixtures_nested import write_fixtures

    spark = get_session(
        app_name="probe-expr-channels",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    base = tempfile.mkdtemp(prefix="expr_channels_")
    fx = write_fixtures(spark, base)
    nested = fx["sample_parquet"]

    wv = f"{base}/wv.parquet"  # distinct struct values + colliding subfield
    spark.createDataFrame(
        [(1, (10, 111111), True), (2, (10, 2), True), (3, (10, 333), False)],
        "id bigint, s struct<a:bigint,b:bigint>, flag boolean",
    ).write.parquet(wv)
    bv = f"{base}/bv.parquet"  # two same-shaped structs + a null each side
    spark.createDataFrame(
        [(1, (10, 11), (20, 21), True), (2, None, (30, 31), False), (3, (40, 41), None, True)],
        "id bigint, s1 struct<a:bigint,b:bigint>, s2 struct<a:bigint,b:bigint>, flag boolean",
    ).write.parquet(bv)
    mk = f"{base}/mk.parquet"  # map with STRUCT keys + a struct key column
    spark.createDataFrame(
        [(1, {(10, 11): 5}, (10, 11)), (2, {(30, 31): 7}, (30, 31))],
        "id bigint, m map<struct<a:bigint,b:bigint>,bigint>, k struct<a:bigint,b:bigint>",
    ).write.parquet(mk)

    @F.udf(returnType=T.BooleanType())
    def big_b(s):
        return s is not None and (s["b"] or 0) > 100

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": pdf["id"], "bsum": [(r["a"] or 0) + (r["b"] or 0) for r in pdf["s"]]})

    CASES = {
        # --- HOF lambdas
        "hof_exists_filter": (nested, lambda df: df.filter(F.exists("someComplexArray", lambda x: x["col1"] > 0)).select("someStr")),
        "hof_sql_aggregate": (nested, lambda df: df.filter(F.expr("aggregate(someComplexArray, 0L, (acc, x) -> acc + x.col2) > 3")).select("someLong")),
        "hof_nested": (nested, lambda df: df.filter(F.exists("someArrayOfComplexArrays", lambda s: F.exists(s["col2"], lambda v: v > 1))).select("someStr")),
        "hof_elem_preserving_alias": (nested, lambda df: df.select(F.filter("someComplexArray", lambda x: x["col1"] > 0).alias("t")).select("t")),
        # --- branch values
        "coalesce_alias_field": (bv, lambda df: df.select(F.coalesce("s1", "s2").alias("s"), "id").select("id", "s.a")),
        "casewhen_literal_branch": (bv, lambda df: df.select(F.expr("CASE WHEN flag THEN s1 ELSE named_struct('a', CAST(1 AS BIGINT), 'b', CAST(2 AS BIGINT)) END").alias("s"), "id").select("id", "s.a")),
        "nvl2_whole": (bv, lambda df: df.select(F.expr("nvl2(flag, s1, s2)").alias("s")).select("s")),
        # --- UpdateFields
        "withfield_alias": (bv, lambda df: df.select(F.col("s1").withField("b", F.col("id")).alias("s")).select("s")),
        # --- constructed values
        "cns_whole": (nested, lambda df: df.select(F.struct(F.col("struct").alias("i"), F.col("someLong").alias("n")).alias("s2")).select("s2")),
        "cns_field": (nested, lambda df: df.select(F.struct(F.col("struct").alias("i"), F.col("someLong").alias("n")).alias("s2")).select("s2.i.col1")),
        "carr_item_diff": (nested, lambda df: df.select(F.array(F.col("nestedStruct.childStruct"), F.col("someComplexArray")[0]).alias("a")).select(F.get("a", 0)["col1"].alias("v"))),
        "cmap_col_key": (nested, lambda df: df.select(F.create_map(F.col("someStr"), F.col("nestedStruct")).alias("m"), "someStr").select(F.col("m")[F.col("someStr")]["str"].alias("v"))),
        "arrays_zip_field": (nested, lambda df: df.select(F.arrays_zip(F.col("someComplexArray").alias("a"), F.col("someStrArray").alias("b")).alias("z")).select(F.get("z", 0)["a"]["col1"].alias("v"))),
        # --- whole-value observers
        "tojson_contains": (wv, lambda df: df.filter(F.to_json("s").contains("111111")).select("id")),
        "caststr_contains": (wv, lambda df: df.filter(F.col("s").cast("string").contains("333")).select("id")),
        "count_distinct_struct": (wv, lambda df: df.groupBy().agg(F.count_distinct("s").alias("n"), F.max("s.a").alias("ma"))),
        # --- UDF args
        "pyudf_bare_filter": (wv, lambda df: df.filter(big_b(F.col("s"))).select("id")),
        # --- With (common expressions)
        "nullif_touch_filter": (bv, lambda df: df.filter(F.expr("nullif(s1, s2)").isNotNull()).select("id")),
        # --- map lookup struct keys
        "element_at_struct_key": (mk, lambda df: df.select(F.element_at("m", F.col("k")).alias("v"), "id").select("id", "v")),
        # --- controls that were always safe (regression watch)
        "apply_in_pandas_fullkeep": (wv, lambda df: df.groupBy("id").applyInPandas(apply_fn, "id long, bsum long")),
        "union_ctor_real": (bv, lambda df: df.select(F.struct(F.col("id").alias("a"), F.col("id").alias("b")).alias("s")).union(df.select("s2")).select("s.a")),
        "agg_filter_clause": (wv, lambda df: df.groupBy("flag").agg(F.expr("count(id) FILTER (WHERE s.b > 100)").alias("n"))),
    }

    failures = 0
    for name, (path, build) in CASES.items():
        df = spark.read.parquet(path)
        full = build(df)
        expected = sorted(map(str, full.collect()))
        try:
            pruned = SchemaOnRead.generate(full).for_paths(path)
            got = sorted(map(str, build(spark.read.schema(pruned).parquet(path)).collect()))
            ok = got == expected
            status = "OK" if ok else "DATA-LOSS"
        except Exception as ex:  # pruned leg must never crash
            status, ok = f"CRASH: {type(ex).__name__}", False
        if not ok:
            failures += 1
        print(f"[expr-channels] {name:28s} {status}", flush=True)
    print(f"[expr-channels] {len(CASES) - failures}/{len(CASES)} OK", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

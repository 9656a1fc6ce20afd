"""p01_pruned_rewrite: the full ScORe loop (build -> derive read schema ->
re-read pruned -> same answer), end-to-end over parquet + JSON sources."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_prune_narrows_both_sources(spark):
    from score_spark.queries.pruned import pruned_schemas_for_fixture

    pq_schema, js_schema = pruned_schemas_for_fixture(spark, SF)
    # parquet side touches only doc_id + meta.a: payload must be gone
    assert [f.name for f in pq_schema.fields] == ["doc_id", "meta"]
    assert [f.name for f in pq_schema["meta"].dataType.fields] == ["a"]
    # json side touches only doc_id + payload.nested.small: meta gone, the
    # fat payload.big dropped, nested narrowed past len
    assert [f.name for f in js_schema.fields] == ["doc_id", "payload"]
    payload = js_schema["payload"].dataType
    assert [f.name for f in payload.fields] == ["nested"]
    assert [f.name for f in payload["nested"].dataType.fields] == ["small"]


def test_pruned_rewrite_matches_full_run(spark):
    import pyspark.sql.functions as F

    from score_spark.queries.pruned import _ensure_nested_fixture, p01_pruned_rewrite

    got = p01_pruned_rewrite(spark, SF).collect()
    pq, _, _ = _ensure_nested_fixture(spark, SF)
    full = (
        spark.read.parquet(pq)
        .select("doc_id", F.col("meta.a").alias("a"), F.col("payload.nested.small").alias("small"))
        .groupBy("a")
        .agg(F.sum("small").alias("s"), F.count(F.lit(1)).alias("n"))
        .orderBy("a")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in full]
    assert len(got) > 0

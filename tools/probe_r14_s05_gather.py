#!/usr/bin/env python
"""Prototype probe: gather-broadcast rerank vs join-based rerank for the s05
tuned8x8 leg at sf1 (opt round 14, guide §8 "move heavy bytes once").

Current rerank: cand JOIN emb JOIN emb -> pandas cosine. Every candidate
pair ships TWO 64-double vectors through Arrow (~1 KB/pair; 7.4M pairs at
sf1 = ~7.5 GB per run) and the stage costs 66-113 core-s.

Prototype: broadcast (ids_sorted, E) once (~10 MB), rerank is a MAP-ONLY
pandas UDF on the (v1, v2) longs: searchsorted gather + the SAME float64
einsum/norm arithmetic -> bit-identical sims. Verifies output equality
(collected sets) then ABABs the walls.

Usage: python tools/probe_r14_s05_gather.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, ".scale_fixtures", "sf1")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from score_spark.io import load_table
    from score_spark.operators.similarity import (
        cosine_pd,
        lsh_pair_candidates,
    )
    from score_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(app_name="probe-r14-s05-gather", master=f"local[{cpus}]")

    emb = load_table(spark, sf_dir, "embeddings")
    threshold = 0.3

    def cand():
        return lsh_pair_candidates(emb, n_tables=8, n_planes=8)

    def rerank_join(c):
        e1 = emb.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("_v1"))
        e2 = emb.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("_v2"))
        sim = cosine_pd(F.col("_v1"), F.col("_v2"))
        return (
            c.join(e1, "v1")
            .join(e2, "v2")
            .select("v1", "v2", F.round(sim, 4).alias("sim"))
            .filter((F.col("sim") >= threshold) & ~F.isnan("sim"))
        )

    # ---- gather prototype
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    E = np.array(list(pdf["embedding"]), dtype=np.float64)
    order = np.argsort(ids)
    ids_sorted, E_sorted = ids[order], E[order]
    bc = spark.sparkContext.broadcast((ids_sorted, E_sorted))
    print(f"## gather table: {len(ids_sorted)} rows, {E_sorted.nbytes/2**20:.1f} MB", file=sys.stderr)

    @F.pandas_udf("double")
    def pair_sim(v1: pd.Series, v2: pd.Series) -> pd.Series:
        if len(v1) == 0:
            return pd.Series([], dtype="float64")
        g_ids, g_E = bc.value
        x1 = v1.to_numpy(dtype=np.int64)
        x2 = v2.to_numpy(dtype=np.int64)
        i1 = np.searchsorted(g_ids, x1).clip(0, len(g_ids) - 1)
        i2 = np.searchsorted(g_ids, x2).clip(0, len(g_ids) - 1)
        ok = (g_ids[i1] == x1) & (g_ids[i2] == x2)
        A, B = g_E[i1], g_E[i2]
        s = np.einsum("ij,ij->i", A, B) / (
            np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        )
        s[~ok] = np.nan
        return pd.Series(s)

    psim = pair_sim.asNondeterministic()

    def rerank_gather(c):
        sim = psim(F.col("v1"), F.col("v2"))
        return (
            c.select("v1", "v2", F.round(sim, 4).alias("sim"))
            .filter((F.col("sim") >= threshold) & ~F.isnan("sim"))
        )

    # ---- equality check
    a = {tuple(r) for r in rerank_join(cand()).collect()}
    b = {tuple(r) for r in rerank_gather(cand()).collect()}
    print(f"## equality: join={len(a)} gather={len(b)} equal={a == b}", file=sys.stderr)
    if a != b:
        print(f"## DIFF sample join-only={list(a - b)[:3]} gather-only={list(b - a)[:3]}", file=sys.stderr)
        spark.stop()
        sys.exit(1)

    # ---- ABAB walls
    for variant, fn in (("join", rerank_join), ("gather", rerank_gather)):
        fn(cand()).write.format("noop").mode("overwrite").save()  # warm
    for r in range(rounds):
        for variant, fn in (("join", rerank_join), ("gather", rerank_gather)):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.monotonic()
            fn(cand()).write.format("noop").mode("overwrite").save()
            print(f"## round{r} {variant}: {time.monotonic()-t0:.3f}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness: run the full query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON
line with per-query wall-clock.

Execution is forced with the noop sink (full pipeline runs, nothing
collected), which is the honest cluster-shaped measurement: no driver
materialization cost, no toPandas.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    from score_spark.queries import QUERIES
    from score_spark.session import get_session

    spark = get_session(app_name="score-spark-bench", master=f"local[{cpus}]")
    # JVM/codegen + Python-worker-pool warmup outside the timed region (the
    # first pandas-UDF query otherwise pays ~5 s of worker forking that has
    # nothing to do with the query being measured)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def _warm(batches):
        for b in batches:
            yield b

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_warm, "id long").count()

    times: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)
        # untimed inter-query cleanup: drop the previous query's cache /
        # checkpoint blocks and let ContextCleaner reap dead shuffles, so a
        # heavy query's garbage doesn't show up as GC pauses in the next
        # query's wall-clock (measured: 5-7s random spikes otherwise)
        del df
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    # the reference's headline metric: input-bytes reduction from the pruned
    # read schema (BASELINE.md gate: ratio <= 0.5). Full report -> BYTES.json.
    bytes_summary = None
    try:
        from tools.bytes_bench import run as bytes_run

        bytes_report = bytes_run(spark)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BYTES.json"), "w") as f:
            json.dump(bytes_report, f, indent=2)
        bytes_summary = {
            "max_parquet_ratio": bytes_report["max_parquet_ratio"],
            "gate_ratio_le_050": bytes_report["gate_ratio_le_050"],
            "json_speedup": bytes_report["json_nested_agg"]["speedup"],
        }
    except Exception as e:  # bytes audit must never sink the bench line
        bytes_summary = {"error": str(e)[:200]}

    # judgeable baseline: DuckDB wall-clock for the same oracle SQL on the
    # same parquet (VERDICT r1: "within 2x of BASELINE" needs a number).
    # The quadratic-oracle queries (d02/d03/s02: all-pairs CTEs that exist
    # for checking, not as a fair engine baseline) are excluded; the xcheck-
    # dependent ones run AFTER the Spark loop wrote their parquet above.
    baseline_summary = None
    try:
        baseline_summary = _duckdb_baseline(sf_dir, times)
    except Exception as e:
        baseline_summary = {"error": str(e)[:200]}

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "bytes_pruning": bytes_summary,
                "duckdb_baseline": baseline_summary,
            }
        )
    )
    spark.stop()


_BASELINE_SKIP = {
    # oracle is an all-pairs / full-self-join CTE written for verification;
    # timing it as a "baseline" would be a strawman in our favor at sf0.1
    "d02_ngram_jaccard",
    "d03_minhash_lsh",
    "s02_embedding_near_dups",
}


def _duckdb_baseline(sf_dir: str, spark_times: dict[str, float]) -> dict:
    import duckdb

    from score_spark.io import TABLES
    from score_spark.queries import ORACLE

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    per_query: dict[str, dict] = {}
    for name, sql in sorted(ORACLE.items()):
        if name in _BASELINE_SKIP:
            continue
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        d = round(time.monotonic() - t0, 3)
        s = spark_times.get(name)
        per_query[name] = {
            "duckdb_sec": d,
            "spark_sec": s,
            "ratio": round(s / d, 2) if s and d else None,
        }
    con.close()
    duck_total = round(sum(v["duckdb_sec"] for v in per_query.values()), 3)
    spark_total = round(
        sum(v["spark_sec"] for v in per_query.values() if v["spark_sec"]), 3
    )
    report = {
        "sf_dir": sf_dir,
        "queries": per_query,
        "duckdb_total_sec": duck_total,
        "spark_total_sec_same_queries": spark_total,
        "spark_vs_duckdb_ratio": round(spark_total / duck_total, 2) if duck_total else None,
        "note": "single-node sf0.1; Spark pays per-query planning+JVM overhead "
        "that amortizes at cluster scale — per-query ratios matter more than the total",
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_DUCKDB.json"), "w"
    ) as f:
        json.dump(report, f, indent=2)
    return {
        "duckdb_total_sec": duck_total,
        "spark_total_sec_same_queries": spark_total,
        "spark_vs_duckdb_ratio": report["spark_vs_duckdb_ratio"],
        "n_queries": len(per_query),
    }


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Second decade (10x -> 100x) for the stateful/window, ANN, and packing
families (r11 — extends the d02/d03/d05 deep coverage to the rest of
SCALE.md's ops table).

Same generators and planted rates as tools/scale_bench.py; 100x = 10M
events over 150k users (events and users scale TOGETHER, so per-key state
stays constant), 200k embedding vectors, 500k documents. Discipline per the
d02 close-out rule: ONE fresh session, each op's 10x and 100x legs measured
back-to-back (same host regime), executorCpuTime recorded alongside
run-time (run overstates work when task counts differ — BASELINE.md
"Relational second decade", methodology finding #1), byte/cardinality
maxima as the primary metrics.

Ops: w01 session windows, w04 stateful funnel twin, h01 hour->day HLL
rollup, a01 as-of join, s05 banded-LSH near-dups (production family),
c05 chunk+pack, z01 z-order clustered write (real parquet write).

Usage: python tools/probe_deep_stateful.py [ops_csv]   # prints one JSON report
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SCORE_SPARK_SCALE_DIR", "/root/repo/.scale_fixtures")
DEEP_OPS_DEFAULT = "w01,w04,h01,a01,s05,c05,z01"


def _rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=10) as r:
        return json.load(r)


def _stage_ids(spark):
    return {s["stageId"] for s in _rest(spark, "stages?status=complete")}


def _measure(spark, build, runs=2):
    best = None
    for _ in range(runs):
        before = _stage_ids(spark)
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
        except Exception:
            time.sleep(0.5)
        new = [s for s in _rest(spark, "stages?status=complete") if s["stageId"] not in before]
        rec = {
            "wall": round(wall, 3),
            "run_sec": round(sum(s.get("executorRunTime", 0) for s in new) / 1000, 2),
            "cpu_sec": round(sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 2),
            "gc_sec": round(sum(s.get("jvmGcTime", 0) for s in new) / 1000, 2),
            "tasks": sum(s.get("numCompleteTasks", 0) for s in new),
            "max_stage_input_mb": round(
                max((s.get("inputBytes", 0) for s in new), default=0) / 2**20, 1
            ),
            "max_stage_shuffle_write_mb": round(
                max((s.get("shuffleWriteBytes", 0) for s in new), default=0) / 2**20, 1
            ),
            "n_stages": len(new),
        }
        if best is None or rec["wall"] < best["wall"]:
            best = rec
        import gc

        gc.collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    return best


def main() -> None:
    wanted = (sys.argv[1] if len(sys.argv) > 1 else DEEP_OPS_DEFAULT).split(",")
    from score_spark.session import get_session
    from tools.scale_bench import (
        BASE_DOCS,
        BASE_EVENTS,
        BASE_USERS,
        BASE_VECS,
        gen_documents,
        gen_embeddings,
        gen_events,
        ops,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="probe-deep-stateful",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4069"},
    )

    def _warm(batches):
        yield from batches

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_warm, "id long").count()

    paths: dict[str, tuple[str, str, str]] = {}
    rows: dict[str, dict] = {}
    for label, factor in (("10x", 10), ("100x", 100)):
        d = os.path.join(WORK, f"deepst_docs_{label}.parquet")
        e = os.path.join(WORK, f"deepst_embs_{label}.parquet")
        v = os.path.join(WORK, f"deepst_events_{label}.parquet")
        gen_documents(spark, BASE_DOCS * factor).write.mode("overwrite").parquet(d)
        gen_embeddings(spark, BASE_VECS * factor).write.mode("overwrite").parquet(e)
        gen_events(spark, BASE_EVENTS * factor, BASE_USERS * factor).write.mode(
            "overwrite"
        ).parquet(v)
        paths[label] = (d, e, v)
        rows[label] = {
            "docs": BASE_DOCS * factor,
            "vecs": BASE_VECS * factor,
            "events": BASE_EVENTS * factor,
            "users": BASE_USERS * factor,
        }

    report: dict = {"rows": rows, "ops": {}}
    for name in wanted:
        per_leg = {}
        for label in ("10x", "100x"):  # back-to-back: same host regime
            built = ops(spark, *paths[label])
            per_leg[label] = _measure(spark, built[name])
        a, b = per_leg["10x"], per_leg["100x"]
        report["ops"][name] = {
            **{f"{k}_{lbl}": leg[k] for lbl, leg in per_leg.items()
               for k in ("wall", "run_sec", "cpu_sec", "tasks",
                          "max_stage_input_mb", "max_stage_shuffle_write_mb", "gc_sec")},
            "decade2_cpu_ratio": round(b["cpu_sec"] / a["cpu_sec"], 2) if a["cpu_sec"] else None,
            "decade2_run_ratio": round(b["run_sec"] / a["run_sec"], 2) if a["run_sec"] else None,
            "input_ratio": round(b["max_stage_input_mb"] / a["max_stage_input_mb"], 1)
            if a["max_stage_input_mb"] else None,
            "shuffle_ratio": round(
                b["max_stage_shuffle_write_mb"] / a["max_stage_shuffle_write_mb"], 1
            ) if a["max_stage_shuffle_write_mb"] else None,
        }
        print(f"[deep] {name}: {report['ops'][name]}", file=sys.stderr, flush=True)

    print(json.dumps(report, indent=2))
    spark.stop()
    for label in ("10x", "100x"):
        for base in ("deepst_docs", "deepst_embs", "deepst_events"):
            shutil.rmtree(os.path.join(WORK, f"{base}_{label}.parquet"), ignore_errors=True)
    shutil.rmtree(os.path.join(WORK, "z01_zorder.parquet"), ignore_errors=True)


if __name__ == "__main__":
    main()

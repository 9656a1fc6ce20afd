#!/usr/bin/env python
"""Follow-up probes behind BASELINE.md "Relational second decade (r11)".

Three focused measurements that decomposed the headline probe's raw
work ratios (which looked super-linear at face value):

  cpu   — executorCpuTime vs executorRunTime for q05/q09 at both SFs:
          run-time includes mutual stall of concurrent tasks, so it
          overstates work when task counts differ across legs.
  scan  — pure scan+groupBy control on lineitem: cpu scales ~linearly
          (12.4x on 10x) while run grows 28x (34 concurrent tasks vs 5).
  smj   — q05 with broadcasts pinned OFF at both scales (static + AQE
          thresholds -1): the same-plan pair, whose cpu (13.8x) and
          shuffle bytes (10.2x) are the honest scaling signal; the
          default-config 46x bundles a legitimate plan transition.

Usage: python tools/probe_rel_followups.py [cpu|scan|smj|all]
Requires the sf1 replica (python tools/gen_sf_replica.py) on disk.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: N812

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.environ.get("SCORE_SPARK_SCALE_DIR", "/root/repo/.scale_fixtures"), "sf1"
)
LEGS = (("sf0.1", SF01), ("sf1", SF1))


def _session(extra=None):
    from score_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    conf = {"spark.ui.enabled": "true", "spark.ui.port": "4067"}
    conf.update(extra or {})
    spark = get_session(app_name="probe-rel-followup", master=f"local[{cpus}]",
                        extra_conf=conf)

    def _warm(batches):
        yield from batches

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_warm, "id long").count()
    return spark


def _rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=10) as r:
        return json.load(r)


def _stage_ids(spark):
    return {s["stageId"] for s in _rest(spark, "stages?status=complete")}


def _measure(spark, build, runs=3):
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
            "tasks": sum(s.get("numCompleteTasks", 0) for s in new),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in new) / 2**20, 1
            ),
        }
        if best is None or rec["wall"] < best["wall"]:
            best = rec
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    return best


def probe_cpu(out):
    from tools.scale_bench import relational_ops

    spark = _session()
    for label, d in LEGS:
        ops = relational_ops(spark, d)
        for q in ("q05", "q09"):
            out[f"cpu:{q}@{label}"] = _measure(spark, ops[q])
    spark.stop()


def probe_scan(out):
    spark = _session()
    for label, d in LEGS:
        out[f"scan:lineitem_agg@{label}"] = _measure(
            spark,
            lambda d=d: spark.read.parquet(f"{d}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg(F.sum("l_extendedprice").alias("s"), F.count(F.lit(1)).alias("n")),
        )
    spark.stop()


def probe_smj(out):
    from tools.scale_bench import relational_ops

    spark = _session({
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    })
    for label, d in LEGS:
        out[f"smj:q05@{label}"] = _measure(spark, relational_ops(spark, d)["q05"])
    spark.stop()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if not os.path.isdir(SF1):
        raise SystemExit(f"sf1 replica missing at {SF1}; run tools/gen_sf_replica.py first")
    out: dict = {}
    if which in ("cpu", "all"):
        probe_cpu(out)
    if which in ("scan", "all"):
        probe_scan(out)
    if which in ("smj", "all"):
        probe_smj(out)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

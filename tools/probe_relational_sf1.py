#!/usr/bin/env python
"""Relational second decade: sf0.1 -> sf1 (VERDICT r10 "Next round" #5).

DuckDB's TPC-H generator cannot install offline, so sf1 comes from
tools/gen_sf_replica.py (disjoint key-shifted 10x replication of the
driver's sf0.1 — preserves join fan-out and per-key density exactly; see
that module's docstring for what replication can and cannot exercise).
Measures the same four queries as SCALE.md's relational table
(q03/q05/q09/q28) with the same _run_op methodology (best-of-3, noop sink,
stage-set diff, executor-sec as the work metric), both legs back-to-back
in one fresh session.

Usage: python tools/probe_relational_sf1.py   # prints one JSON report
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_sf_replica import replicate
from tools.scale_bench import RELATIONAL_QUERIES, _run_op, relational_ops

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.environ.get("SCORE_SPARK_SCALE_DIR", "/root/repo/.scale_fixtures"), "sf1"
)


def main() -> None:
    from score_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="probe-rel-sf1",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4063"},
    )

    def _warm(batches):
        yield from batches

    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_warm, "id long").count()

    gen_report = replicate(spark, SF01, SF1, 10)

    report: dict = {"gen": gen_report, "legs": {}}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        results = {}
        for name, build in relational_ops(spark, sf_dir).items():
            results[name] = _run_op(spark, build)
        report["legs"][label] = results

    summary = {}
    for name in report["legs"]["sf0.1"]:
        a, b = report["legs"]["sf0.1"][name], report["legs"]["sf1"][name]
        summary[name] = {
            "wall_sf01": a["sec"], "wall_sf1": b["sec"],
            "wall_ratio": round(b["sec"] / a["sec"], 2) if a["sec"] else None,
            "executor_sf01": a["executor_sec"], "executor_sf1": b["executor_sec"],
            "work_ratio": round(b["executor_sec"] / a["executor_sec"], 2)
            if a["executor_sec"] else None,
            "max_stage_input_mb_sf1": b["max_stage_input_mb"],
            "max_stage_shuffle_write_mb_sf1": b["max_stage_shuffle_write_mb"],
        }
    report["summary"] = summary
    print(json.dumps(report, indent=2))
    spark.stop()
    if not os.environ.get("SCORE_SPARK_KEEP_SF1"):
        shutil.rmtree(SF1, ignore_errors=True)


if __name__ == "__main__":
    main()

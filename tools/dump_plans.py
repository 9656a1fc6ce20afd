"""Dump .explain("formatted") for every registered query to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [name ...]

Writes plans/<tag>/<query>_<suffix>.txt where suffix comes from
$PLAN_SUFFIX (default "before"). Construction-side Spark actions (xcheck
writes, counts) run as part of building the DataFrame — unavoidable for
those queries, but plan capture is untimed so it does not matter.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")

    from score_spark.queries import QUERIES
    from score_spark.session import get_session

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session(app_name="score-spark-plans", master=f"local[{cpus}]")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    todo = names or sorted(QUERIES)
    for name in todo:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # capture the failure instead of dying mid-list
            plan = f"PLAN CAPTURE FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()

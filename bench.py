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
    # JVM/codegen warmup outside the timed region
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    times: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
